#!/usr/bin/env python
"""Cost of the _masked_count_chunk constituent ops at rmat18 chunk shapes
(12.3M-lane 2-key sort, cummax, monotone takes, scatter-max) — which one
eats the 478 ms/chunk the tc diag measured?

Marginal protocol: chain reps inside one jit with a data-dependent carry,
diff two rep counts (CLAUDE.md timing).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

N_SORT = 12_582_912      # b_pad (3.9M) + expand_cap (8.4M), rounded
N_EXP = 8_388_608        # expand_cap
N_ACAP = 240_640         # acap

rng = np.random.default_rng(0)
a0 = jnp.asarray(rng.integers(0, 1 << 18, N_SORT, dtype=np.int32))
b0 = jnp.asarray(rng.integers(0, 1 << 19, N_SORT, dtype=np.int32))
q0 = jnp.asarray(np.sort(rng.integers(0, N_ACAP, N_EXP, dtype=np.int32)))
t0_tab = jnp.asarray(np.sort(rng.integers(0, 1 << 30, N_ACAP,
                                          dtype=np.int32)))


def bench(name, fn, reps=(1, 5)):
    @functools.partial(jax.jit, static_argnums=(1,))
    def chain(x, r):
        def body(c, _):
            return fn(c), ()
        c, _ = jax.lax.scan(body, x, None, length=r)
        return jnp.ravel(c[0] if isinstance(c, tuple) else c)[0]

    x0 = fn(None)  # initial state builder
    np.asarray(chain(x0, reps[0]))
    np.asarray(chain(x0, reps[1]))
    ts = []
    for r in (reps[0], reps[1], reps[0], reps[1]):
        t0 = time.perf_counter()
        np.asarray(chain(x0, r))
        ts.append(time.perf_counter() - t0)
    per = ((ts[1] + ts[3]) - (ts[0] + ts[2])) / (2 * (reps[1] - reps[0]))
    print(f"{name:28s} {per * 1e3:8.2f} ms", flush=True)


def mk(fn_body, init):
    def fn(c):
        if c is None:
            return init
        return fn_body(c)
    return fn


# 2-key sort at chunk size
bench("sort 12.3M 2-key", mk(
    lambda c: jax.lax.sort((c[0], c[1]), num_keys=2, is_stable=False),
    (a0, b0)))

# 1-key sort with payload at chunk size
bench("sort 12.3M 1-key+payload", mk(
    lambda c: jax.lax.sort((c[0], c[1]), num_keys=1, is_stable=False),
    (a0, b0)))

# cummax at chunk size
bench("cummax 12.3M", mk(lambda c: jax.lax.cummax(c) - 1, a0))

# cummax at expansion size
bench("cummax 8.4M", mk(lambda c: jax.lax.cummax(c) - 1, a0[:N_EXP]))

# monotone take: 8.4M queries into 240K table (gather_dispatch route)
from graphblast_tpu.ops.gather_dispatch import take
bench("take 8.4M<-240K monotone", mk(
    lambda c: (take(t0_tab, jnp.clip(c, 0, N_ACAP - 1), sorted=True)
               & 0xFFFF) + q0 * 0 + c * 0 + jnp.clip(c, 0, N_ACAP - 1) * 0,
    q0))

# take into a 12.3M table at 12.3M sorted-ish queries (the carry gathers)
pos = jnp.arange(N_SORT, dtype=jnp.int32)
bench("take 12.3M<-12.3M monotone", mk(
    lambda c: take(a0, jnp.clip(c, 0, N_SORT - 1), sorted=True) + c * 0,
    pos))

# scatter-max acap -> 8.4M
sl = jnp.arange(N_ACAP, dtype=jnp.int32)
bench("scatter-max 240K->8.4M", mk(
    lambda c: jnp.zeros((N_EXP,), jnp.int32).at[
        jnp.clip(c[:N_ACAP], 0, N_EXP - 1)].max(sl, mode="drop") + c * 0,
    a0[:N_EXP]))
