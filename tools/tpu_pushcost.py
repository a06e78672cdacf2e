#!/usr/bin/env python
"""Where does a 1.1 ms push ITERATION go on the grid-512 BFS?

Components at the measured shapes (workspace 8192 edges, n=262144):
small kv sort, expand takes, full-n scatters, cummax, segmented compare.
Marginal protocol (CLAUDE.md): chain inside one jit, diff two rep counts.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

WS = 8_192           # edge workspace (cap/64 tier on the grid)
N = 262_144          # vertices

rng = np.random.default_rng(0)
k0 = jnp.asarray(rng.integers(0, N, WS, dtype=np.int32))
v0 = jnp.asarray(rng.standard_normal(WS).astype(np.float32))
big = jnp.asarray(rng.standard_normal(N).astype(np.float32))


def bench(name, fn, init, reps=(2, 22)):
    @functools.partial(jax.jit, static_argnums=(1,))
    def chain(x, r):
        def body(c, _):
            return fn(c), ()
        c, _ = jax.lax.scan(body, x, None, length=r)
        leaf = c[0] if isinstance(c, tuple) else c
        return jnp.ravel(leaf)[0]

    np.asarray(chain(init, reps[0]))
    np.asarray(chain(init, reps[1]))
    ts = []
    for r in (reps[0], reps[1], reps[0], reps[1]):
        t0 = time.perf_counter()
        np.asarray(chain(init, r))
        ts.append(time.perf_counter() - t0)
    per = ((ts[1] + ts[3]) - (ts[0] + ts[2])) / (2 * (reps[1] - reps[0]))
    print(f"{name:32s} {per * 1e3:8.3f} ms", flush=True)


# 8K kv sort (the _merge_reduce bill)
bench("sort 8K kv", lambda c: jax.lax.sort(
    ((c[0] + 1) & (N - 1), c[1]), num_keys=1, is_stable=False), (k0, v0))

# 8K single-key sort (dup_insensitive path)
bench("sort 8K 1key", lambda c: jax.lax.sort((c + 1) & (N - 1)), k0)

# 8K 2-key sort (min-monoid secondary-value path)
bench("sort 8K 2key", lambda c: jax.lax.sort(
    ((c[0] + 1) & (N - 1), c[1]), num_keys=2, is_stable=False), (k0, v0))

# full-n scatter of 8K values (the y/sind/sval builds: 3 per iteration)
bench("scatter 8K -> 262K", lambda c: (
    jnp.zeros((N,), jnp.int32).at[c & (N - 1)].max(c, mode="drop")[:WS] + c),
    k0)

# 8K cumsum + cummax (expand machinery)
bench("cumsum+cummax 8K", lambda c: jax.lax.cummax(jnp.cumsum(c) & 1023), k0)

# XLA gather 8K from 262K (postprocess / mask / degree fetches)
bench("gather 8K <- 262K", lambda c: (
    big[c & (N - 1)].astype(jnp.int32) + c), k0)

# full-n elementwise pass (frontier bookkeeping per iteration)
bench("elementwise 262K", lambda c: c * 1.0000001 + 1e-9, big)

# full-n reduce (loop condition / nnz)
bench("reduce 262K", lambda c: c + jnp.sum(c) * 1e-30, big)
