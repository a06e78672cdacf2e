#!/usr/bin/env python
"""TPU primitive microbenchmarks for the round-2 kernel designs.

Run SOLO on the tunneled TPU (no other python processes — CLAUDE.md).
Each test is independent and wrapped in try/except so one Mosaic
lowering failure doesn't kill the rest.

Decides:
  * axis0  — does jnp.take_along_axis(X, idx, axis=0) (per-lane dynamic
             sublane gather) lower in Mosaic, and at what cost/element?
             Gate for the static-shuffle SpMV design.
  * mxu    — f32 / bf16 / int8 matmul rates at one-hot-bilinear shapes.
             Gate for the tile-bilinear SpMV + dense int8 TC designs.
  * grid   — Pallas grid step overhead (how small can chunks be).
  * dynds  — read-modify-write at a dynamic sublane offset into a VMEM
             out block that persists across grid steps.
  * sort   — lax.sort single-key vs key-value pair at push/SpMV sizes.
  * stream — streaming csum skeleton rate (orpull generalization).
  * scatter— XLA .at[].min cost at small-tier push sizes.

Timing protocol (CLAUDE.md): chain reps inside ONE jit via lax.scan /
grid size, fetch one scalar, diff two rep counts for marginal cost.
"""
from __future__ import annotations

import functools
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, flush=True)


def fetch(x):
    """Force a real D2H transfer of ONE scalar — on the axon relay,
    block_until_ready alone acks optimistically and timings lie
    (CLAUDE.md). Slice on-device first so only 4 bytes cross the tunnel."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jnp.ravel(leaf)[0])


def timed(fn, *args):
    """Compile, run once, then time 3 runs incl. the scalar fetch."""
    t0 = time.perf_counter()
    out = fetch(fn(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        out = fetch(fn(*args))
    return (time.perf_counter() - t0) / 3, compile_s, out


def marginal(fn, args1, args2, reps1, reps2):
    t1, c1, _ = timed(fn, *args1)
    t2, _, _ = timed(fn, *args2)
    return (t2 - t1) / (reps2 - reps1), c1


# ---------------------------------------------------------------- axis0
def test_axis0():
    R = 512

    def kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=0)

    def run(nchunks):
        x = jnp.arange(R * 128, dtype=jnp.float32).reshape(R, 128)
        idx = jnp.asarray(np.random.randint(0, R, (nchunks * R, 128)),
                          jnp.int32)
        out = pl.pallas_call(
            kernel,
            grid=(nchunks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec((R, 128), lambda c: (c, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, 128), lambda c: (c, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nchunks * R, 128), jnp.float32),
        )(x, idx)
        return out, idx, x

    f = jax.jit(lambda nc: run(nc)[0], static_argnums=0)
    out, idx, x = run(4)
    ref = np.take_along_axis(np.asarray(x), np.asarray(idx[:R]), axis=0)
    ok = np.array_equal(np.asarray(out[:R]), ref)
    per, comp = marginal(f, (16,), (128,), 16 * R * 128, 128 * R * 128)
    log(f"axis0: OK correct={ok} per-elem={per*1e9:.3f} ns "
        f"compile={comp:.1f}s")


# ------------------------------------------------- axis0 from big table
def test_axis0_big():
    """Gather along sublanes from a LARGER table than the query block:
    X (4096,128) resident, idx in [0,4096). This is the shape the shuffle
    network actually needs (source window larger than one output chunk)."""
    S, R = 4096, 512

    def kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(
            x_ref[:], idx_ref[:], axis=0)

    def run(nchunks):
        x = jnp.arange(S * 128, dtype=jnp.float32).reshape(S, 128)
        idx = jnp.asarray(np.random.randint(0, S, (nchunks * R, 128)),
                          jnp.int32)
        return pl.pallas_call(
            kernel,
            grid=(nchunks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec((R, 128), lambda c: (c, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, 128), lambda c: (c, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nchunks * R, 128), jnp.float32),
        )(x, idx), idx, x

    out, idx, x = run(4)
    ref = np.take_along_axis(
        np.asarray(x), np.asarray(idx[:R]) , axis=0)
    ok = np.array_equal(np.asarray(out[:R]), ref)
    f = jax.jit(lambda nc: run(nc)[0], static_argnums=0)
    per, comp = marginal(f, (16,), (128,), 16 * R * 128, 128 * R * 128)
    log(f"axis0_big(S=4096): OK correct={ok} per-elem={per*1e9:.3f} ns "
        f"compile={comp:.1f}s")


# ------------------------------------------------------------------ mxu
def test_mxu():
    for name, dt, acc in (("f32", jnp.float32, jnp.float32),
                          ("bf16", jnp.bfloat16, jnp.float32),
                          ("int8", jnp.int8, jnp.int32)):
        for (M, K, N) in ((512, 512, 128), (2048, 512, 128),
                          (128, 32768, 128)):
            try:
                a = jnp.ones((M, K), dt)
                b = jnp.ones((K, N), dt)

                @functools.partial(jax.jit, static_argnums=2)
                def f(a, b, reps):
                    def body(c, _):
                        # data-dependence on the carry defeats loop hoisting
                        # (×0 would be const-folded; use &1 / tiny epsilon)
                        if dt == jnp.int8:
                            a2 = a + (c[:1, :1] & 1).astype(dt)
                        else:
                            a2 = a + (c[:1, :1] * 1e-18).astype(dt)
                        c = jnp.dot(a2, b, preferred_element_type=acc)
                        return c, ()
                    c, _ = jax.lax.scan(body, jnp.zeros((M, N), acc),
                                        None, length=reps)
                    return c.reshape(-1)[0]

                per, comp = marginal(f, (a, b, 50), (a, b, 800), 50, 800)
                tf = M * K * N / per / 1e12
                log(f"mxu {name} ({M}x{K}x{N}): {per*1e6:.2f} us/mm "
                    f"= {tf:.1f} TMAC/s compile={comp:.1f}s")
            except Exception as e:
                log(f"mxu {name} ({M}x{K}x{N}): FAIL {type(e).__name__}: "
                    f"{str(e)[:200]}")


# ----------------------------------------------------------------- grid
def test_grid():
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    def run(nchunks):
        x = jnp.zeros((nchunks * 8, 128), jnp.float32)
        return pl.pallas_call(
            kernel, grid=(nchunks,),
            in_specs=[pl.BlockSpec((8, 128), lambda c: (c, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda c: (c, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nchunks * 8, 128), jnp.float32),
        )(x)

    f = jax.jit(run, static_argnums=0)
    per, comp = marginal(f, (256,), (4096,), 256, 4096)
    log(f"grid: {per*1e9:.0f} ns/step compile={comp:.1f}s")


# ---------------------------------------------------------------- dynds
def test_dynds():
    """Accumulate (32,128) blocks at prefetched dynamic sublane offsets
    into a single persistent out block."""
    OUT_R = 2048

    def kernel(off_ref, x_ref, o_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        off = off_ref[c]
        o_ref[pl.ds(off, 32), :] += x_ref[:]

    def run(nchunks):
        x = jnp.ones((nchunks * 32, 128), jnp.float32)
        off = jnp.asarray(
            np.random.randint(0, OUT_R // 32, nchunks) * 32, jnp.int32)
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(nchunks,),
            in_specs=[pl.BlockSpec((32, 128), lambda c, off: (c, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((OUT_R, 128), lambda c, off: (0, 0),
                                   memory_space=pltpu.VMEM))
        return pl.pallas_call(
            kernel, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((OUT_R, 128), jnp.float32),
        )(off, x), off

    out, off = run(64)
    ref = np.zeros((OUT_R, 128), np.float32)
    for o in np.asarray(off):
        ref[o:o + 32] += 1.0
    ok = np.array_equal(np.asarray(out), ref)
    f = jax.jit(lambda nc: run(nc)[0], static_argnums=0)
    per, comp = marginal(f, (256,), (2048,), 256, 2048)
    log(f"dynds: OK correct={ok} {per*1e9:.0f} ns/step compile={comp:.1f}s")


# ----------------------------------------------------------------- sort
def test_sort():
    m = 8 * 1024 * 1024
    k = jnp.asarray(np.random.randint(0, 1 << 18, m), jnp.int32)
    v = jnp.asarray(np.random.rand(m), jnp.float32)

    @functools.partial(jax.jit, static_argnums=1)
    def single(k, reps):
        def body(c, _):
            (s,) = jax.lax.sort((c ^ 21,), num_keys=1, is_stable=False)
            return s, ()
        s, _ = jax.lax.scan(body, k, None, length=reps)
        return s[0]

    @functools.partial(jax.jit, static_argnums=2)
    def pair(k, v, reps):
        def body(c, _):
            s, w = jax.lax.sort((c[0] ^ 21, c[1]), num_keys=1,
                                is_stable=False)
            return (s, w), ()
        (s, w), _ = jax.lax.scan(body, (k, v), None, length=reps)
        return s[0] + w[0].astype(jnp.int32)

    per, comp = marginal(single, (k, 2), (k, 6), 2, 6)
    log(f"sort single int32 8M: {per*1e3:.2f} ms compile={comp:.1f}s")
    per, comp = marginal(pair, (k, v, 2), (k, v, 6), 2, 6)
    log(f"sort pair (i32,f32) 8M: {per*1e3:.2f} ms compile={comp:.1f}s")


# --------------------------------------------------------------- stream
def test_stream():
    """Streaming chunk pipeline with SMEM carry: read (512,128) f32,
    multiply, running cumsum via in-chunk 2D prefix — the csum-SpMV
    skeleton minus the gather."""
    CH = 512

    def _cumsum_axis(x, axis):
        size = x.shape[axis]
        idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
        k = 1
        while k < size:
            shifted = pltpu.roll(x, shift=k, axis=axis)
            x = x + jnp.where(idx >= k, shifted, 0)
            k *= 2
        return x

    def kernel(a_ref, b_ref, o_ref, carry):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            carry[0] = 0.0

        p = a_ref[:] * b_ref[:]
        cl = _cumsum_axis(p, 1)
        rt = jnp.broadcast_to(cl[:, -1:], cl.shape)
        ro = _cumsum_axis(rt, 0) - rt
        o_ref[:] = cl + ro + carry[0]
        carry[0] = carry[0] + jnp.sum(p)

    def run(nchunks):
        a = jnp.ones((nchunks * CH, 128), jnp.float32)
        b = jnp.ones((nchunks * CH, 128), jnp.float32)
        return pl.pallas_call(
            kernel, grid=(nchunks,),
            in_specs=[pl.BlockSpec((CH, 128), lambda c: (c, 0),
                                   memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((CH, 128), lambda c: (c, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nchunks * CH, 128), jnp.float32),
            scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
        )(a, b)

    f = jax.jit(run, static_argnums=0)
    per, comp = marginal(f, (16,), (120,), 16 * CH * 128, 120 * CH * 128)
    log(f"stream csum: {per*1e12:.1f} ps/elem "
        f"({1/per/1e9:.2f} Gelem/s) compile={comp:.1f}s")


# -------------------------------------------------------------- scatter
def test_scatter():
    n = 262144
    for m in (65536, 1048576):
        tgt = jnp.asarray(np.random.randint(0, n, m), jnp.int32)
        val = jnp.asarray(np.random.rand(m), jnp.float32)

        @functools.partial(jax.jit, static_argnums=2)
        def f(tgt, val, reps):
            def body(c, _):
                y = jnp.full((n,), jnp.inf, jnp.float32)
                y = y.at[tgt].min(val + c[0], mode="drop")
                return y[:1], ()
            c, _ = jax.lax.scan(body, jnp.zeros((1,)), None, length=reps)
            return c[0]

        per, comp = marginal(f, (tgt, val, 4), (tgt, val, 16), 4, 16)
        log(f"scatter-min m={m}: {per*1e3:.3f} ms "
            f"({per/m*1e9:.2f} ns/elem) compile={comp:.1f}s")


TESTS = {
    "axis0": test_axis0,
    "axis0_big": test_axis0_big,
    "mxu": test_mxu,
    "grid": test_grid,
    "dynds": test_dynds,
    "sort": test_sort,
    "stream": test_stream,
    "scatter": test_scatter,
}


def main():
    names = sys.argv[1:] or list(TESTS)
    log(f"backend={jax.default_backend()} device={jax.devices()[0].device_kind}")
    for name in names:
        t0 = time.perf_counter()
        try:
            TESTS[name]()
        except Exception:
            log(f"{name}: EXCEPTION")
            traceback.print_exc()
        log(f"  [{name} total {time.perf_counter()-t0:.1f}s]")


if __name__ == "__main__":
    main()
