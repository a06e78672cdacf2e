"""Fused struconly or-pull Pallas kernel: the BFS pull hot loop.

Computes, in ONE pass over the CSR column indices, the inclusive prefix sum
of "edge endpoint is in the frontier" bits:

    csum[e] = Σ_{e' ≤ e} bit(col_ind[e'])      bit(c) = (words[c>>5] >> (c&31)) & 1

from a 32x bit-packed frontier bitmap resident in VMEM. The per-row OR
reduction then needs only the boundary fetch csum[row_ptr-1] (ops/segops.py).

This is the TPU re-derivation of spmvDenseMaskedOrKernel (reference:
kernels/spmv.hpp:10-59): where the CUDA kernel walks one row per thread with
an early-exit break, this kernel streams the edge array at full VPU width,
resolves the frontier bit via an unrolled lane-gather sweep over the packed
bitmap (S = n/4096 sublane rows), and chains the prefix sum across the
sequential TPU grid through an SMEM carry — replacing what was previously
five separate HBM passes (word-index materialization, gather, bit test,
flags cast, XLA cumsum).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...types import round_up

LANE = 128
CHUNK_SUB = 512          # sublane rows of edges per grid step (64K edges)
MAX_UNROLL = 64          # unroll the bitmap sweep up to this many rows


def _cumsum_axis(x, axis):
    """Inclusive prefix sum via log-step shifted adds (Mosaic has no cumsum
    primitive — Hillis-Steele with pltpu.roll + iota masks)."""
    size = x.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    k = 1
    while k < size:
        shifted = pltpu.roll(x, shift=k, axis=axis)
        x = x + jnp.where(idx >= k, shifted, 0)
        k *= 2
    return x


def _kernel(S, words_ref, col_ref, out_ref, carry_ref):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        carry_ref[0] = 0

    col = col_ref[:]
    widx = jax.lax.shift_right_logical(col, 5)        # word index
    hi = jax.lax.shift_right_logical(widx, 7)         # bitmap sublane row
    lo = widx & 127                                   # bitmap lane

    def sweep(s, acc):
        row = words_ref[pl.ds(s, 1), :]
        cand = jnp.take_along_axis(jnp.broadcast_to(row, lo.shape), lo, axis=1)
        return jnp.where(hi == s, cand, acc)

    if S <= MAX_UNROLL:
        wg = jnp.zeros(col.shape, jnp.int32)
        for s in range(S):
            wg = sweep(s, wg)
    else:
        wg = jax.lax.fori_loop(0, S, sweep, jnp.zeros(col.shape, jnp.int32))

    bit = jax.lax.shift_right_logical(wg, col & 31) & 1

    # row-major 2D inclusive prefix sum: lanes, then sublane offsets
    cl = _cumsum_axis(bit, axis=1)
    row_tot = jnp.broadcast_to(cl[:, -1:], cl.shape)
    row_off = _cumsum_axis(row_tot, axis=0) - row_tot
    out = cl + row_off + carry_ref[0]
    out_ref[:] = out
    carry_ref[0] = carry_ref[0] + jnp.sum(bit)


@functools.partial(jax.jit, static_argnames=("interpret",))
def orpull_bit_csum(words: jnp.ndarray, col_ind: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """csum[e] = inclusive prefix count of frontier bits over col_ind.

    words: (n_words,) int32 packed frontier bitmap (bit c of the frontier at
    word c>>5, bit c&31). col_ind: (nnz_pad,) int32; any c >= n reads the
    guaranteed-zero pad word at index n_words (the bitmap is always padded
    by at least one zero word, even when n_words is a LANE multiple).
    """
    nw = words.shape[0]
    m = col_ind.shape[0]
    # nw + 1: keep one zero word beyond the bitmap so the pad sentinel (and
    # any clamped c >= n) never aliases a live frontier bit (ADVICE r1).
    S = round_up(nw + 1, LANE) // LANE
    w2d = jnp.pad(words, (0, S * LANE - nw)).reshape(S, LANE)

    chunk = CHUNK_SUB * LANE
    m_pad = round_up(max(m, 1), chunk)
    col_p = jnp.pad(col_ind, (0, m_pad - m),
                    constant_values=nw * 32).astype(jnp.int32)
    # clamp out-of-range columns onto the zero pad word
    col_p = jnp.minimum(col_p, nw * 32).reshape(-1, LANE)

    out = pl.pallas_call(
        functools.partial(_kernel, S),
        grid=(m_pad // chunk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_SUB, LANE), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CHUNK_SUB, LANE), lambda c: (c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad // LANE, LANE), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(w2d, col_p)
    return out.reshape(-1)[:m]


def orpull_available(n: int) -> bool:
    """Bitmap must fit VMEM comfortably: n/32 int32 words ≤ 4MB → n ≤ 32M."""
    return (n + 31) // 32 * 4 <= 4 * 1024 * 1024


def pack_bitmap(x_dense: jnp.ndarray) -> jnp.ndarray:
    """Pack (x != 0) into int32 words (little-endian bit order)."""
    n = x_dense.shape[0]
    n32 = round_up(max(n, 1), 32)
    bits = jnp.pad((x_dense != 0).astype(jnp.int32), (0, n32 - n))
    pow2 = (1 << jnp.arange(32, dtype=jnp.int32))
    return jnp.sum(bits.reshape(-1, 32) * pow2, axis=1).astype(jnp.int32)
