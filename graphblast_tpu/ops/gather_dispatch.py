"""Backend-aware gather dispatch.

On TPU, XLA lowers big 1D gathers to ~7.5ns/element scalar loops; the Pallas
lane-gather kernel (ops/pallas/gather.py) is 2× faster on random indices and
up to 15× on locally-sorted indices (per-chunk range pruning). On CPU (tests)
and for tables beyond the VMEM budget we fall back to native XLA gather.

Set GRB_TPU_PALLAS=0 to force the XLA path (debugging / regression triage).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_FORCE_OFF = os.environ.get("GRB_TPU_PALLAS", "1") in ("0", "false")


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


_USE_PALLAS = None


def use_pallas() -> bool:
    global _USE_PALLAS
    if _USE_PALLAS is None:
        _USE_PALLAS = (not _FORCE_OFF) and _on_tpu()
    return _USE_PALLAS


def take(x: jnp.ndarray, idx: jnp.ndarray, sorted: bool = False) -> jnp.ndarray:
    """y[i] = x[idx[i]] — Pallas lane-gather on TPU when it wins.

    Cost model (measured, TPU v5 lite; S = table rows = n/128, m = queries):
      * XLA gather: ~7.5 ns/query, independent of table size.
      * Pallas, unsorted idx: every 32K-query chunk sweeps ~S table rows
        (~0.1 µs/row) → ~S·m/32768 rows total. Wins when S is small
        (bitmap/frontier tables), loses for big tables.
      * Pallas, sorted/clustered idx: per-chunk [min,max] pruning makes the
        total sweep ≈ S rows once → ~0.1 µs · S. Wins when m ≫ S.
    Callers that know their indices are monotone (CSR boundary fetches,
    compacted frontier ids, cumsum'd offsets) pass sorted=True."""
    if use_pallas() and x.ndim == 1 and idx.ndim == 1:
        from .pallas.gather import gather_1d, gather_1d_small, gather_available

        m = int(idx.shape[0])
        S = (int(x.shape[0]) + 127) // 128
        if m >= 8192 and x.dtype in (jnp.float32, jnp.int32):
            if S <= 128:
                # tiny table: full sweep beats both XLA and the pruning
                # variant's hi/lo + min/max preprocessing
                return gather_1d_small(x, idx.astype(jnp.int32))
            profitable = (m >= 16 * S) if sorted else (S <= 2048)
            if gather_available(int(x.shape[0])) and profitable:
                return gather_1d(x, idx.astype(jnp.int32))
    return x[idx]
