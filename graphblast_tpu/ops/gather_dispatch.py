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


def take(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """y[i] = x[idx[i]] — Pallas kernel on TPU when the table fits VMEM."""
    if use_pallas() and x.ndim == 1 and idx.ndim == 1:
        from .pallas.gather import gather_1d, gather_available

        if gather_available(int(x.shape[0])) and x.dtype in (
                jnp.float32, jnp.int32) and int(idx.shape[0]) >= 8192:
            return gather_1d(x, idx.astype(jnp.int32))
    return x[idx]
