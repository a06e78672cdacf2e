"""Tracing / profiling hooks.

Parity with the reference's timing subsystem (SURVEY.md §5): GpuTimer
(backend/cuda/util.hpp:92-120) → `TightTimer` in algorithms/common.py;
cudaProfilerStart/Stop hooks (example/gbfs.cu:98,106, commented out there) →
`trace()` below, which captures a jax.profiler trace viewable in
TensorBoard / Perfetto. CLI drivers expose it via --profile <dir>.
"""
from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Capture a device trace around the body when log_dir is set.

    Usage:
        with trace("/tmp/jax-trace"):
            run_benchmark()
    View with: tensorboard --logdir /tmp/jax-trace (or upload the .pb to
    ui.perfetto.dev).
    """
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir, create_perfetto_trace=True):
        yield


def annotate(name: str):
    """Named sub-span inside a trace (maps to TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
