"""Profiling/tracing — the analogue of the reference's perf plumbing
(llama_perf_context, GGML_PERF, and nsys-style external tracing).

On TPU the profiler of record is xprof/TensorBoard via jax.profiler:
`trace(dir)` captures device timelines, HLO cost views, and memory
profiles for everything dispatched inside the context. Works on CPU too
(host tracing only). `annotate(name)` adds named regions that show up
on the trace timeline (jax.profiler.TraceAnnotation).

Usage:
    from sparkinfer_tpu.utils.profiling import trace, annotate
    with trace("/tmp/xprof"):
        with annotate("decode-step"):
            step(...)
    # tensorboard --logdir /tmp/xprof  (or xprof session)

CLI surfaces: `tools/bench_matrix.py --trace DIR` wraps the measured
section; `SPIF_TRACE_DIR` env does the same for any Engine run.
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace into log_dir (TensorBoard/xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region on the profiler timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def maybe_trace(log_dir: str | None = None):
    """trace() if a dir is given or SPIF_TRACE_DIR is set; no-op otherwise."""
    log_dir = log_dir or os.environ.get("SPIF_TRACE_DIR")
    if not log_dir:
        yield None
        return
    with trace(log_dir) as d:
        yield d


def device_memory_profile(path: str | None = None) -> bytes:
    """Snapshot the device memory profile (pprof format); optionally save."""
    import jax

    prof = jax.profiler.device_memory_profile()
    if path:
        with open(path, "wb") as f:
            f.write(prof)
    return prof
