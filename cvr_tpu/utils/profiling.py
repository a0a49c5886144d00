"""Profiling / tracing support.

The reference's profiling layer is external VTune runs with cache-counter
greps (run_locality.sh:39-66).  The TPU-native equivalent is the XLA
profiler: ``trace()`` captures a device trace viewable in TensorBoard /
Perfetto, and ``annotate()`` scopes named regions so converter phases and
kernel launches are attributable in the timeline.
"""

from __future__ import annotations

import contextlib
import os
from pathlib import Path

import jax

DEFAULT_TRACE_DIR = os.environ.get("CVR_TPU_TRACE_DIR", "/tmp/cvr_tpu_traces")


@contextlib.contextmanager
def trace(name: str = "trace", trace_dir: str | None = None):
    """Capture a jax.profiler device trace around the enclosed block.

    Usage:
        with trace("spmv_web_google"):
            run_spmv_benchmark(...)
    View with: tensorboard --logdir <trace_dir>  (or open in Perfetto).
    """
    out = Path(trace_dir or DEFAULT_TRACE_DIR) / name
    out.mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(out))
    try:
        yield str(out)
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope that shows up in profiler timelines (host + device)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def server(port: int = 9999):
    """Run the on-demand profiling server (jax.profiler.start_server)."""
    srv = jax.profiler.start_server(port)
    try:
        yield srv
    finally:
        srv.stop()
