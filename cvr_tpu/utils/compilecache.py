"""Persistent XLA compilation cache (opt-in helper).

The multi-pass Pallas pipelines cost ~20-30 s each to compile on the
single-core host; caching compiled executables across processes cuts
full-suite and repeat-bench wall clock several-fold.  Call enable()
AFTER importing jax and before the first jit execution.  Off by default
for library users (global config mutation is the caller's choice);
tests/conftest.py and bench.py opt in.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "../../.jax_cache")


def enable(cache_dir: str | None = None) -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.abspath(cache_dir or DEFAULT_DIR),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
