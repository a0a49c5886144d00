"""Pallas TPU kernels for SELL-pack SpMV.

Filled in incrementally; ``is_supported`` gates dispatch from
cvr_tpu.ops.spmv so the XLA path is always a safe fallback.
"""

from __future__ import annotations

import jax


def is_supported(sd, x) -> bool:
    return False


def sell_spmv_pallas(sd, x: jax.Array) -> jax.Array:
    raise NotImplementedError("pallas SpMV kernel not built yet")
