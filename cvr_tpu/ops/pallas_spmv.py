"""Pallas SpMV on raw SELL planes — superseded by the routed pipeline.

The direct in-kernel gather this module was reserved for is not viable on
a v5e: the VPU gathers at vector rate only within 128/1024-element windows
(experiments/probe_gather.py), so a kernel reading ``x[cols_plane]``
directly would run at scalar rate exactly like the XLA path.  The real
Pallas implementation is the routed-gather pipeline:

  * cvr_tpu/ops/route.py        — compile-time Clos routing of the gather
  * cvr_tpu/ops/pallas_route.py — the kernel suite
  * cvr_tpu/ops/spmv_routed.py  — the SpMV/SpMM ops
  * cvr_tpu/formats/sell_routed.py — the SELL-R pack

``spmv(..., impl="pallas")`` is kept for API compatibility and routes
SellRouted inputs to the routed op; for plain SellMatrix inputs it raises
with this pointer.
"""

from __future__ import annotations

import jax


def is_supported(sd, x) -> bool:
    return False


def sell_spmv_pallas(sd, x: jax.Array) -> jax.Array:
    raise NotImplementedError(
        "direct Pallas SpMV on raw SELL planes is not viable on TPU "
        "(scalar-rate gather); pack with sell_pack_routed and use the "
        "routed pipeline (cvr_tpu.ops.spmv_routed)"
    )
