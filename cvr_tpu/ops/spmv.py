"""SpMV / SpMM on the SELL-pack format — XLA-native path and dispatcher.

The XLA path expresses the whole SpMV as three fusable dense ops over the
slot-major planes:

    contrib   = vals_plane * x[cols_plane]          # gather + FMA   [S, C]
    y_sorted  = segment_sum(contrib, slot_slice)    # per-slice sum  [n, C]
    y         = y_sorted.ravel()[row_rank]          # un-permute     [nrows]

Because rows were length-sorted at pack time, every lane of a slice carries
near-identical work — the load-balance property CVR achieves with its
record/steal machinery (ref: spmv.cpp:808-1000) is already in the data
layout, so no scalar drains, atomics (ref: spmv.cpp:1280-1282) or
calibrator passes (csr5_spmv_avx512.h:291-308) exist at compute time.

``spmv``/``spmm`` dispatchers pick the best available implementation.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from cvr_tpu.formats.csr import CSRMatrix
from cvr_tpu.formats.sell import SellMatrix


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "vals_plane",
        "cols_plane",
        "slot_slice",
        "slice_offsets",
        "perm",
        "row_rank",
        "lane_lengths",
    ],
    meta_fields=["has_splits"],
)
@dataclasses.dataclass(frozen=True)
class SellDevice:
    """Device-resident SELL-pack planes (a pytree of jax.Arrays).

    ``has_splits`` is static metadata: when True, long rows were segmented
    at pack time and the result combine is a scatter-add over ``perm``;
    when False it is a pure gather through ``row_rank``.
    """

    vals_plane: jax.Array  # [S, C]
    cols_plane: jax.Array  # [S, C] int32
    slot_slice: jax.Array  # [S] int32
    slice_offsets: jax.Array  # [nslices + 1] int32
    perm: jax.Array  # [nslices * C] int32 (segment -> row)
    row_rank: jax.Array  # [nrows] int32
    lane_lengths: jax.Array  # [nslices * C] int32
    has_splits: bool

    @property
    def nslices(self) -> int:
        return self.slice_offsets.shape[0] - 1

    @property
    def C(self) -> int:
        return self.vals_plane.shape[1]

    @property
    def nrows(self) -> int:
        return self.row_rank.shape[0]


def to_device(sm: SellMatrix, device=None) -> SellDevice:
    put = functools.partial(jax.device_put, device=device)
    return SellDevice(
        vals_plane=put(sm.vals_plane),
        cols_plane=put(sm.cols_plane),
        slot_slice=put(sm.slot_slice),
        slice_offsets=put(sm.slice_offsets),
        perm=put(sm.perm),
        row_rank=put(sm.row_rank),
        lane_lengths=put(sm.lane_lengths),
        has_splits=sm.n_splits > 0,
    )


def _combine(sd: SellDevice, y_sorted_flat: jax.Array) -> jax.Array:
    """Per-segment partials -> y, matching the pack-time layout.

    No splits: pure gather through row_rank.  With splits: scatter-add the
    partials of each row's segments (the AOT analogue of CVR's omp-atomic
    tail flush, spmv.cpp:1631-1651).  Padding positions carry partial 0 and
    are routed to a sentinel row that is sliced off.
    """
    if not sd.has_splits:
        return jnp.take(y_sorted_flat, sd.row_rank, axis=0)
    nrows = sd.nrows
    zeros = jnp.zeros((nrows + 1,) + y_sorted_flat.shape[1:], y_sorted_flat.dtype)
    return zeros.at[sd.perm].add(y_sorted_flat)[:nrows]


def sell_spmv_xla(sd: SellDevice, x: jax.Array) -> jax.Array:
    """y = A @ x on the SELL-pack planes, pure XLA."""
    contrib = sd.vals_plane * jnp.take(x, sd.cols_plane, axis=0)
    y_sorted = jax.ops.segment_sum(
        contrib,
        sd.slot_slice,
        num_segments=sd.nslices,
        indices_are_sorted=True,
    )
    return _combine(sd, y_sorted.reshape(-1))


def sell_spmm_xla(sd: SellDevice, X: jax.Array) -> jax.Array:
    """Y = A @ X for a dense block of K right-hand sides (X: [ncols, K]).

    Multi-RHS SpMV is the configuration that engages the MXU (BASELINE.json
    config #4): the gathered X rows form dense (C, K) tiles and the
    weighted reduction over slots is a batched rank-1 accumulation XLA can
    map onto the matrix unit.
    """
    gathered = jnp.take(X, sd.cols_plane, axis=0)  # [S, C, K]
    contrib = sd.vals_plane[..., None] * gathered
    y_sorted = jax.ops.segment_sum(
        contrib,
        sd.slot_slice,
        num_segments=sd.nslices,
        indices_are_sorted=True,
    )  # [nslices, C, K]
    flat = y_sorted.reshape(-1, X.shape[1])
    return _combine(sd, flat)


# ---------------------------------------------------------------------------
# High-level dispatchers
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _jitted_sell_spmv():
    return jax.jit(sell_spmv_xla)


@functools.lru_cache(maxsize=None)
def _jitted_sell_spmm():
    return jax.jit(sell_spmm_xla)


def spmv(A, x, impl: str = "auto"):
    """y = A @ x.  A may be a SellRouted / SellMatrix / SellDevice /
    CSRMatrix.

    impl: "auto" | "xla".  The routed path (Pallas kernels + compiled
    gather route, cvr_tpu.ops.spmv_routed) is used automatically for
    SellRouted inputs; the fused window kernel for SellWindow.
    """
    from cvr_tpu.formats.dia import DiaMatrix
    from cvr_tpu.formats.sell_routed import SellRouted
    from cvr_tpu.formats.sell_window import SellWindow
    from cvr_tpu.ops.spmv_dia import (
        DiaDevice,
        _jitted_spmv_dia,
        to_device_dia,
    )
    from cvr_tpu.ops.spmv_routed import (
        SellRoutedDevice,
        _jitted_spmv_routed,
        to_device_routed,
    )
    from cvr_tpu.ops.spmv_window import (
        SellWindowDevice,
        _jitted_spmv_window,
        to_device_window,
    )

    from cvr_tpu.formats.bell import BellMatrix
    from cvr_tpu.ops.spmv_bell import (
        BellDevice,
        _jitted_spmv_bell,
        to_device_bell,
    )

    if isinstance(A, BellMatrix):
        A = to_device_bell(A)
    if isinstance(A, BellDevice):
        return _jitted_spmv_bell()(A, jnp.asarray(x))
    if isinstance(A, DiaMatrix):
        A = to_device_dia(A)
    if isinstance(A, DiaDevice):
        return _jitted_spmv_dia()(A, jnp.asarray(x))
    if isinstance(A, SellRouted):
        A = to_device_routed(A)
    if isinstance(A, SellWindow):
        A = to_device_window(A)
    if isinstance(A, SellRoutedDevice):
        return _jitted_spmv_routed()(A, jnp.asarray(x))
    if isinstance(A, SellWindowDevice):
        return _jitted_spmv_window()(A, jnp.asarray(x))
    if isinstance(A, SellMatrix):
        A = to_device(A)
    x = jnp.asarray(x)
    if isinstance(A, SellDevice):
        return _jitted_sell_spmv()(A, x)
    if isinstance(A, CSRMatrix):
        from cvr_tpu.ops.spmv_ref import spmv_csr_jnp

        return spmv_csr_jnp(
            jnp.asarray(A.rowptr),
            jnp.asarray(A.cols),
            jnp.asarray(A.vals),
            x,
            A.shape[0],
        )
    raise TypeError(f"unsupported matrix type {type(A)}")


def spmm(A, X, impl: str = "auto"):
    """Y = A @ X for dense X [ncols, K].

    BsrMatrix/BsrDevice inputs run the dense-brick MXU path
    (cvr_tpu/ops/spmm_bsr.py) — the fastest SpMM by an order of
    magnitude on locality-structured matrices; pack with
    ``cvr_tpu.bsr_pack``.  SellRouted inputs use K vmapped routed
    pipelines (any structure; also the safe path for web-scale
    matrices: the XLA segment-sum SpMM can crash the TPU worker there).
    For power-law matrices at K >= 96, pack with ``spmm_lane_pack``
    instead — the lane path (plane-order row gather, no route) measures
    15.3 vs 10.8 useful GFLOPS on web-Google-like at K=128; below K~96
    its KL=128 lane padding dominates and the vmapped path stands
    (docs/DESIGN.md "SpMM round 3").  Hub-concentrated matrices
    (fsm-class: mean column-window fan-in C <~ 8) should pack with
    ``cvr_tpu.ops.spmm_pmm.pmm_plan`` — the exact MXU perm-matmul path
    measures 70.6 useful GFLOPS at K=32 on fsm-like vs 11 vmapped; the
    ``pmm_projected_ms`` gate (and CLI auto) dispatches it only where
    the measured fan-in model says it wins (docs/DESIGN.md round 5).
    """
    from cvr_tpu.formats.bsr import BsrMatrix
    from cvr_tpu.formats.dia import DiaMatrix
    from cvr_tpu.formats.sell_routed import SellRouted
    from cvr_tpu.formats.sell_window import SellWindow
    from cvr_tpu.ops.spmm_lane import (
        LaneDevice,
        LanePlan,
        _jitted_spmm_lane,
        to_device_lane,
    )
    from cvr_tpu.ops.spmv_dia import (
        DiaDevice,
        _jitted_spmm_dia,
        to_device_dia,
    )
    from cvr_tpu.ops.spmm_bsr import (
        BsrDevice,
        _jitted_spmm_bsr,
        to_device_bsr,
    )

    from cvr_tpu.ops.spmm_pmm import (
        PmmDevice,
        PmmPlan,
        _jitted_spmm_pmm,
        to_device_pmm,
    )

    if isinstance(A, PmmPlan):
        A = to_device_pmm(A)
    if isinstance(A, PmmDevice):
        return _jitted_spmm_pmm()(A, jnp.asarray(X))
    if isinstance(A, LanePlan):
        A = to_device_lane(A)
    if isinstance(A, LaneDevice):
        return _jitted_spmm_lane()(A, jnp.asarray(X))
    from cvr_tpu.ops.spmv_routed import (
        SellRoutedDevice,
        _jitted_spmm_routed,
        to_device_routed,
    )
    from cvr_tpu.ops.spmv_window import (
        SellWindowDevice,
        _jitted_spmm_window,
        to_device_window,
    )

    from cvr_tpu.formats.bell import BellMatrix
    from cvr_tpu.ops.spmv_bell import (
        BellDevice,
        _jitted_spmm_bell,
        to_device_bell,
    )

    if isinstance(A, BellMatrix):
        A = to_device_bell(A)
    if isinstance(A, BellDevice):
        return _jitted_spmm_bell()(A, jnp.asarray(X))
    if isinstance(A, BsrMatrix):
        A = to_device_bsr(A)
    if isinstance(A, BsrDevice):
        if impl == "bsr-xla":
            return _jitted_spmm_bsr()(A, jnp.asarray(X))
        from cvr_tpu.ops.pallas_bsr import _jitted_bsr_spmm_pallas

        return _jitted_bsr_spmm_pallas()(A, jnp.asarray(X))
    if isinstance(A, DiaMatrix):
        A = to_device_dia(A)
    if isinstance(A, DiaDevice):
        return _jitted_spmm_dia()(A, jnp.asarray(X))
    if isinstance(A, SellRouted):
        A = to_device_routed(A)
    if isinstance(A, SellWindow):
        A = to_device_window(A)
    if isinstance(A, SellRoutedDevice):
        return _jitted_spmm_routed()(A, jnp.asarray(X))
    if isinstance(A, SellWindowDevice):
        return _jitted_spmm_window()(A, jnp.asarray(X))
    if isinstance(A, SellMatrix):
        A = to_device(A)
    X = jnp.asarray(X)
    if isinstance(A, SellDevice):
        return _jitted_sell_spmm()(A, X)
    if isinstance(A, CSRMatrix):
        from cvr_tpu.ops.spmv_ref import spmv_csr_jnp

        f = jax.vmap(
            lambda col: spmv_csr_jnp(
                jnp.asarray(A.rowptr),
                jnp.asarray(A.cols),
                jnp.asarray(A.vals),
                col,
                A.shape[0],
            ),
            in_axes=1,
            out_axes=1,
        )
        return f(X)
    raise TypeError(f"unsupported matrix type {type(A)}")
