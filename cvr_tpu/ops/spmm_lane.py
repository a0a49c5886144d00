"""Power-law SpMM with K in lanes: plane-order row gather + slice reduce.

The vmapped routed SpMM re-reads every index plane K times and pays the
kernel op floor per (element, k) — 10.8 useful GFLOPS at K=128 on
web-scale power-law matrices with the round-3 kernels (26 with the
round-2 ones; docs/DESIGN.md "SpMM round 3").  With a whole X ROW of K
values per gathered element, the 128-lane-window constraint that forces
SpMV through the compiled route does not bind; the binding constraint
becomes XLA's row-gather throughput (measured 110 GB/s, order-
independent), which puts this path at 15.3 useful GFLOPS at K=128 —
the best measured power-law SpMM — and caps any row-gather formulation
at ~36.  This module drops the route entirely:

  1. ``gx = take(X, cols_plane)`` — ONE XLA row gather straight into
     SELL plane order (the route's whole job for SpMV), fused with the
     value multiply;
  2. a Pallas slice-reduce with K in lanes: stream (row, 1024, K)
     blocks, accumulate rows, emit each slice's (1024, K) sum — plane
     rows are padded so every 8-slice output block starts on an 8-row
     group boundary (one static output block per grid step);
  3. y rows = take(y_sorted, first-segment position) + a scatter-add of
     split-row extra segments — XLA row gathers again.

Pack cost is the SELL pack plus a few vectorized passes (no Euler, no
route compile): the SpMM pipeline amortizes its conversion in a handful
of products.  Reference context: CVR has no SpMM at all; VHCC's 2D
blocking (vhcc_matrix.h:300-375) is the closest analogue, and
BASELINE.json config 4 sets the target.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cvr_tpu.formats.sell import SellMatrix
from cvr_tpu.ops.pallas_route import use_interpret

RB = 8  # plane rows per grid step
SB = 8  # slices per output block
KL = 128  # lane width: K is processed in chunks of 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass
class LanePlan:
    """Host-side lane-SpMM plan derived from a SellMatrix (C=1024)."""

    cols_l: np.ndarray  # (S_lane * 1024,) int32 plane columns, padded
    vals_l: np.ndarray  # (S_lane, 1024) f32 values, padded rows zero
    emit_l: np.ndarray  # (S_lane,) int32 block-local slice id or -1
    ob: np.ndarray  # (S_lane // RB,) int32 output block per row group
    first_pos: np.ndarray  # (nrows,) int64 into y_sorted flat (+sentinel)
    extra_pos: np.ndarray  # (n_extra,) int64 y_sorted flat positions
    extra_row: np.ndarray  # (n_extra,) int64 rows to add into
    shape: tuple
    nnz: int
    nslices: int  # effective (trailing empty slices dropped)
    convert_time: float = 0.0


def lane_plan(sm: SellMatrix) -> LanePlan:
    """Plan the lane SpMM from a SELL pack (cheap vectorized passes)."""
    import time

    t0 = time.perf_counter()
    if sm.C != 1024:
        raise ValueError("lane SpMM requires C == 1024")
    nrows, ncols = sm.shape
    offs = sm.slice_offsets.astype(np.int64)
    widths = np.diff(offs)
    nsl = int((widths > 0).sum())
    if (widths[nsl:] != 0).any():
        raise AssertionError("zero-width slices must be trailing")
    nsl = max(nsl, 1)
    # pad each 8-slice group's rows to an RB multiple so one grid step
    # never emits into two output blocks (shared group-pad definition:
    # formats/sell_routed.py group_padded_rmap)
    from cvr_tpu.formats.sell_routed import group_padded_rmap

    S = int(offs[nsl])
    ngrp = -(-nsl // SB)
    rmap, gstart, _, rows_gp, gshift = group_padded_rmap(
        offs, nsl, S, SB, RB, n_groups=ngrp
    )
    S_lane = int(rows_gp.sum())
    cols_l = np.zeros((S_lane, 1024), dtype=np.int32)
    vals_l = np.zeros((S_lane, 1024), dtype=np.float32)
    cols_l[rmap] = sm.cols_plane[:S]
    vals_l[rmap] = sm.vals_plane[:S].astype(np.float32)
    emit_l = np.full(S_lane, -1, dtype=np.int32)
    ends = offs[1:]
    sl = np.arange(nsl)
    nonempty = widths[:nsl] > 0
    emit_l[rmap[ends[:nsl][nonempty] - 1]] = (sl[nonempty] % SB).astype(
        np.int32
    )
    ob = (
        np.repeat(np.arange(ngrp), rows_gp // RB).astype(np.int32)
    )
    # y combine maps (slice-sorted flat position -> natural row)
    seg_row = sm.perm.astype(np.int64)
    seg_off = sm.seg_offset.astype(np.int64)
    is_first = (seg_off == 0) & (seg_row < nrows)
    first_pos = np.full(nrows, -1, dtype=np.int64)
    first_pos[seg_row[is_first]] = np.flatnonzero(is_first)
    if (first_pos < 0).any():
        raise AssertionError("row without a first segment")
    nsl8 = ngrp * SB
    # rows whose (empty) first segment sorted past the effective slices
    # read the appended zero row
    zero_slot = nsl8 * 1024
    first_pos = np.where(first_pos < nsl * 1024, first_pos, zero_slot)
    extra = (~is_first) & (seg_row < nrows)
    extra_pos = np.flatnonzero(extra).astype(np.int64)
    keep = extra_pos < nsl * 1024
    extra_row = seg_row[extra][keep]
    extra_pos = extra_pos[keep]
    return LanePlan(
        cols_l=cols_l.reshape(-1),
        vals_l=vals_l,
        emit_l=emit_l,
        ob=ob,
        first_pos=first_pos,
        extra_pos=extra_pos,
        extra_row=extra_row,
        shape=sm.shape,
        nnz=sm.nnz,
        nslices=nsl,
        convert_time=time.perf_counter() - t0,
    )


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["cols_l", "vals_l", "emit_l", "ob", "first_pos",
                 "extra_pos", "extra_row"],
    meta_fields=["shape", "nnz", "nslices", "S_lane"],
)
@dataclasses.dataclass(frozen=True)
class LaneDevice:
    cols_l: jax.Array
    vals_l: jax.Array
    emit_l: jax.Array
    ob: jax.Array
    first_pos: jax.Array
    extra_pos: jax.Array
    extra_row: jax.Array
    shape: tuple
    nnz: int
    nslices: int
    S_lane: int


def to_device_lane(lp: LanePlan, device=None) -> LaneDevice:
    put = functools.partial(jax.device_put, device=device)
    return LaneDevice(
        cols_l=put(lp.cols_l),
        vals_l=put(lp.vals_l),
        emit_l=put(lp.emit_l),
        ob=put(lp.ob),
        first_pos=put(lp.first_pos.astype(np.int32)),
        extra_pos=put(lp.extra_pos.astype(np.int32)),
        extra_row=put(lp.extra_row.astype(np.int32)),
        shape=lp.shape,
        nnz=lp.nnz,
        nslices=lp.nslices,
        S_lane=int(lp.vals_l.shape[0]),
    )


def _lane_reduce_kernel(emit_ref, ob_ref, gx_ref, v_ref, y_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for j in range(RB):
        acc_ref[...] = acc_ref[...] + (
            v_ref[j, :][:, None] * gx_ref[j]
        )
        e = emit_ref[i * RB + j]

        @pl.when(e >= 0)
        def _(j=j, e=e):
            for c in range(SB):
                @pl.when(e == c)
                def _(c=c):
                    y_ref[c] = acc_ref[...]
            acc_ref[...] = jnp.zeros_like(acc_ref)


@functools.lru_cache(maxsize=None)
def _lane_reduce_call(S_lane: int, nblocks: int, interpret: bool):
    grid = (S_lane // RB,)
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # emit_l, ob
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (RB, 1024, KL), lambda i, em, ob: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (RB, 1024), lambda i, em, ob: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (SB, 1024, KL), lambda i, em, ob: (ob[i], 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((1024, KL), jnp.float32)],
    )

    def fn(emit_l, ob, gx, vals):
        return pl.pallas_call(
            _lane_reduce_kernel,
            grid_spec=spec,
            out_shape=jax.ShapeDtypeStruct(
                (nblocks * SB, 1024, KL), jnp.float32
            ),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=28 * 1024 * 1024
            ),
        )(emit_l, ob, gx, vals)

    return jax.jit(fn)


def spmm_lane(sd: LaneDevice, X: jax.Array) -> jax.Array:
    """Y = A @ X for dense X [ncols, K], K processed in 128-lane chunks."""
    nrows, ncols = sd.shape
    K = X.shape[1]
    nblocks = -(-sd.nslices // SB)
    outs = []
    for k0 in range(0, K, KL):
        kw = min(KL, K - k0)
        Xc = X[:, k0 : k0 + kw].astype(jnp.float32)
        if kw < KL:
            Xc = jnp.pad(Xc, ((0, 0), (0, KL - kw)))
        gx = jnp.take(Xc, sd.cols_l, axis=0).reshape(
            sd.S_lane, 1024, KL
        )
        ys = _lane_reduce_call(sd.S_lane, nblocks, use_interpret())(
            sd.emit_l, sd.ob, gx, sd.vals_l
        )
        yflat = jnp.concatenate(
            [ys.reshape(-1, KL), jnp.zeros((1024, KL), jnp.float32)]
        )
        y = jnp.take(yflat, sd.first_pos, axis=0)
        if sd.extra_pos.shape[0]:
            y = y.at[sd.extra_row].add(
                jnp.take(yflat, sd.extra_pos, axis=0), mode="drop"
            )
        outs.append(y[:, :kw])
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


@functools.lru_cache(maxsize=None)
def _jitted_spmm_lane():
    return jax.jit(spmm_lane)


def spmm_lane_pack(csr, split_len: int | None = None) -> LanePlan:
    """CSR -> lane-SpMM plan (SELL pack + plan; no route compile)."""
    from cvr_tpu.formats.sell import sell_pack

    if split_len is None:
        mean_len = -(-max(csr.nnz, 1) // max(csr.shape[0], 1))
        split_len = max(1024, 16 * mean_len)
    sm = sell_pack(csr, C=1024, split_len=split_len)
    lp = lane_plan(sm)
    lp.convert_time += sm.convert_time
    return lp


def save_lane(lp: LanePlan, path) -> None:
    """Persist the lane plan (the SpMM analogue of save_routed — the
    pack is cheap but deployment reuse should not re-derive it)."""
    np.savez_compressed(
        path,
        lane_cols=lp.cols_l,
        lane_vals=lp.vals_l,
        lane_emit=lp.emit_l,
        lane_ob=lp.ob,
        lane_first=lp.first_pos,
        lane_extra_pos=lp.extra_pos,
        lane_extra_row=lp.extra_row,
        lane_meta=np.asarray(
            [lp.shape[0], lp.shape[1], lp.nnz, lp.nslices], dtype=np.int64
        ),
    )


def load_lane(path) -> LanePlan:
    z = np.load(path)
    m = z["lane_meta"]
    return LanePlan(
        cols_l=z["lane_cols"],
        vals_l=z["lane_vals"],
        emit_l=z["lane_emit"],
        ob=z["lane_ob"],
        first_pos=z["lane_first"],
        extra_pos=z["lane_extra_pos"],
        extra_row=z["lane_extra_row"],
        shape=(int(m[0]), int(m[1])),
        nnz=int(m[2]),
        nslices=int(m[3]),
    )
