"""Distributed lane SpMM: row-sharded lane plans, X all-gathered.

The power-law SpMM path (cvr_tpu/ops/spmm_lane.py: one row gather of X
into SELL plane order + a K-in-lanes slice reduce) scales out by row
sharding: each shard plans its local rows against GLOBAL columns, the
dense X is all-gathered over the mesh axis (the SpMM analogue of the
SpMV x gather; X rides ICI once per product), and every per-shard plan
is padded to one uniform geometry so shard_map compiles a single
program.  Reference context: one kernel binary per OpenMP shard
(spmv.cpp:1034-1041); BASELINE.json config 4 is the SpMM mandate.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from cvr_tpu.formats.csr import CSRMatrix
from cvr_tpu.ops.spmm_lane import (
    RB,
    SB,
    LaneDevice,
    lane_plan,
    spmm_lane,
)
from cvr_tpu.formats.sell import sell_pack
from cvr_tpu.parallel.dist import AXIS, make_mesh  # noqa: F401
from cvr_tpu.parallel.partition import (
    partition_balance,
    partition_rows_by_nnz,
)


@dataclass
class DistLaneMatrix:
    planes: dict  # name -> [D, ...] arrays
    meta: dict
    bounds: np.ndarray
    unpad_index: jax.Array
    shape: tuple[int, int]
    nnz: int
    mesh: Mesh
    rows_max: int
    balance: dict | None = None

    @property
    def n_shards(self) -> int:
        return int(self.bounds.shape[0] - 1)


def dist_lane_pack(
    csr: CSRMatrix, mesh: Mesh, split_len: int | None = None
) -> DistLaneMatrix:
    D = mesh.devices.size
    nrows, ncols = csr.shape
    bounds = partition_rows_by_nnz(csr.rowptr, D)
    if split_len is None:
        mean_len = -(-max(csr.nnz, 1) // max(nrows, 1))
        split_len = max(1024, 16 * mean_len)
    rows_max = max(int(b) for b in (bounds[1:] - bounds[:-1]))

    lps = []
    for i in range(D):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        lc = CSRMatrix(
            rowptr=csr.rowptr[lo : hi + 1] - csr.rowptr[lo],
            cols=csr.cols[csr.rowptr[lo] : csr.rowptr[hi]],
            vals=csr.vals[csr.rowptr[lo] : csr.rowptr[hi]],
            shape=(hi - lo, ncols),
        )
        lps.append(lane_plan(sell_pack(lc, C=1024, split_len=split_len)))

    # ---- one geometry: pad every plan to the max extents
    S_u = max(lp.vals_l.shape[0] for lp in lps)
    nbl_u = max(-(-lp.nslices // SB) for lp in lps)
    nsl_u = nbl_u * SB
    nex_u = max(lp.extra_pos.shape[0] for lp in lps)
    zero_slot = nsl_u * 1024  # uniform appended zero row

    def padded(lp):
        S = lp.vals_l.shape[0]
        cols = np.concatenate(
            [lp.cols_l, np.zeros((S_u - S) * 1024, np.int32)]
        )
        vals = np.concatenate(
            [lp.vals_l, np.zeros((S_u - S, 1024), np.float32)]
        )
        emit = np.concatenate(
            [lp.emit_l, np.full(S_u - S, -1, np.int32)]
        )
        # padding row groups write nothing; point them at the last block
        ob = np.concatenate(
            [lp.ob, np.full((S_u - S) // RB, nbl_u - 1, np.int32)]
        )
        first = np.where(
            lp.first_pos >= lp.nslices * 1024, zero_slot, lp.first_pos
        )
        first = np.concatenate(
            [first, np.full(rows_max - first.size, zero_slot, np.int64)]
        )
        ex_p = np.concatenate(
            [
                lp.extra_pos,
                np.full(nex_u - lp.extra_pos.size, zero_slot, np.int64),
            ]
        )
        ex_r = np.concatenate(
            [
                lp.extra_row,
                np.full(nex_u - lp.extra_row.size, rows_max, np.int64),
            ]
        )  # OOB row -> dropped by mode="drop"
        return cols, vals, emit, ob, first, ex_p, ex_r

    packed = [padded(lp) for lp in lps]
    planes_np = {
        "cols_l": np.stack([p[0] for p in packed]),
        "vals_l": np.stack([p[1] for p in packed]),
        "emit_l": np.stack([p[2] for p in packed]),
        "ob": np.stack([p[3] for p in packed]),
        "first_pos": np.stack([p[4].astype(np.int32) for p in packed]),
        "extra_pos": np.stack([p[5].astype(np.int32) for p in packed]),
        "extra_row": np.stack([p[6].astype(np.int32) for p in packed]),
    }
    sharding = NamedSharding(mesh, P(AXIS))
    planes = {k: jax.device_put(v, sharding) for k, v in planes_np.items()}

    row_ids = np.arange(nrows, dtype=np.int64)
    shard_of_row = (
        np.searchsorted(bounds, row_ids, side="right").astype(np.int64) - 1
    )
    unpad = (
        shard_of_row * rows_max + (row_ids - bounds[shard_of_row])
    ).astype(np.int32)
    return DistLaneMatrix(
        planes=planes,
        meta={"S_lane": S_u, "nslices": nsl_u},
        bounds=bounds,
        unpad_index=jax.device_put(unpad, NamedSharding(mesh, P(None))),
        shape=csr.shape,
        nnz=csr.nnz,
        mesh=mesh,
        rows_max=rows_max,
        balance=partition_balance(csr.rowptr, bounds),
    )


def dist_spmm_lane(
    dm: DistLaneMatrix, X: jax.Array, x_sharded: bool = False
) -> jax.Array:
    """Y = A @ X across the mesh, X [ncols, K] (optionally row-sharded)."""
    nrows, ncols = dm.shape
    D = dm.n_shards
    m = dm.meta
    if x_sharded:
        nc_pad = -(-ncols // D) * D
        if X.shape[0] != nc_pad:
            X = jnp.pad(X, ((0, nc_pad - X.shape[0]), (0, 0)))
    x_spec = P(AXIS) if x_sharded else P(None)

    def fn(pl, Xs):
        X_full = (
            jax.lax.all_gather(Xs, AXIS, tiled=True)[:ncols]
            if x_sharded
            else Xs
        )
        sd = LaneDevice(
            cols_l=pl["cols_l"][0],
            vals_l=pl["vals_l"][0],
            emit_l=pl["emit_l"][0],
            ob=pl["ob"][0],
            first_pos=pl["first_pos"][0],
            extra_pos=pl["extra_pos"][0],
            extra_row=pl["extra_row"][0],
            shape=(dm.rows_max, ncols),
            nnz=dm.nnz,
            nslices=m["nslices"],
            S_lane=m["S_lane"],
        )
        return spmm_lane(sd, X_full)[None]

    mapped = shard_map(
        fn,
        mesh=dm.mesh,
        in_specs=({k: P(AXIS) for k in dm.planes}, x_spec),
        out_specs=P(AXIS),
        check_vma=False,
    )
    Y_stacked = mapped(dm.planes, X)  # [D, rows_max, K]
    return jnp.take(
        Y_stacked.reshape(-1, Y_stacked.shape[-1]), dm.unpad_index, axis=0
    )


def dist_spmm_lane_jit(dm: DistLaneMatrix, x_sharded: bool = False):
    return jax.jit(
        functools.partial(dist_spmm_lane, dm, x_sharded=x_sharded)
    )
