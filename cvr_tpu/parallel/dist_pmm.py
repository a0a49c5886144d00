"""Distributed PMM SpMM: row-sharded perm-matmul plans, X all-gathered.

The PMM path (cvr_tpu/ops/spmm_pmm.py: MXU one-hot window gathers for
hub-concentrated matrices at small K) scales out exactly like the lane
path (cvr_tpu/parallel/dist_lane.py): rows are nnz-balance-partitioned,
each shard plans its LOCAL rows against GLOBAL columns, X is replicated
or all-gathered over the mesh axis, and every shard's pair/chunk
streams are padded to ONE uniform geometry so shard_map compiles a
single program.  Because a shard's segment spans (rt0, span) differ,
the per-segment overlap-add runs on traced scalars (dynamic slices)
instead of the single-chip path's static slices; padding segments carry
span 0 and all-sentinel pairs, contributing exact zeros.

Reference context: one kernel binary per OpenMP shard (reference
spmv.cpp:1034-1041); BASELINE.json config 4 (SpMM) + config 5
(multi-host row partitioning).
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
from cvr_tpu.ops.spmm_pmm import (
    LC_SENTINEL,
    _pad_rows8,
    _pmm_call,
    _round_up,
    _split3,
    pmm_plan,
    to_device_pmm,
)
from cvr_tpu.ops.pallas_route import use_interpret
from cvr_tpu.parallel.dist import AXIS, make_mesh  # noqa: F401
from cvr_tpu.parallel.partition import (
    partition_balance,
    partition_rows_by_nnz,
)


@dataclass
class DistPmmMatrix:
    planes: dict  # name -> [D, ...] device arrays (sharded over AXIS)
    meta: dict  # SEG, nseg, nrt_seg, nrt_max
    bounds: np.ndarray
    unpad_index: jax.Array
    shape: tuple[int, int]
    nnz: int
    mesh: Mesh
    rows_max: int
    c_mean: float  # worst-shard fan-in (gate diagnostics)
    balance: dict | None = None

    @property
    def n_shards(self) -> int:
        return int(self.bounds.shape[0] - 1)


def dist_pmm_pack(csr: CSRMatrix, mesh: Mesh) -> DistPmmMatrix:
    D = mesh.devices.size
    nrows, ncols = csr.shape
    bounds = partition_rows_by_nnz(csr.rowptr, D)
    rows_max = max(int(b) for b in (bounds[1:] - bounds[:-1]))

    devs = []
    for i in range(D):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        s, e = int(csr.rowptr[lo]), int(csr.rowptr[hi])
        rows_l = (
            np.repeat(
                np.arange(hi - lo, dtype=np.int64),
                np.diff(csr.rowptr[lo : hi + 1]).astype(np.int64),
            )
            if hi > lo
            else np.zeros(0, dtype=np.int64)
        )
        plan = pmm_plan(
            rows_l, csr.cols[s:e], csr.vals[s:e], (max(hi - lo, 1), ncols)
        )
        devs.append((plan, to_device_pmm(plan)))

    # ---- one geometry across shards
    SEG = int(devs[0][1].win.shape[1])
    nseg_u = max(len(d.segs) for _, d in devs)
    nlc_u = max(d.lc.shape[0] for _, d in devs)
    nch_u = max(d.val.shape[0] for _, d in devs)
    nrt_seg_u = max(d.nrt_seg for _, d in devs)
    nrt_max = max(d.nrt for _, d in devs)
    c_worst = max(p.c_mean for p, _ in devs)

    def padded(dev):
        win = np.asarray(dev.win)
        rt = np.asarray(dev.rt)
        ch = np.asarray(dev.ch)
        li = np.asarray(dev.li)
        lc = _pad_rows8(np.asarray(dev.lc), LC_SENTINEL)
        val = np.asarray(dev.val)
        rl = np.asarray(dev.rl)
        sentinel_row = lc.shape[0] - 8  # first all-sentinel row
        # pad lc/val/rl planes to the uniform extents (sentinel rows in
        # the pad keep any li pointing there exact-zero)
        lc = np.concatenate(
            [lc, np.full((nlc_u - lc.shape[0], 128), LC_SENTINEL, np.int32)]
        )
        val = np.concatenate(
            [val, np.zeros((nch_u - val.shape[0], 128), np.float32)]
        )
        rl = np.concatenate(
            [rl, np.full((nch_u - rl.shape[0], 128), 127, np.int32)]
        )
        nseg = win.shape[0]
        if nseg < nseg_u:
            pad = nseg_u - nseg
            win = np.concatenate([win, np.zeros((pad, SEG), np.int32)])
            rt = np.concatenate([rt, np.zeros((pad, SEG), np.int32)])
            ch = np.concatenate([ch, np.zeros((pad, SEG), np.int32)])
            li = np.concatenate(
                [li, np.full((pad, SEG), sentinel_row, np.int32)]
            )
        rt0 = np.zeros(nseg_u, np.int32)
        span = np.zeros(nseg_u, np.int32)
        for s, (_a, _n, r0, sp) in enumerate(dev.segs):
            rt0[s], span[s] = r0, sp
        return win, rt, ch, li, lc, val, rl, rt0, span

    packed = [padded(d) for _, d in devs]
    names = ["win", "rt", "ch", "li", "lc", "val", "rl", "rt0", "span"]
    planes_np = {
        n: np.stack([p[i] for p in packed]) for i, n in enumerate(names)
    }
    sharding = NamedSharding(mesh, P(AXIS))
    planes = {k: jax.device_put(v, sharding) for k, v in planes_np.items()}

    row_ids = np.arange(nrows, dtype=np.int64)
    shard_of_row = (
        np.searchsorted(bounds, row_ids, side="right").astype(np.int64) - 1
    )
    rows_pad = nrt_max * 128
    unpad = (
        shard_of_row * rows_pad + (row_ids - bounds[shard_of_row])
    ).astype(np.int32)
    return DistPmmMatrix(
        planes=planes,
        meta={
            "SEG": SEG,
            "nseg": nseg_u,
            "nrt_seg": nrt_seg_u,
            "nrt_max": nrt_max,
        },
        bounds=bounds,
        unpad_index=jax.device_put(unpad, NamedSharding(mesh, P(None))),
        shape=csr.shape,
        nnz=csr.nnz,
        mesh=mesh,
        rows_max=rows_max,
        c_mean=c_worst,
        balance=partition_balance(csr.rowptr, bounds),
    )


def dist_spmm_pmm(
    dm: DistPmmMatrix, X: jax.Array, x_sharded: bool = False
) -> jax.Array:
    """Y = A @ X across the mesh, X [ncols, K] (optionally row-sharded)."""
    nrows, ncols = dm.shape
    D = dm.n_shards
    m = dm.meta
    K = X.shape[1]
    if K > 128:
        raise NotImplementedError(
            "dist PMM covers the small-K mandate (K <= 128); wider K "
            "runs 128-lane chunks through repeated calls"
        )
    Kp = _round_up(max(K, 16), 16)
    ncolsp = _round_up(ncols, 128)
    if x_sharded:
        nc_pad = -(-ncols // D) * D
        if X.shape[0] != nc_pad:
            X = jnp.pad(X, ((0, nc_pad - X.shape[0]), (0, 0)))
    x_spec = P(AXIS) if x_sharded else P(None)
    interpret = use_interpret()

    def fn(pl_, Xs):
        X_full = (
            jax.lax.all_gather(Xs, AXIS, tiled=True)[:ncols]
            if x_sharded
            else Xs
        )
        xt = jnp.pad(
            X_full.astype(jnp.float32),
            ((0, ncolsp - ncols), (0, Kp - K)),
        ).T
        hi, mid, lo = _split3(xt)
        xt3 = jnp.stack([hi, mid, lo])
        call = _pmm_call(m["SEG"], m["nrt_seg"], Kp, interpret)
        # over-allocate by nrt_seg rows so the dynamic slice below never
        # clamps (rt0 + nrt_seg can exceed nrt_max on the last segment)
        y = jnp.zeros((m["nrt_max"] + m["nrt_seg"], Kp, 128), jnp.float32)
        for s in range(m["nseg"]):
            ys = call(
                pl_["win"][0, s], pl_["rt"][0, s], pl_["ch"][0, s],
                pl_["li"][0, s], pl_["lc"][0], pl_["val"][0],
                pl_["rl"][0], xt3,
            )
            span = pl_["span"][0, s]
            rt0 = pl_["rt0"][0, s]
            # mask rows the segment never visited (uninitialized output
            # rows past span), then overlap-add at the traced offset
            rmask = (
                jax.lax.broadcasted_iota(jnp.int32, ys.shape, 0) < span
            )
            ys = jnp.where(rmask, ys, 0.0)
            ysl = jax.lax.dynamic_slice(
                y, (rt0, 0, 0), (m["nrt_seg"], Kp, 128)
            )
            y = jax.lax.dynamic_update_slice(y, ysl + ys, (rt0, 0, 0))
        y = y[: m["nrt_max"]]
        Y = jnp.transpose(y, (0, 2, 1)).reshape(m["nrt_max"] * 128, Kp)
        return Y[None]

    mapped = shard_map(
        fn,
        mesh=dm.mesh,
        in_specs=({k: P(AXIS) for k in dm.planes}, x_spec),
        out_specs=P(AXIS),
        check_vma=False,
    )
    Y_stacked = mapped(dm.planes, X)  # [D, nrt_max*128, Kp]
    return jnp.take(
        Y_stacked.reshape(-1, Y_stacked.shape[-1]), dm.unpad_index, axis=0
    )[:, :K]


def dist_spmm_pmm_jit(dm: DistPmmMatrix, x_sharded: bool = False):
    return jax.jit(functools.partial(dist_spmm_pmm, dm, x_sharded=x_sharded))
