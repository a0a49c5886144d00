"""Distributed BELL SpMV: row-sharded natural-order band planes.

The road-domain format (cvr_tpu/formats/bell.py) scales out: rows are
partitioned by nnz balance with shard boundaries rounded to 1024 (the
BELL window advances per 1024-row tile, so an aligned shard's local
planes are exactly the global planes re-based), each shard packs its
local band with shard-local rows and ``col - lo`` columns (negative
columns down to the window's pre region are part of the format), and
the per-shard x window is one dynamic slice of the all-gathered x.
Spill entries (beyond reach / beyond k planes) keep GLOBAL columns and
pack under one forced routed geometry across shards, exactly like
cvr_tpu/parallel/dist_routed.py.

Reference context: the reference runs one kernel binary per OpenMP
thread on its own row shard (spmv.cpp:1034-1041); BELL's shard program
is likewise identical across devices (shard_map requires it).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from cvr_tpu.formats.bell import BellInfeasible, bell_pack
from cvr_tpu.formats.csr import CSRMatrix
from cvr_tpu.formats.sell import sell_pack
from cvr_tpu.formats.sell_routed import RoutedForce, group_padded_rmap, pack_routed
from cvr_tpu.ops.pallas_bell import REACH_CAP, bell_gather_mac
from cvr_tpu.ops.pallas_route import group_emit_encode as _ge
from cvr_tpu.parallel.dist import AXIS, make_mesh  # noqa: F401
from cvr_tpu.parallel.dist_routed import _MID_KEYS, _local_device
from cvr_tpu.parallel.partition import (
    partition_balance,
    partition_rows_by_nnz,
)


@dataclass
class DistBellMatrix:
    planes: dict  # name -> [D, ...] arrays
    meta: dict
    bounds: np.ndarray  # [D + 1] global row bounds (1024-aligned)
    unpad_index: jax.Array
    shape: tuple[int, int]
    nnz: int
    mesh: Mesh
    rows_max: int
    spill: object | None  # mini DistRoutedMatrix-like holder for _local_device
    balance: dict | None = None

    @property
    def n_shards(self) -> int:
        return int(self.bounds.shape[0] - 1)


@dataclass
class _SpillHolder:
    """Duck-typed holder so dist_routed._local_device can assemble the
    spill's per-shard device struct."""

    meta: dict
    rows_max: int
    shape: tuple[int, int]


def _aligned_bounds(rowptr, D: int, nrows: int) -> np.ndarray:
    b = partition_rows_by_nnz(rowptr, D).astype(np.int64)
    b = (b + 512) // 1024 * 1024
    b[0] = 0
    b[-1] = nrows
    # keep monotone non-decreasing (empty shards allowed on tiny inputs)
    for i in range(1, D):
        b[i] = min(max(b[i], b[i - 1]), nrows)
    return b


def dist_bell_pack(
    csr: CSRMatrix, mesh: Mesh, max_spill: float = 0.04
) -> DistBellMatrix:
    from cvr_tpu.ops.pallas_route import CH, SEGW, TB, YB

    D = mesh.devices.size
    nrows, ncols = csr.shape
    bounds = _aligned_bounds(csr.rowptr, D, nrows)

    # the BELL gate and geometry are GLOBAL (offsets are shift-invariant
    # under the aligned row sharding): one stats pass decides k/reach
    probe = bell_pack(csr, max_spill=max_spill, pack_spill=False)
    k_u, reach_u = probe.k, probe.reach

    locals_ = []
    for i in range(D):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        locals_.append(
            CSRMatrix(
                rowptr=csr.rowptr[lo : hi + 1] - csr.rowptr[lo],
                cols=(
                    csr.cols[csr.rowptr[lo] : csr.rowptr[hi]].astype(
                        np.int64
                    )
                    - lo
                ).astype(np.int32),
                vals=csr.vals[csr.rowptr[lo] : csr.rowptr[hi]],
                shape=(hi - lo, ncols),
            )
        )
    rows_nat = max(int(b) for b in (bounds[1:] - bounds[:-1]))
    R_sub_min = -(-max(rows_nat, 1) // 128)
    bms = [
        bell_pack(
            lc,
            k=k_u,
            max_spill=1.0,  # gated globally above
            reach_force=reach_u,
            R_sub_min=R_sub_min,
            pack_spill=False,
        )
        if lc.nnz
        else None
        for lc in locals_
    ]
    # shards can be empty on tiny inputs: zero planes
    k_ref = next(bm for bm in bms if bm is not None)
    for i, bm in enumerate(bms):
        if bm is None:
            continue
        if bm.R_sub != k_ref.R_sub or bm.TBb != k_ref.TBb:
            raise AssertionError("BELL forced geometry failed to unify")

    R_sub = k_ref.R_sub
    zli = np.zeros((k_u, R_sub, 128), np.int16)
    zva = np.zeros((k_u, R_sub, 128), np.float32)
    planes_np = {
        "li": np.stack([bm.li if bm else zli for bm in bms]),
        "vals": np.stack([bm.vals if bm else zva for bm in bms]),
        "lo": np.asarray(bounds[:-1], dtype=np.int32).reshape(D, 1),
    }

    # ---- forced routed spill across shards (global columns)
    spill_meta = None
    sp_csrs = []
    sp_maps = []
    any_spill = False
    for i, bm in enumerate(bms):
        lo = int(bounds[i])
        if bm is None or bm.spill_raw is None:
            sp_csrs.append(
                CSRMatrix(
                    rowptr=np.zeros(1, np.int64),
                    cols=np.zeros(0, np.int32),
                    vals=np.zeros(0, np.float32),
                    shape=(0, ncols),
                )
            )
            sp_maps.append(np.zeros(0, np.int64))
            continue
        any_spill = True
        sp_rows, sp_cols, sp_vals = bm.spill_raw
        gcols = (sp_cols.astype(np.int64) + lo).astype(np.int32)
        smap, rows_c = np.unique(sp_rows, return_inverse=True)
        rp = np.zeros(smap.size + 1, dtype=np.int64)
        np.cumsum(np.bincount(rows_c, minlength=smap.size), out=rp[1:])
        sp_csrs.append(
            CSRMatrix(rowptr=rp, cols=gcols, vals=sp_vals,
                      shape=(int(smap.size), ncols))
        )
        sp_maps.append(smap.astype(np.int64))
    if any_spill:
        sms = [sell_pack(c, C=1024) for c in sp_csrs]
        nsl_u = max(max(sm.nslices for sm in sms), 1)
        n_yc = max(1, -(-nsl_u // YB))
        rcp_u = np.zeros(n_yc, dtype=np.int64)
        for sm in sms:
            _, _, _, rcp, _ = group_padded_rmap(
                sm.slice_offsets.astype(np.int64), sm.nslices, 0, YB,
                CH, n_groups=n_yc,
            )
            rcp_u = np.maximum(rcp_u, rcp)
        sp_rows_max = max(max(c.shape[0] for c in sp_csrs), 1)
        n_ex = max(sm.n_splits for sm in sms)
        nwin_total = -(-max(ncols, 1) // 1024)
        segw = min(SEGW, -(-nwin_total // 8) * 8)
        n_segs = -(-nwin_total // segw)
        T_u = int(rcp_u.sum()) + nwin_total + n_segs * TB
        T_u = -(-T_u // 1024) * 1024
        force = RoutedForce(
            rcp=rcp_u, nslices=nsl_u, T=T_u, nrows_out=sp_rows_max,
            n_extras=n_ex,
        )
        srs = [pack_routed(sm, force=force) for sm in sms]
        s0 = srs[0]
        for sr in srs[1:]:
            if sr.T != s0.T or sr.S_pad != s0.S_pad:
                raise AssertionError("spill geometry failed to unify")
        planes_np.update(
            {
                "sp_w8": np.stack([sr.w8 for sr in srs]),
                "sp_gcls": np.stack([sr.gcls for sr in srs]),
                "sp_li": np.stack([sr.li for sr in srs]),
                "sp_seg_blk": np.stack([sr.seg_blk for sr in srs]),
                "sp_vals_ss": np.stack([sr.vals_ss for sr in srs]),
                "sp_p3": np.stack([sr.p3 for sr in srs]),
                "sp_emit": np.stack([sr.emit for sr in srs]),
                "sp_gemit": np.stack([_ge(sr.emit) for sr in srs]),
                "sp_y_s1": np.stack([sr.y_ra["s1"] for sr in srs]),
                "sp_y_s3": np.stack([sr.y_ra["s3"] for sr in srs]),
                "sp_extra_src": np.stack(
                    [sr.extra_src.astype(np.int32) for sr in srs]
                ),
                "sp_extra_row": np.stack(
                    [sr.extra_row.astype(np.int32) for sr in srs]
                ),
                "sp_ymask": np.stack([sr.ymask for sr in srs]),
                "sp_map": np.stack(
                    [
                        np.pad(
                            m, (0, sp_rows_max - m.size),
                            constant_values=rows_nat,  # OOB -> dropped
                        ).astype(np.int32)
                        for m in sp_maps
                    ]
                ),
            }
        )
        for kk in _MID_KEYS:
            if kk in s0.mid:
                planes_np[f"sp_mid_{kk}"] = np.stack(
                    [sr.mid[kk] for sr in srs]
                )
            if kk in s0.y_ra["mid_planes"]:
                planes_np[f"sp_ymid_{kk}"] = np.stack(
                    [sr.y_ra["mid_planes"][kk] for sr in srs]
                )
        spill_meta = {
            "T": s0.T,
            "S_pad": s0.S_pad,
            "nslices": s0.nslices,
            "segw": s0.segw,
            "n_segs": s0.n_segs,
            "ycall_rows": tuple(
                (int(a), int(b)) for a, b in np.asarray(s0.ycall_rows)
            ),
            "mid_kind": s0.mid["kind"],
            "mid_Tk": s0.mid["Tk"],
            "y_T": s0.y_ra["T"],
            "y_Tp": s0.y_ra["Tp"],
            "y_n": s0.y_ra["n"],
            "ymid_kind": s0.y_ra["mid_planes"]["kind"],
            "ymid_Tk": s0.y_ra["mid_planes"]["Tk"],
            "rows_max": sp_rows_max,
        }

    sharding = NamedSharding(mesh, P(AXIS))
    planes = {k: jax.device_put(v, sharding) for k, v in planes_np.items()}

    row_ids = np.arange(nrows, dtype=np.int64)
    shard_of_row = (
        np.searchsorted(bounds, row_ids, side="right").astype(np.int64) - 1
    )
    shard_of_row = np.minimum(shard_of_row, D - 1)
    unpad = (
        shard_of_row * rows_nat + (row_ids - bounds[shard_of_row])
    ).astype(np.int32)
    meta = {
        "k": k_u,
        "reach": reach_u,
        "d": k_ref.d,
        "pre": k_ref.pre,
        "ncand": k_ref.ncand,
        "TBb": k_ref.TBb,
        "R_sub": R_sub,
        "spill": spill_meta,
    }
    return DistBellMatrix(
        planes=planes,
        meta=meta,
        bounds=bounds,
        unpad_index=jax.device_put(unpad, NamedSharding(mesh, P(None))),
        shape=csr.shape,
        nnz=csr.nnz,
        mesh=mesh,
        rows_max=rows_nat,
        spill=(
            _SpillHolder(
                meta=spill_meta,
                rows_max=spill_meta["rows_max"],
                shape=(spill_meta["rows_max"], ncols),
            )
            if spill_meta
            else None
        ),
        balance=partition_balance(csr.rowptr, bounds),
    )


def dist_spmv_bell(
    dm: DistBellMatrix, x: jax.Array, x_sharded: bool = False
) -> jax.Array:
    """y = A @ x across the mesh with the BELL kernel per shard."""
    from cvr_tpu.ops.spmv_routed import spmv_routed

    nrows, ncols = dm.shape
    D = dm.n_shards
    m = dm.meta
    R_sub, TBb, pre = m["R_sub"], m["TBb"], m["pre"]
    X = R_sub + TBb * 8
    if x_sharded:
        ncols_pad = -(-ncols // D) * D
        if x.shape[0] != ncols_pad:
            x = jnp.pad(x, (0, ncols_pad - x.shape[0]))
    x_spec = P(AXIS) if x_sharded else P(None)

    def fn(pl, xs):
        x_full = (
            jax.lax.all_gather(xs, AXIS, tiled=True)[:ncols]
            if x_sharded
            else xs
        )
        x_ext = jnp.pad(
            x_full.astype(jnp.float32), (pre * 128, X * 128)
        )
        lo = pl["lo"][0, 0]
        xt = jax.lax.dynamic_slice(x_ext, (lo,), (X * 128,))
        y2 = bell_gather_mac(
            pl["li"][0], pl["vals"][0], xt.reshape(X, 128),
            m["d"], m["ncand"], TBb,
        )
        y = y2.reshape(-1)[: dm.rows_max]
        if dm.spill is not None:
            # shard-local spill planes keep their [1, ...] leading dim:
            # _local_device indexes [0] itself
            spl = {
                k[3:]: v for k, v in pl.items()
                if k.startswith("sp_") and k != "sp_map"
            }
            sd = _local_device(dm.spill, spl)
            yc = spmv_routed(sd, x_full)
            y = y.at[pl["sp_map"][0]].add(yc, mode="drop")
        return y[None]

    mapped = shard_map(
        fn,
        mesh=dm.mesh,
        in_specs=({k: P(AXIS) for k in dm.planes}, x_spec),
        out_specs=P(AXIS),
        check_vma=False,
    )
    y_stacked = mapped(dm.planes, x)
    return jnp.take(y_stacked.reshape(-1), dm.unpad_index, axis=0)


def dist_spmv_bell_jit(dm: DistBellMatrix, x_sharded: bool = False):
    return jax.jit(
        functools.partial(dist_spmv_bell, dm, x_sharded=x_sharded)
    )
