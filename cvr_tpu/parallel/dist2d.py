"""2D (row x col) mesh distributed SpMV with the routed pipeline.

The 1D row-sharded path (cvr_tpu/parallel/dist_routed.py) all-gathers the
whole dense x over the mesh every iteration: received bytes grow as
(D-1) * ncols * 4 while per-device compute stays flat, so weak-scaling
efficiency has a hard knee (parallel/comm_model.py; rgg-class hits it at
D=3 even with ring overlap).  This module is the standard scaling-book
answer past the knee — shard x over a SECOND mesh axis:

  * mesh (R rows x C cols); device (i, j) owns row block i and column
    block j of A.
  * Column blocks are **cyclic 1024-column windows**: window w belongs
    to block w mod C.  This keeps the per-block nnz balanced even on
    banded/near-diagonal matrices (contiguous column ranges would give
    the diagonal blocks everything), preserves the expand kernel's
    window locality exactly (whole windows move together), and makes
    the column relabeling compile-time trivial
    (new_col = (w // C) * 1024 + offset).
  * Per iteration, device (i, j) all-gathers x block j over the ROW
    axis only — (R-1)/R * ncols/C * 4 bytes — computes its local
    routed SpMV, and reduce-scatters the row-block partial y over the
    COL axis — (C-1)/C * nrows/R * 4 bytes.  Per-device ICI volume is
    ~constant in D for R ~ C ~ sqrt(D), vs linear for the 1D ring.

Every block is SELL-R packed under ONE forced geometry (shard_map needs
one program), exactly like the 1D path; the local column count is
uniform by construction (windows pad to ceil(nwin / C) per block).

Reference: the mandate is SURVEY.md §5 "distributed communication
backend" (the reference itself has none — one address space, OpenMP,
spmv.cpp:577); the 2D layout is this framework's own comm-model
prescription (docs/PARITY.md weak-scaling table).
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
from cvr_tpu.formats.sell import sell_pack
from cvr_tpu.formats.sell_routed import RoutedForce, group_padded_rmap, pack_routed
from cvr_tpu.ops.pallas_route import group_emit_encode as _ge
from cvr_tpu.parallel.dist_routed import _MID_KEYS, _local_device
from cvr_tpu.parallel.partition import (
    partition_balance,
    partition_rows_by_nnz,
)

AXIS_R = "row"
AXIS_C = "col"
WIN = 1024


def make_mesh2d(R: int, C: int, devices=None) -> Mesh:
    """An (R x C) mesh with axes ("row", "col")."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: R * C]).reshape(R, C)
    return Mesh(devices, (AXIS_R, AXIS_C))


@dataclass
class Dist2DRoutedMatrix:
    planes: dict  # name -> [R*C, ...] arrays, row-major (i*C + j)
    meta: dict
    bounds: np.ndarray  # [R + 1] global row bounds
    unpad_index: jax.Array  # [nrows] -> flat index into stacked local y
    shape: tuple[int, int]
    nnz: int
    mesh: Mesh
    rows_max: int  # padded local y length (C | rows_max)
    nwin_u: int  # 1024-col windows per column block
    balance: dict | None = None

    @property
    def R(self) -> int:
        return int(self.mesh.devices.shape[0])

    @property
    def C(self) -> int:
        return int(self.mesh.devices.shape[1])


def _col_block(csr_rows: CSRMatrix, j: int, C: int, nwin_u: int) -> CSRMatrix:
    """Column block j of a row-block CSR: cyclic windows, relabeled."""
    w = (csr_rows.cols >> 10).astype(np.int64)
    keep = (w % C) == j
    newc = ((w[keep] // C) * WIN + (csr_rows.cols[keep] & (WIN - 1))).astype(
        np.int32
    )
    lens = np.zeros(csr_rows.shape[0], dtype=np.int64)
    np.add.at(lens, csr_rows.row_ids()[keep], 1)
    rowptr = np.zeros(csr_rows.shape[0] + 1, dtype=np.int64)
    np.cumsum(lens, out=rowptr[1:])
    return CSRMatrix(
        rowptr=rowptr,
        cols=newc,
        vals=csr_rows.vals[keep],
        shape=(csr_rows.shape[0], nwin_u * WIN),
    )


def dist_routed_pack_2d(
    csr: CSRMatrix, mesh: Mesh, split_len: int | None = None
) -> Dist2DRoutedMatrix:
    """Pack every (row block, cyclic column block) under one geometry."""
    from cvr_tpu import _native
    from cvr_tpu.ops.pallas_route import CH, SEGW, TB, YB

    R, C = mesh.devices.shape
    nrows, ncols = csr.shape
    nwin = -(-max(ncols, 1) // WIN)
    nwin_u = -(-nwin // C)
    ncols_local = nwin_u * WIN
    bounds = partition_rows_by_nnz(csr.rowptr, R)
    if split_len is None:
        mean_len = -(-max(csr.nnz, 1) // max(nrows, 1))
        split_len = max(1024, 16 * mean_len)

    sms = []
    for i in range(R):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        rows_i = CSRMatrix(
            rowptr=csr.rowptr[lo : hi + 1] - csr.rowptr[lo],
            cols=csr.cols[csr.rowptr[lo] : csr.rowptr[hi]],
            vals=csr.vals[csr.rowptr[lo] : csr.rowptr[hi]],
            shape=(hi - lo, ncols),
        )
        for j in range(C):
            sms.append(
                sell_pack(
                    _col_block(rows_i, j, C, nwin_u),
                    C=WIN,
                    split_len=split_len,
                )
            )

    # ---- one geometry over all R*C blocks (mirrors the 1D unify)
    nslices_u = max(max(sm.nslices for sm in sms), 1)
    n_ycalls = max(1, -(-nslices_u // YB))
    rcp_u = np.zeros(n_ycalls, dtype=np.int64)
    for sm in sms:
        _, _, _, rcp, _ = group_padded_rmap(
            sm.slice_offsets.astype(np.int64), sm.nslices, 0, YB, CH,
            n_groups=n_ycalls,
        )
        rcp_u = np.maximum(rcp_u, rcp)
    S_pad_u = int(rcp_u.sum())
    rows_nat = max(int(b) for b in (bounds[1:] - bounds[:-1]))
    rows_max = -(-rows_nat // C) * C  # y reduce-scatter needs C | len
    n_extras_u = max(sm.n_splits for sm in sms)
    segw = min(SEGW, -(-nwin_u // 8) * 8)
    n_segs = -(-nwin_u // segw)

    T_u = S_pad_u
    if _native.available() and hasattr(_native, "stream_build2_native"):
        lib = _native.get_lib()
        nsw_total = segw * 8 * n_segs
        for sm in sms:
            rmap, _, _, _, _ = group_padded_rmap(
                sm.slice_offsets.astype(np.int64), sm.nslices,
                sm.n_slots, YB, CH, n_groups=n_ycalls, rcp_override=rcp_u,
            )
            swcnt = np.empty(nsw_total, dtype=np.int64)
            T_src_p = int(
                lib.cvr_stream_count2(
                    sm.n_slots, S_pad_u,
                    np.ascontiguousarray(rmap, dtype=np.int64),
                    np.ascontiguousarray(sm.cols_plane, dtype=np.int32),
                    nsw_total, segw * 8, TB, swcnt,
                )
            )
            T_u = max(T_u, T_src_p)
    else:
        T_u = max(T_u, S_pad_u + nwin_u + n_segs * TB)
    T_u = -(-T_u // WIN) * WIN

    force = RoutedForce(
        rcp=rcp_u, nslices=nslices_u, T=T_u, nrows_out=rows_max,
        n_extras=n_extras_u,
    )
    srs = [pack_routed(sm, force=force) for sm in sms]

    s0 = srs[0]
    for sr in srs[1:]:
        if (
            sr.T != s0.T
            or sr.S_pad != s0.S_pad
            or sr.mid["kind"] != s0.mid["kind"]
            or sr.y_ra["Tp"] != s0.y_ra["Tp"]
            or sr.y_ra["mid_planes"]["kind"] != s0.y_ra["mid_planes"]["kind"]
            or sr.extra_src.shape != s0.extra_src.shape
        ):
            raise AssertionError("2D forced geometry failed to unify")

    planes_np = {
        "w8": np.stack([sr.w8 for sr in srs]),
        "gcls": np.stack([sr.gcls for sr in srs]),
        "li": np.stack([sr.li for sr in srs]),
        "seg_blk": np.stack([sr.seg_blk for sr in srs]),
        "vals_ss": np.stack([sr.vals_ss for sr in srs]),
        "p3": np.stack([sr.p3 for sr in srs]),
        "emit": np.stack([sr.emit for sr in srs]),
        "gemit": np.stack([_ge(sr.emit) for sr in srs]),
        "y_s1": np.stack([sr.y_ra["s1"] for sr in srs]),
        "y_s3": np.stack([sr.y_ra["s3"] for sr in srs]),
        "extra_src": np.stack([sr.extra_src.astype(np.int32) for sr in srs]),
        "extra_row": np.stack([sr.extra_row.astype(np.int32) for sr in srs]),
        "ymask": np.stack([sr.ymask for sr in srs]),
    }
    for k in _MID_KEYS:
        if k in s0.mid:
            planes_np[f"mid_{k}"] = np.stack([sr.mid[k] for sr in srs])
        if k in s0.y_ra["mid_planes"]:
            planes_np[f"ymid_{k}"] = np.stack(
                [sr.y_ra["mid_planes"][k] for sr in srs]
            )
    sharding = NamedSharding(mesh, P((AXIS_R, AXIS_C)))
    planes = {k: jax.device_put(v, sharding) for k, v in planes_np.items()}

    # unpad: global row r (block i, local l) comes back from the stacked
    # reduce-scattered y at flat (i*C + l // py) * py + l % py
    py = rows_max // C
    row_ids = np.arange(nrows, dtype=np.int64)
    shard_of_row = (
        np.searchsorted(bounds, row_ids, side="right").astype(np.int64) - 1
    )
    l = row_ids - bounds[shard_of_row]
    flat = (shard_of_row * C + l // py) * py + (l % py)
    if R * C * py >= 2**31:
        raise ValueError("stacked local-y index exceeds int32 range")

    meta = {
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
    }
    return Dist2DRoutedMatrix(
        planes=planes,
        meta=meta,
        bounds=bounds,
        unpad_index=jax.device_put(
            flat.astype(np.int32), NamedSharding(mesh, P(None))
        ),
        shape=csr.shape,
        nnz=csr.nnz,
        mesh=mesh,
        rows_max=rows_max,
        nwin_u=nwin_u,
        balance=partition_balance(csr.rowptr, bounds),
    )


def dist_spmv_routed_2d(dm: Dist2DRoutedMatrix, x: jax.Array) -> jax.Array:
    """y = A @ x on the (row x col) mesh.

    Per device: all-gather its column block of x over the ROW axis,
    run the local routed pipeline, reduce-scatter the row-block partial
    y over the COL axis.  x may enter with any sharding; the window
    shuffle below is strided slicing (no gather).
    """
    from cvr_tpu.ops.spmv_routed import spmv_routed

    nrows, ncols = dm.shape
    R, C = dm.R, dm.C
    nwin_u = dm.nwin_u
    # cyclic-window layout, (col-block major, row-piece minor): device
    # (i, j) holds piece i of column block j
    xp = jnp.pad(x.astype(jnp.float32), (0, nwin_u * C * WIN - ncols))
    xw = xp.reshape(nwin_u * C, WIN)
    xcyc = jnp.concatenate([xw[j::C] for j in range(C)]).reshape(-1)

    if (nwin_u * WIN) % R:
        raise ValueError("row-axis size must divide the column-block size")

    def fn(pl, xs):
        x_block = jax.lax.all_gather(xs, AXIS_R, tiled=True)
        sd = _local_device(dm, pl, ncols=nwin_u * WIN)
        y_loc = spmv_routed(sd, x_block)  # [rows_max]
        y_piece = jax.lax.psum_scatter(
            y_loc, AXIS_C, scatter_dimension=0, tiled=True
        )
        return y_piece[None]

    mapped = shard_map(
        fn,
        mesh=dm.mesh,
        in_specs=(
            {k: P((AXIS_R, AXIS_C)) for k in dm.planes},
            P((AXIS_C, AXIS_R)),
        ),
        out_specs=P((AXIS_R, AXIS_C)),
        check_vma=False,
    )
    y_stacked = mapped(dm.planes, xcyc)  # [R*C, rows_max // C]
    return jnp.take(y_stacked.reshape(-1), dm.unpad_index, axis=0)


def dist_spmv_routed_2d_jit(dm: Dist2DRoutedMatrix):
    return jax.jit(functools.partial(dist_spmv_routed_2d, dm))
