"""Distributed SpMV with the FLAGSHIP routed Pallas pipeline per shard.

This closes the round-1 gap: the routed-gather kernel (the fast path for
power-law matrices, cvr_tpu/ops/spmv_routed.py) now scales out.  Rows are
partitioned by nnz balance, every shard is SELL-R packed with ONE shared
kernel geometry, and the dense x is replicated or all-gathered over the
mesh axis (ICI) inside shard_map before the per-shard pipeline.

shard_map compiles one program over identical local shapes, so the packer
pins every geometry knob across shards via ``RoutedForce``
(cvr_tpu/formats/sell_routed.py):

  * ``T`` — route tiles (max over shards, 1024-rounded), so the expand /
    middle / reduce grids agree;
  * ``rcp`` / ``nslices`` — per-reduce-call padded row counts and the
    slice count (padding rows carry emit = -1 and zero values: invisible);
  * ``nrows_out`` — the y-route output length (max shard rows; rows past
    a shard's real count are never read back);
  * ``n_extras`` — split-row extras padded with out-of-bounds rows
    (dropped by the scatter-add's mode="drop").

The reference's analogue is one optimized kernel binary run by every
OpenMP thread on its own nnz-balanced shard (spmv.cpp:577-667, 1034-1041);
here the "binary" is one XLA executable over the mesh.  Matrices past the
~100M-nnz/chip routed cap (sell_routed._check_T) shard transparently.
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
from cvr_tpu.formats.sell_routed import (
    RoutedForce,
    group_padded_rmap,
    pack_routed,
)
from cvr_tpu.ops.pallas_route import group_emit_encode as _ge
from cvr_tpu.ops.spmv_routed import SellRoutedDevice, spmv_routed
from cvr_tpu.ops.pallas_route import RouteDevice, RouteMidDevice
from cvr_tpu.parallel.dist import AXIS, make_mesh  # noqa: F401
from cvr_tpu.parallel.partition import (
    partition_balance,
    partition_rows_by_nnz,
)

TILE = 1024

_MID_KEYS = ("mid", "m1", "csel", "m3")


@dataclass
class DistRoutedMatrix:
    """Row-sharded SELL-R planes stacked on a leading device axis."""

    planes: dict  # name -> jnp array, leading axis = n_shards
    meta: dict  # shared static geometry (T, S_pad, nslices, ...)
    bounds: np.ndarray  # [n_shards + 1] global row bounds
    unpad_index: jax.Array  # [nrows] -> flat index into stacked local y
    shape: tuple[int, int]
    nnz: int
    mesh: Mesh
    rows_max: int
    balance: dict | None = None  # partition_balance diagnostics

    @property
    def n_shards(self) -> int:
        return int(self.bounds.shape[0] - 1)


def _natural_rcp(sm, n_ycalls, YB, CH):
    _, _, _, rcp, _ = group_padded_rmap(
        sm.slice_offsets.astype(np.int64), sm.nslices, 0, YB, CH,
        n_groups=n_ycalls,
    )
    return rcp


def dist_routed_pack(
    csr: CSRMatrix,
    mesh: Mesh,
    split_len: int | None = None,
    overlap: bool = False,
) -> DistRoutedMatrix:
    """Partition rows by nnz, SELL-R-pack each shard under one forced
    geometry, stack the planes and device_put them sharded.

    ``overlap=True`` additionally bakes a ppermute-ring schedule into
    every shard's stream tile order (formats/sell_routed.RingSpec) so
    dist_spmv_routed(..., overlap=True) can run the expand pass piece by
    piece, hidden behind the ring moving the next x piece over ICI.
    """
    from cvr_tpu import _native
    from cvr_tpu.ops.pallas_route import CH, SEGW, TB, YB

    D = mesh.devices.size
    bounds = partition_rows_by_nnz(csr.rowptr, D)
    locals_ = []
    for i in range(D):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        locals_.append(
            CSRMatrix(
                rowptr=csr.rowptr[lo : hi + 1] - csr.rowptr[lo],
                cols=csr.cols[csr.rowptr[lo] : csr.rowptr[hi]],
                vals=csr.vals[csr.rowptr[lo] : csr.rowptr[hi]],
                shape=(hi - lo, csr.shape[1]),
            )
        )
    if split_len is None:
        mean_len = -(-max(csr.nnz, 1) // max(csr.shape[0], 1))
        split_len = max(1024, 16 * mean_len)
    sms = [sell_pack(lc, C=TILE, split_len=split_len) for lc in locals_]

    # ---- unified geometry across shards
    nslices_u = max(sm.nslices for sm in sms)
    n_ycalls = max(1, -(-nslices_u // YB))
    rcp_u = np.zeros(n_ycalls, dtype=np.int64)
    for sm in sms:
        rcp_u = np.maximum(rcp_u, _natural_rcp(sm, n_ycalls, YB, CH))
    S_pad_u = int(rcp_u.sum())
    rows_max = max(int(b) for b in (bounds[1:] - bounds[:-1]))
    n_extras_u = max(sm.n_splits for sm in sms)
    ncols = csr.shape[1]
    nwin_total = -(-max(ncols, 1) // TILE)
    segw = min(SEGW, -(-nwin_total // 8) * 8)

    if overlap:
        from cvr_tpu.formats.sell_routed import (
            RingSpec,
            ring_block_unlock,
            routed_stream_phase,
        )

        if D < 2:
            raise ValueError("overlap needs a mesh with >= 2 devices")
        force = RoutedForce(
            rcp=rcp_u, nslices=nslices_u, T=None, nrows_out=rows_max,
            n_extras=n_extras_u,
        )
        streams = [routed_stream_phase(sm, force) for sm in sms]
        ncols_pad = -(-ncols // (128 * D)) * (128 * D)
        Wr = ncols_pad // (128 * D)
        probe = np.zeros(D, dtype=np.int64)
        cnt_u = np.zeros(D, dtype=np.int64)
        for i, st in enumerate(streams):
            unl = ring_block_unlock(st, RingSpec(D, i, Wr, probe))
            cnt_u = np.maximum(cnt_u, np.bincount(unl, minlength=D))
        srs = [
            pack_routed(
                sm, force=force, ring=RingSpec(D, i, Wr, cnt_u), stream=st
            )
            for i, (sm, st) in enumerate(zip(sms, streams))
        ]
        if len({sr.ring_cnt for sr in srs}) != 1:
            raise AssertionError("ring schedule failed to unify shards")
        return _dist_routed_finish(
            csr, mesh, bounds, srs,
            ring_meta={
                "ring_cnt": srs[0].ring_cnt,
                # per-step elementwise max across shards (one shard_map
                # program: every shard runs the same table spans)
                "ring_nsegtab": tuple(
                    max(t) for t in zip(*[sr.ring_nsegtab for sr in srs])
                ),
                "ring_Wr": Wr,
            },
        )

    # per-shard stream tile count under the unified S_pad
    T_u = S_pad_u
    n_segs = -(-nwin_total // segw)
    if _native.available() and hasattr(_native, "stream_build2_native"):
        lib = _native.get_lib()
        nsw_total = segw * 8 * n_segs
        for sm in sms:
            rmap, _, _, _, _ = group_padded_rmap(
                sm.slice_offsets.astype(np.int64), sm.nslices,
                sm.n_slots, YB, CH, n_groups=n_ycalls,
                rcp_override=rcp_u,
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
        # numpy fallback: a safe upper bound — the stream holds
        # S_pad_u*1024 elements, each nonempty window adds at most one
        # partial tile, and each segment pads to a TB multiple
        T_u = max(
            T_u,
            S_pad_u + nwin_total + n_segs * TB,
        )
    T_u = -(-T_u // TILE) * TILE

    force = RoutedForce(
        rcp=rcp_u, nslices=nslices_u, T=T_u, nrows_out=rows_max,
        n_extras=n_extras_u,
    )
    srs = [pack_routed(sm, force=force) for sm in sms]
    return _dist_routed_finish(csr, mesh, bounds, srs)


def _dist_routed_finish(
    csr, mesh: Mesh, bounds, srs, ring_meta: dict | None = None
) -> DistRoutedMatrix:
    """Stack the per-shard routed planes and device_put them sharded."""
    D = mesh.devices.size
    rows_max = max(int(b) for b in (bounds[1:] - bounds[:-1]))
    s0 = srs[0]
    mid_kind = s0.mid["kind"]
    ymid_kind = s0.y_ra["mid_planes"]["kind"]
    for sr in srs[1:]:
        if (
            sr.T != s0.T
            or sr.S_pad != s0.S_pad
            or sr.mid["kind"] != mid_kind
            or sr.y_ra["Tp"] != s0.y_ra["Tp"]
            or sr.y_ra["mid_planes"]["kind"] != ymid_kind
            or sr.extra_src.shape != s0.extra_src.shape
        ):
            raise AssertionError("forced geometry failed to unify shards")

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
    if ring_meta is not None:
        planes_np["seg_ring"] = np.stack([sr.seg_ring for sr in srs])

    sharding = NamedSharding(mesh, P(AXIS))
    planes = {k: jax.device_put(v, sharding) for k, v in planes_np.items()}

    nrows = csr.shape[0]
    row_ids = np.arange(nrows, dtype=np.int64)
    shard_of_row = (
        np.searchsorted(bounds, row_ids, side="right").astype(np.int64) - 1
    )
    local_idx = row_ids - bounds[shard_of_row]
    if D * rows_max >= 2**31:
        raise ValueError(
            "stacked local-y index exceeds int32 range "
            f"({D} shards x {rows_max} padded rows)"
        )
    unpad = (shard_of_row * rows_max + local_idx).astype(np.int32)

    meta = {
        "T": s0.T,
        "S_pad": s0.S_pad,
        "nslices": s0.nslices,
        "segw": s0.segw,
        "n_segs": s0.n_segs,
        "ycall_rows": tuple(
            (int(a), int(b)) for a, b in np.asarray(s0.ycall_rows)
        ),
        "mid_kind": mid_kind,
        "mid_Tk": s0.mid["Tk"],
        "y_T": s0.y_ra["T"],
        "y_Tp": s0.y_ra["Tp"],
        "y_n": s0.y_ra["n"],
        "ymid_kind": ymid_kind,
        "ymid_Tk": s0.y_ra["mid_planes"]["Tk"],
    }
    if ring_meta is not None:
        meta.update(ring_meta)
    return DistRoutedMatrix(
        planes=planes,
        meta=meta,
        bounds=bounds,
        unpad_index=jax.device_put(unpad, NamedSharding(mesh, P(None))),
        shape=csr.shape,
        nnz=csr.nnz,
        mesh=mesh,
        rows_max=rows_max,
        balance=partition_balance(csr.rowptr, bounds),
    )


def _local_device(
    dm, pl: dict, ncols: int | None = None
) -> SellRoutedDevice:
    """Assemble the single-chip device struct from shard-local planes.

    ``ncols`` overrides the local column count (the 2D mesh path's
    column blocks are narrower than the global matrix,
    cvr_tpu/parallel/dist2d.py)."""
    m = dm.meta

    def midp(prefix, kind, Tk):
        return RouteMidDevice(
            kind=kind,
            Tk=Tk,
            **{
                k: pl[f"{prefix}{k}"][0]
                for k in _MID_KEYS
                if f"{prefix}{k}" in pl
            },
        )

    return SellRoutedDevice(
        w8=pl["w8"][0],
        gcls=pl["gcls"][0],
        li=pl["li"][0],
        seg_blk=pl["seg_blk"][0],
        mid=midp("mid_", m["mid_kind"], m["mid_Tk"]),
        vals_ss=pl["vals_ss"][0],
        p3=pl["p3"][0],
        emit=pl["emit"][0],
        gemit=pl["gemit"][0],
        yroute=RouteDevice(
            s1=pl["y_s1"][0],
            mid=midp("ymid_", m["ymid_kind"], m["ymid_Tk"]),
            s3=pl["y_s3"][0],
            T=m["y_T"],
            Tp=m["y_Tp"],
            n=m["y_n"],
        ),
        ycall_rows=m["ycall_rows"],
        regions=(),  # forced geometries pack without regular regions
        extra_src=pl["extra_src"][0],
        extra_row=pl["extra_row"][0],
        ymask=pl["ymask"][0],
        shape=(dm.rows_max, ncols if ncols is not None else dm.shape[1]),
        T=m["T"],
        S=m["S_pad"],
        S_pad=m["S_pad"],
        nslices=m["nslices"],
        segw=m["segw"],
        n_segs=m["n_segs"],
    )


def dist_spmv_routed(
    dm: DistRoutedMatrix,
    x: jax.Array,
    x_sharded: bool = False,
    overlap: bool = False,
) -> jax.Array:
    """y = A @ x across the mesh with the routed pipeline per shard.

    x_sharded=True all-gathers a row-sharded x over the mesh axis (ICI)
    inside shard_map first; x is padded to a device multiple here and
    sliced after the gather, so any ncols works (not just multiples of
    the shard count).

    overlap=True (requires a dist_routed_pack(..., overlap=True)
    artifact and x_sharded=True) replaces the blocking all-gather with a
    D-step ppermute ring: at step s each device updates its gathered-x
    buffer with the piece it holds, starts the permute moving that piece
    to its neighbour, and — while the permute is in flight on ICI — runs
    the expand pass over exactly the stream blocks whose windows are
    covered by the pieces received so far (the pack scheduled them
    contiguously; formats/sell_routed.RingSpec).  The x-independent tail
    (middle route, reduce, y-route) runs once after the ring.
    """
    nrows, ncols = dm.shape
    D = dm.n_shards
    if overlap:
        if not x_sharded:
            raise ValueError("overlap requires x_sharded=True")
        if "ring_cnt" not in dm.meta:
            raise ValueError(
                "overlap requires dist_routed_pack(..., overlap=True)"
            )
        return _dist_spmv_routed_overlap(dm, x)
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
        sd = _local_device(dm, pl)
        return spmv_routed(sd, x_full)[None]

    mapped = shard_map(
        fn,
        mesh=dm.mesh,
        in_specs=({k: P(AXIS) for k in dm.planes}, x_spec),
        out_specs=P(AXIS),
        # pallas_call outputs carry no vma annotation
        check_vma=False,
    )
    y_stacked = mapped(dm.planes, x)  # [D, rows_max]
    return jnp.take(y_stacked.reshape(-1), dm.unpad_index, axis=0)


def _dist_spmv_routed_overlap(
    dm: DistRoutedMatrix, x: jax.Array
) -> jax.Array:
    from cvr_tpu.ops.pallas_route import TB, expand_ring_step
    from cvr_tpu.ops.spmv_routed import route_post_expand

    nrows, ncols = dm.shape
    D = dm.n_shards
    m = dm.meta
    cnt = m["ring_cnt"]
    off = np.zeros(D + 1, dtype=np.int64)
    np.cumsum(np.asarray(cnt, dtype=np.int64), out=off[1:])
    nsegtab_step = tuple(max(int(v), 1) for v in m["ring_nsegtab"])
    Wr = int(m["ring_Wr"])
    segw8 = int(m["segw"]) * 8
    n_segs = int(m["n_segs"])
    ncols_pad = D * Wr * 128
    if x.shape[0] != ncols_pad:
        x = jnp.pad(x, (0, ncols_pad - x.shape[0]))
    # gathered-x buffer rows: every table slice (k_lo+c)*segw8+segw8+8
    # for a referenced segment must be resident
    XGR = max(n_segs * segw8 + 8, ncols_pad // 128)
    perm_pairs = [(j, (j + 1) % D) for j in range(D)]

    def fn(pl, xs):
        i = jax.lax.axis_index(AXIS)
        sd = _local_device(dm, pl)
        seg_ring = pl["seg_ring"][0]
        cur = xs.reshape(Wr, 128).astype(jnp.float32)
        xg = jnp.zeros((XGR, 128), jnp.float32)
        parts = []
        for s in range(D):
            p = (i - s) % D
            xg = jax.lax.dynamic_update_slice(xg, cur, (p * Wr, 0))
            # issue the permute BEFORE the expand so XLA can hide the
            # ICI transfer behind the gather compute of this step
            nxt = (
                jax.lax.ppermute(cur, AXIS, perm_pairs)
                if s < D - 1
                else cur
            )
            if cnt[s]:
                # at the final step every piece has arrived and the
                # table base drops to 0 (mirrors _ring_permute's k_lo)
                k_lo = 0 if s == D - 1 else (p * Wr) // segw8
                tab = jnp.concatenate(
                    [
                        jax.lax.dynamic_slice(
                            xg, ((k_lo + c) * segw8, 0), (segw8 + 8, 128)
                        )
                        for c in range(nsegtab_step[s])
                    ],
                    axis=0,
                )
                o0, o1 = int(off[s]), int(off[s + 1])
                parts.append(
                    expand_ring_step(
                        o0,
                        int(cnt[s]),
                        jax.lax.slice_in_dim(sd.w8, o0 * TB, o1 * TB),
                        jax.lax.slice_in_dim(
                            sd.gcls, o0 * (TB // 8), o1 * (TB // 8)
                        ),
                        jax.lax.slice_in_dim(seg_ring, o0, o1),
                        sd.li,
                        tab,
                        int(m["segw"]),
                    )
                )
            cur = nxt
        g1 = (
            parts[0]
            if len(parts) == 1
            else jnp.concatenate(parts, axis=1)
        )
        return route_post_expand(sd, g1)[None]

    mapped = shard_map(
        fn,
        mesh=dm.mesh,
        in_specs=({k: P(AXIS) for k in dm.planes}, P(AXIS)),
        out_specs=P(AXIS),
        check_vma=False,
    )
    y_stacked = mapped(dm.planes, x)
    return jnp.take(y_stacked.reshape(-1), dm.unpad_index, axis=0)


def dist_spmv_routed_jit(
    dm: DistRoutedMatrix,
    x_sharded: bool = False,
    overlap: bool = False,
):
    """A jitted closure over the matrix for iteration-heavy callers."""
    return jax.jit(
        functools.partial(
            dist_spmv_routed, dm, x_sharded=x_sharded, overlap=overlap
        )
    )
