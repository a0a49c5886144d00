"""y = A @ x on the SELL-R artifact: the v3 routed-gather SpMV op.

Pipeline (all static control flow; see cvr_tpu/formats/sell_routed.py and
docs/DESIGN.md):

    x2   = pad(x) as (H, 128)                      [VMEM-resident table]
    g1   = expand(w10, li, x2)                      window gather + stage 1
    g2   = middle_pass(g1, mid)                     route middle (recursive)
    gxr  = g2[:, :S_pad]
    ys   = reduce_slices(emit, vals, gxr, p3)       FMA + slice sums + st.3
    y    = route(y, ys) ; scatter-add split-row extras ; [:nrows]
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from cvr_tpu.formats.sell_routed import SellRouted
from cvr_tpu.ops.pallas_route import (
    RouteDevice,
    RouteMidDevice,
    apply_route_stream,
    chunksel,
    expand,
    expand_x_table,
    group_emit_encode,
    mid_to_device,
    reduce_m3_regular,
    reduce_m3_slices,
    route_to_device,
    stream_to_mstream,
)
from cvr_tpu.ops.pallas_route import _mid_fused_call, use_interpret


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "w8",
        "gcls",
        "li",
        "seg_blk",
        "mid",
        "vals_ss",
        "p3",
        "emit",
        "gemit",
        "yroute",
        "extra_src",
        "extra_row",
        "ymask",
        "hidx",
        "hvals",
        "hgcls",
        "hemit",
        "hgemit",
        "hxids",
    ],
    meta_fields=[
        "shape", "T", "S", "S_pad", "nslices", "segw", "n_segs",
        "ycall_rows", "regions", "nslA", "zone_rows", "yslices",
        "hot_ycall_rows", "hot_regions", "hot_nslices", "hot_ncand",
    ],
)
@dataclasses.dataclass(frozen=True)
class SellRoutedDevice:
    w8: jax.Array
    gcls: jax.Array
    li: jax.Array
    seg_blk: jax.Array
    mid: RouteMidDevice
    vals_ss: jax.Array
    p3: jax.Array
    emit: jax.Array
    gemit: jax.Array
    yroute: RouteDevice
    ycall_rows: tuple
    regions: tuple  # ((grp, row0, n_rows, w, slice_rel), ...) static
    extra_src: jax.Array
    extra_row: jax.Array
    ymask: jax.Array  # (nrows_out,) f32 row mask, (0,) when unneeded
    shape: tuple[int, int]
    T: int
    S: int
    S_pad: int
    nslices: int
    segw: int
    n_segs: int
    nslA: int = 0  # leading lambda-segment (zone-A) slices
    zone_rows: int = 0  # padded plane rows with aligned stage-3
    yslices: int = 0  # y-stream tiles after the zone-A fold/compact
    # hub-column hybrid (cvr_tpu/formats/hot.py); hot_nslices == 0 means
    # no hot planes and the zero-size arrays below are ignored
    hidx: jax.Array | None = None
    hvals: jax.Array | None = None
    hgcls: jax.Array | None = None
    hemit: jax.Array | None = None
    hgemit: jax.Array | None = None
    hxids: jax.Array | None = None
    hot_ycall_rows: tuple = ()
    hot_regions: tuple = ()
    hot_nslices: int = 0
    hot_ncand: int = 1


def to_device_routed(sr: SellRouted, device=None) -> SellRoutedDevice:
    put = functools.partial(jax.device_put, device=device)
    zi16 = np.zeros((8, 0, 128), np.int16)
    zf32 = np.zeros((8, 0, 128), np.float32)
    zi32 = np.zeros(0, np.int32)
    hp = sr.hot
    return SellRoutedDevice(
        hidx=put(hp.hidx if hp else zi16),
        hvals=put(hp.hvals if hp else zf32),
        hgcls=put(hp.hgcls if hp else zi32),
        hemit=put(hp.hemit if hp else zi32),
        hgemit=put(group_emit_encode(hp.hemit) if hp else zi32),
        hxids=put(hp.hot_ids if hp else zi32),
        hot_ycall_rows=tuple(
            (int(a), int(b)) for a, b in np.asarray(hp.ycall_rows)
        )
        if hp
        else (),
        hot_regions=tuple(
            tuple(int(v) for v in row) for row in np.asarray(hp.regions)
        )
        if hp
        else (),
        hot_nslices=hp.nslices if hp else 0,
        hot_ncand=hp.ncand if hp else 1,
        w8=put(sr.w8),
        gcls=put(sr.gcls),
        li=put(sr.li),
        seg_blk=put(sr.seg_blk),
        mid=mid_to_device(sr.mid, device),
        vals_ss=put(sr.vals_ss),
        p3=put(sr.p3),
        emit=put(sr.emit),
        gemit=put(group_emit_encode(sr.emit)),
        yroute=route_to_device(sr.y_ra, device),
        ycall_rows=tuple(
            (int(a), int(b)) for a, b in np.asarray(sr.ycall_rows)
        ),
        regions=tuple(
            tuple(int(v) for v in row) for row in np.asarray(sr.regions)
        ),
        extra_src=put(sr.extra_src),
        extra_row=put(sr.extra_row),
        ymask=put(sr.ymask),
        shape=sr.shape,
        T=sr.T,
        S=sr.S,
        S_pad=sr.S_pad,
        nslices=sr.nslices,
        segw=sr.segw,
        n_segs=sr.n_segs,
        nslA=sr.nslA,
        zone_rows=sr.zone_rows,
        yslices=sr.yslices if sr.yslices else sr.nslices,
    )


def spmv_routed(sd: SellRoutedDevice, x: jax.Array) -> jax.Array:
    """y = A @ x via the compiled route (jit-compatible)."""
    nrows, ncols = sd.shape
    x = x.astype(jnp.float32)
    x2 = expand_x_table(x, ncols, sd.segw, sd.n_segs)

    g1 = expand(
        sd.w8, sd.gcls, sd.seg_blk, sd.li, x2, sd.segw
    )  # (8, T, 128)
    return route_post_expand(sd, g1, x=x)


def _hot_stream(sd: SellRoutedDevice, x: jax.Array) -> jax.Array:
    """Per-slice sums of the captured hot-column elements, in the
    y-stream layout (flat position of segment g is g) — one add into the
    routed y stream integrates the hybrid (cvr_tpu/formats/hot.py)."""
    from cvr_tpu.ops.pallas_route import (
        YB,
        reduce_hot_regular,
        reduce_hot_slices,
    )

    NH = sd.hxids.shape[0]
    xh = jnp.take(x, sd.hxids)
    xh = jnp.pad(xh, (0, 1024 - NH)).reshape(8, 128)
    parts = []
    for j, (r0g, nrg) in enumerate(sd.hot_ycall_rows):
        nsl = min(YB, sd.hot_nslices - j * YB)
        if nrg == 0:
            parts.append(jnp.zeros((8, nsl, 128), jnp.float32))
            continue
        regs = sorted(r for r in sd.hot_regions if r[0] == j)
        ir = []
        cur = r0g
        for _, rr0, rnr, _w, _s in regs:
            if rr0 > cur:
                ir.append((cur, rr0 - cur))
            cur = rr0 + rnr
        if cur < r0g + nrg:
            ir.append((cur, r0g + nrg - cur))
        ys_g = None
        for r0, nr in ir:
            piece = reduce_hot_slices(
                sd.hemit[r0 : r0 + nr],
                sd.hgemit[r0 // 8 : (r0 + nr) // 8],
                sd.hgcls[r0 // 8 : (r0 + nr) // 8],
                xh,
                sd.hvals[:, r0 : r0 + nr],
                sd.hidx[:, r0 : r0 + nr],
                nsl,
                sd.hot_ncand,
            )
            piece = jax.lax.optimization_barrier(piece)  # fusion crash
            ys_g = piece if ys_g is None else ys_g + piece
        if ys_g is None:
            ys_g = jnp.zeros((8, nsl, 128), jnp.float32)
        for _, r0, nr, w, srel in regs:
            piece = reduce_hot_regular(
                sd.hgcls[r0 // 8 : (r0 + nr) // 8],
                xh,
                sd.hvals[:, r0 : r0 + nr],
                sd.hidx[:, r0 : r0 + nr],
                w,
                sd.hot_ncand,
            )
            piece = jax.lax.optimization_barrier(piece)
            ys_g = jax.lax.dynamic_update_slice(ys_g, piece, (0, srel, 0))
        parts.append(ys_g)
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


def route_post_expand(
    sd: SellRoutedDevice, g1: jax.Array, x: jax.Array | None = None
) -> jax.Array:
    """The x-independent tail of the routed pipeline (middle route,
    reduce, y-route, extras) — shared by the single-chip path and the
    ring-overlapped distributed path, whose expand runs piece by piece
    (cvr_tpu/parallel/dist_routed.py).  ``x`` is only read by the
    hub-column hybrid's hot planes (hot_nslices > 0)."""
    # Route middle up to the mstream (M3 is fused into the reduce).
    Tk = sd.mid.Tk
    if sd.mid.kind == "rec":
        m = _mid_fused_call(Tk, "m1", use_interpret())(g1, sd.mid.m1)
        m = chunksel(m, sd.mid.csel, Tk)
        m3 = sd.mid.m3
    else:  # flat: the relayout alone; the within-slab perm IS "mid"
        m = stream_to_mstream(g1, Tk)
        m3 = sd.mid.mid
    # One reduce call per group of YB slices (the per-call y block must
    # fit VMEM whole); group plane-row ranges are CH-padded by the pack
    # and CH-aligned globally, so the in-kernel d-chunk math lines up.
    from cvr_tpu.ops.pallas_route import CH, YB

    parts = []
    for j, (r0g, nrg) in enumerate(sd.ycall_rows):
        nsl = min(YB, sd.nslices - j * YB)
        if nrg == 0:
            # a group of zero-width slices (all-empty rows): y is zero
            parts.append(jnp.zeros((8, nsl, 128), jnp.float32))
            continue
        regs = sorted(r for r in sd.regions if r[0] == j)
        # irregular subranges = the group's rows minus the regions
        ir = []
        cur = r0g
        for _, rr0, rnr, _w, _s in regs:
            if rr0 > cur:
                ir.append((cur, rr0 - cur))
            cur = rr0 + rnr
        if cur < r0g + nrg:
            ir.append((cur, r0g + nrg - cur))
        ys_g = None
        for r0, nr in ir:
            piece = reduce_m3_slices(
                sd.emit[r0 : r0 + nr],
                sd.gemit[r0 // 8 : (r0 + nr) // 8],
                m,
                m3,
                sd.vals_ss[:, r0 : r0 + nr],
                sd.p3[:, r0 : r0 + nr],
                nsl,
                ofs=r0 // CH,
                s3fast=(r0 + nr <= sd.zone_rows),
            )
            # XLA's TpuInstructionFusion crashes (HloReachabilityMap
            # out-of-range abort in AllowedFusionsWithCustomCallAsProducer)
            # when it tries to fuse the piece-combining add/update into
            # these custom-call producers on multi-group packs; the
            # barrier keeps the combine out of the fusion search.
            piece = jax.lax.optimization_barrier(piece)
            ys_g = piece if ys_g is None else ys_g + piece
        if ys_g is None:
            ys_g = jnp.zeros((8, nsl, 128), jnp.float32)
        for _, r0, nr, w, srel in regs:
            piece = reduce_m3_regular(
                m,
                m3,
                sd.vals_ss[:, r0 : r0 + nr],
                sd.p3[:, r0 : r0 + nr],
                w,
                ofs=r0 // CH,
                s3fast=(r0 + nr <= sd.zone_rows),
            )
            piece = jax.lax.optimization_barrier(piece)  # see above
            ys_g = jax.lax.dynamic_update_slice(ys_g, piece, (0, srel, 0))
        parts.append(ys_g)
    ys = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)

    # y-route: per-segment sums -> natural row order.  Zone-A slices
    # (128 lambda-segments each) fold their 8 sublane partials and
    # compact 8 slices per stream tile, so the y flat position of
    # segment g is g in both layouts; zone-B slices are stream tiles
    # directly (tile = slice, pos = lane).
    if sd.nslA:
        nA = sd.nslA
        ysA = ys[:, :nA, :].sum(axis=0)  # (nA, 128) segment sums
        sA = jnp.transpose(ysA.reshape(nA // 8, 8, 128), (1, 0, 2))
        ys = jnp.concatenate([sA, ys[:, nA:, :]], axis=1)
    yT = sd.yroute.Tp
    ysp = jnp.pad(ys, ((0, 0), (0, yT - (sd.yslices or sd.nslices)), (0, 0)))
    if sd.hot_nslices:
        # hub-column hybrid: hot per-slice sums share the y-stream flat
        # layout (position of segment g is g) — one padded add
        if x is None:
            raise ValueError("hot planes need x in route_post_expand")
        ys_hot = _hot_stream(sd, x)
        ysp = ysp + jnp.pad(
            ys_hot, ((0, 0), (0, yT - sd.hot_nslices), (0, 0))
        )
    y = apply_route_stream(sd.yroute, ysp)
    if sd.ymask.shape[0]:
        # empty rows whose segments sorted beyond the effective slices
        # route from arbitrary positions; zero them (fused elementwise)
        y = y * sd.ymask
    if sd.extra_src.shape[0]:
        # extra_src indexes the padded stream (8, yT, 128) flat.
        y = y.at[sd.extra_row].add(
            jnp.take(ysp.reshape(-1), sd.extra_src), mode="drop"
        )
    return y


def spmm_routed(sd: SellRoutedDevice, X: jax.Array) -> jax.Array:
    """Y = A @ X for dense X [ncols, K] via K vmapped routed pipelines.

    Scales linearly in K at the SpMV rate (the route planes are shared;
    vmap batches every Pallas grid).  An MXU one-hot formulation of the
    expand pass (gathering K-wide rows per window) is future work — the
    XLA segment-sum SpMM path crashes the v5e TPU worker at web scale,
    so this is also the safe path for large matrices.
    """
    return jax.vmap(lambda col: spmv_routed(sd, col), in_axes=1, out_axes=1)(
        X
    )


@functools.lru_cache(maxsize=None)
def _jitted_spmv_routed():
    return jax.jit(spmv_routed)


@functools.lru_cache(maxsize=None)
def _jitted_spmm_routed():
    return jax.jit(spmm_routed)
