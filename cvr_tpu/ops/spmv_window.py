"""y = A @ x on the SELL-W artifact: the window-gather (locality) SpMV.

Pipeline (all static control flow; cvr_tpu/formats/sell_window.py):

    x3 = segmented x table (n_segs, segw*8 + 8, 128)  [built per call]
    ys = window_reduce(...) per group of YB slices    [ONE fused kernel]
    y  = transpose-reshape of ys                      [rows are in natural
                                                       order: no y-route]
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from cvr_tpu.formats.sell_window import SellWindow
from cvr_tpu.ops.pallas_route import route_to_device
from cvr_tpu.ops.pallas_window import CH, YB, group_emit_encode, window_reduce


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["w10", "seg_blk", "li", "vals_ss", "emit", "gemit",
                 "yroute"],
    meta_fields=[
        "shape", "W", "D", "G", "S_pad", "nslices", "segw", "n_segs",
        "ycall_rows", "wrl",
    ],
)
@dataclasses.dataclass(frozen=True)
class SellWindowDevice:
    w10: jax.Array
    seg_blk: jax.Array
    li: jax.Array
    vals_ss: jax.Array
    emit: jax.Array
    gemit: jax.Array
    yroute: object  # RouteDevice for sigma-sorted packs, else None
    ycall_rows: tuple
    shape: tuple[int, int]
    W: int
    D: int
    G: int
    S_pad: int
    nslices: int
    segw: int
    n_segs: int
    wrl: int = 0


def to_device_window(sw: SellWindow, device=None) -> SellWindowDevice:
    put = functools.partial(jax.device_put, device=device)
    return SellWindowDevice(
        w10=put(sw.w10),
        seg_blk=put(sw.seg_blk),
        li=put(sw.li),
        vals_ss=put(sw.vals_ss),
        emit=put(sw.emit),
        gemit=put(group_emit_encode(sw.emit)),
        yroute=(
            None if sw.y_ra is None
            else route_to_device(sw.y_ra, device)
        ),
        ycall_rows=tuple(
            (int(a), int(b)) for a, b in np.asarray(sw.ycall_rows)
        ),
        shape=sw.shape,
        W=sw.W,
        D=sw.D,
        G=sw.G,
        S_pad=sw.S_pad,
        nslices=sw.nslices,
        segw=sw.segw,
        n_segs=sw.n_segs,
        wrl=sw.wrl or (sw.W // 128),
    )


def _x_table(sd: SellWindowDevice, x: jax.Array) -> jax.Array:
    """Segmented G-grid x table (n_segs, G * 8 * (segw + 2), 128).

    Each segment holds G aligned offset grids of (segw + 2) windows —
    grid g shifted by g*1024/G columns (g*8/G table rows) — so the pack
    can cap window alignment loss at 1024/G - 1 columns; the +2 windows
    of overlap let a 2048-wide window start at the segment's last
    window."""
    rows_per_seg = sd.segw * 8
    grid_rows = 8 * (sd.segw + 2)
    shift = 8 // sd.G
    H = rows_per_seg * sd.n_segs + grid_rows  # slack for last grid slice
    xp = jnp.pad(x, (0, H * 128 - sd.shape[1])).reshape(H, 128)
    idx = (
        jnp.arange(sd.n_segs)[:, None, None] * rows_per_seg
        + (jnp.arange(sd.G) * shift)[None, :, None]
        + jnp.arange(grid_rows)[None, None, :]
    )
    return jnp.take(xp, idx.reshape(sd.n_segs, sd.G * grid_rows), axis=0)


def spmv_window(sd: SellWindowDevice, x: jax.Array) -> jax.Array:
    """y = A @ x via the fused window kernel (jit-compatible)."""
    nrows, _ = sd.shape
    x3 = _x_table(sd, x.astype(jnp.float32))
    parts = []
    for j, (r0, nr) in enumerate(sd.ycall_rows):
        nsl = min(YB, sd.nslices - j * YB)
        if nr == 0:  # a group of zero-width slices: y is zero
            parts.append(jnp.zeros((8, nsl, 128), jnp.float32))
            continue
        parts.append(
            window_reduce(
                sd.emit[r0 : r0 + nr],
                sd.w10[r0 : r0 + nr],
                sd.seg_blk[r0 // CH : (r0 + nr) // CH],
                sd.gemit[r0 // 8 : (r0 + nr) // 8],
                sd.li[:, r0 : r0 + nr],
                sd.vals_ss[:, r0 : r0 + nr],
                x3,
                nsl,
                sd.W,
                sd.segw,
                sd.G,
                wrl=sd.wrl or None,
            )
        )
    ys = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    # ys[h, i, l] = slice-i lane h*128+l; lane p belongs to row
    # i*(1024/D) + p//D: fold the D duplicate lanes, then natural order
    # is a pure reshape.
    flat = jnp.transpose(ys, (1, 0, 2)).reshape(sd.nslices, 1024)
    if sd.D > 1:
        flat = flat.reshape(sd.nslices, 1024 // sd.D, sd.D).sum(axis=2)
    flat = flat.reshape(-1)
    if sd.yroute is not None:
        # sigma-sorted pack: rows are in block-local length order; the
        # compiled y-route restores natural order at vector rate
        from cvr_tpu.ops.pallas_route import apply_route_tpu

        return apply_route_tpu(sd.yroute, flat)
    return flat[:nrows]


def spmm_window(sd: SellWindowDevice, X: jax.Array) -> jax.Array:
    """Y = A @ X for dense X [ncols, K] via K vmapped window pipelines."""
    return jax.vmap(
        lambda col: spmv_window(sd, col), in_axes=1, out_axes=1
    )(X)


@functools.lru_cache(maxsize=None)
def _jitted_spmv_window():
    return jax.jit(spmv_window)


@functools.lru_cache(maxsize=None)
def _jitted_spmm_window():
    return jax.jit(spmm_window)
