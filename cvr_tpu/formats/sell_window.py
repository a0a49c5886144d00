"""SELL-W: the window-gather SpMV format — the locality fast path.

The routed path (cvr_tpu/formats/sell_routed.py) makes NO assumption
about the matrix's column structure and pays for it: every element takes
four windowed-gather passes (expand, two route stages, reduce) and the
pack compiles a Clos route.  But the reference's non-scale-free suite —
road networks, routing matrices, FEM/engineering matrices (paper Table 2;
the domains where the reference reports 9.6-21.1 GFLOPS) — has strong
column LOCALITY: with rows kept in natural order, the 1024 columns of one
packed plane row span a narrow range.  SELL-W exploits that:

  * rows stay in **natural order** (slice i = rows [1024i, 1024(i+1)));
    no permutation, so y is a pure reshape of the slice sums — no y-route,
    no scatter;
  * each plane row gets a 1024-aligned **column window** (1024 or 2048
    wide, chosen at pack time from the measured spreads); padding columns
    are rewritten to the row's min column so they never widen the window;
  * SpMV is ONE fused Pallas kernel (cvr_tpu/ops/pallas_window.py):
    per-plane-row window gather of x + FMA with the value plane +
    sequential per-slice accumulation — a single pass over the data
    at ~6 bytes/element of HBM traffic.

This is the TPU re-derivation of VHCC's 2D cache blocking
(vhcc_matrix.h:300-375, 512x8192 blocks chosen for KNL's L2) with the
block size chosen for the v5e's VMEM window-gather reach, and of CVR's
banded-matrix behavior where trackers advance in lockstep
(spmv.cpp:808-1000 degenerates to pure streaming on regular rows).

Pack cost is O(nnz) streaming (native C++/OpenMP hot pass) — no route
compile — so conversion amortizes in a handful of SpMV iterations,
matching the reference's headline amortization metric (~2.14 iterations,
paper Table 1).

Feasibility: every plane row's column spread must fit a 2048-wide
aligned window.  `sell_pack_window` raises `WindowInfeasible` otherwise
(power-law matrices); callers fall back to the routed path (see
`cvr_tpu.formats.pack_auto`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from cvr_tpu.formats.csr import CSRMatrix
from cvr_tpu.utils.timing import PhaseTimer

TILE = 1024
# 1024-column windows per x-table segment.  The kernel sees x through one
# (16 * (segw + 2), 128) VMEM block (~2.1 MB at 256) selected per grid
# block: TWO offset grids (columns shifted by 0 and by 512) of
# (segw + 2) windows each.  Window bases must be 1024-aligned (Mosaic:
# dynamic sublane slabs need provable 8-row alignment), which costs up to
# 1023 columns of alignment loss; the half-shifted second grid caps the
# loss at 511, so a W-wide window covers any true spread <= W - 512.
SEGW_WIN = 256


class WindowInfeasible(ValueError):
    """Column spread exceeds the window reach — use the routed path."""


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclass
class SellWindow:
    """Host-side SELL-W artifact (NumPy planes; see ops.spmv_window)."""

    vals_ss: np.ndarray  # (8, S_pad, 128) f32, stream layout
    li: np.ndarray  # (8, S_pad, 128) int16 in [0, W)
    w10: np.ndarray  # (S_pad,) int32 segment-relative window index
    seg_blk: np.ndarray  # (S_pad // CH,) int32 x-segment per grid block
    emit: np.ndarray  # (S_pad,) int32 group-local slice id on ends, -1 else
    ycall_rows: np.ndarray  # (n_ycalls, 2) int64 padded (start, rows)
    shape: tuple[int, int]
    nnz: int
    W: int  # window width: 1024 or 2048
    S: int  # plane rows before padding
    S_pad: int
    nslices: int
    segw: int
    n_segs: int
    convert_time: float = 0.0
    convert_phases: dict = field(default_factory=dict)

    @property
    def padded_nnz(self) -> int:
        return self.S_pad * TILE

    def save(self, path: str | Path) -> None:
        """Persist the packed artifact (reference analogue: VHCC's binary
        matrix cache, MatrixDataConverter.cpp:14-89)."""
        np.savez_compressed(
            path,
            vals_ss=self.vals_ss, li=self.li, w10=self.w10,
            seg_blk=self.seg_blk, emit=self.emit,
            ycall_rows=self.ycall_rows,
            shape=np.asarray(self.shape, dtype=np.int64),
            nnz=np.int64(self.nnz), W=np.int64(self.W),
            S=np.int64(self.S), S_pad=np.int64(self.S_pad),
            nslices=np.int64(self.nslices), segw=np.int64(self.segw),
            n_segs=np.int64(self.n_segs),
        )

    @staticmethod
    def load(path: str | Path) -> "SellWindow":
        z = np.load(path)
        return SellWindow(
            vals_ss=z["vals_ss"], li=z["li"], w10=z["w10"],
            seg_blk=z["seg_blk"], emit=z["emit"],
            ycall_rows=z["ycall_rows"],
            shape=tuple(int(v) for v in z["shape"]),
            nnz=int(z["nnz"]), W=int(z["W"]), S=int(z["S"]),
            S_pad=int(z["S_pad"]), nslices=int(z["nslices"]),
            segw=int(z["segw"]), n_segs=int(z["n_segs"]),
        )


def _window_fill_numpy(nrows, C, rowptr, cols, vals, slice_offsets):
    """Pure-NumPy fallback for the native fill (tests / small matrices)."""
    S = int(slice_offsets[-1])
    SENT = np.iinfo(np.int32).max
    vals_plane = np.zeros((S, C), dtype=np.float32)
    cols_plane = np.full((S, C), SENT, dtype=np.int32)
    nnz = int(rowptr[-1])
    if nnz:
        lengths = np.diff(rowptr)
        r = np.repeat(np.arange(nrows, dtype=np.int64), lengths)
        j = np.arange(nnz, dtype=np.int64) - np.repeat(rowptr[:-1], lengths)
        dest = (slice_offsets[r // C] + j) * C + (r % C)
        vals_plane.reshape(-1)[dest] = vals
        cols_plane.reshape(-1)[dest] = cols
    masked = np.ma.masked_equal(cols_plane, SENT)
    wmin = masked.min(axis=1).filled(0).astype(np.int32)
    wmax = masked.max(axis=1).filled(0).astype(np.int32)
    pad = cols_plane == SENT
    cols_plane = np.where(pad, wmin[:, None], cols_plane)
    return vals_plane, cols_plane, pad, wmin, wmax


def sell_pack_window(
    csr: CSRMatrix, segw: int = SEGW_WIN, use_native: bool | None = None
) -> SellWindow:
    """CSR -> SELL-W converter (O(nnz) streaming; a reported metric).

    Raises WindowInfeasible when some plane row's columns span more than
    2048 aligned columns — callers should fall back to the routed path.
    """
    from cvr_tpu.ops.pallas_window import CH, YB

    pt = PhaseTimer()
    nrows, ncols = csr.shape
    if use_native is None:
        use_native = csr.vals.dtype == np.float32

    with pt.phase("plan"):
        nslices = max(1, _round_up(max(nrows, 1), TILE) // TILE)
        lengths = np.zeros(nslices * TILE, dtype=np.int64)
        lengths[:nrows] = csr.row_lengths
        widths = lengths.reshape(nslices, TILE).max(axis=1)
        slice_offsets = np.zeros(nslices + 1, dtype=np.int64)
        np.cumsum(widths, out=slice_offsets[1:])
        S = int(slice_offsets[-1])
        if S == 0:  # empty matrix: keep one zero plane row for shape sanity
            widths[0] = 1
            slice_offsets[1:] = 1
            S = 1

    with pt.phase("minmax"):
        native_ok = False
        if use_native:
            from cvr_tpu import _native

            native_ok = _native.available()
        if native_ok:
            wmin, wmax = _native.window_minmax_native(
                nrows, TILE, csr.rowptr, csr.cols, slice_offsets
            )
        else:
            vals_plane, cols_plane, pad_mask, wmin, wmax = (
                _window_fill_numpy(
                    nrows, TILE, csr.rowptr, csr.cols,
                    csr.vals.astype(np.float32), slice_offsets,
                )
            )

    with pt.phase("windows"):
        # Two aligned offset grids (columns 0 and +512): pick per plane
        # row the one with the smaller alignment loss, capping the loss
        # at 511 columns, so W covers any true spread <= W - 512.
        wb0 = (wmin >> 10).astype(np.int32)
        wb1 = ((wmin - 512) >> 10).astype(np.int32)  # may be -1
        spread0 = wmax.astype(np.int64) - wb0.astype(np.int64) * 1024
        spread1 = wmax.astype(np.int64) - (
            wb1.astype(np.int64) * 1024 + 512
        )
        W = 0
        for cand in (1024, 2048):
            fits0 = spread0 < cand
            fits1 = (spread1 < cand) & (wb1 >= 0)
            if bool(np.all(fits0 | fits1)):
                W = cand
                break
        if W == 0:
            true_spread = int(
                (wmax.astype(np.int64) - wmin.astype(np.int64)).max()
            )
            raise WindowInfeasible(
                f"max plane-row column spread {true_spread} exceeds the "
                "window reach (1536); no window locality — use the "
                "routed path"
            )
        grid = np.where(fits0, 0, 1).astype(np.int32)
        wb_used = np.where(fits0, wb0, wb1).astype(np.int32)
        base_col = wb_used * 1024 + grid * 512

    with pt.phase("segments"):
        nwin = max(1, -(-ncols // 1024))
        segw = min(segw, _round_up(nwin, 8))
        n_segs = -(-nwin // segw)
        seg = (wb_used // segw).astype(np.int32)
        # window index into the segment's dual-grid x table: grid g's
        # 8*(segw+2) rows start at 8*g*(segw+2).
        w10 = (grid * (segw + 2) + wb_used - seg * segw).astype(np.int32)

        # Padded layout: maximal runs of plane rows sharing (reduce-call
        # group, x segment) are each padded to a CH multiple, so every
        # grid block sees one x segment and every reduce call starts on a
        # block boundary.
        slice_of = np.repeat(
            np.arange(nslices, dtype=np.int64), widths
        )[:S]
        grp = slice_of // YB
        n_ycalls = max(1, -(-nslices // YB))
        if S > 1:
            cut = np.flatnonzero(
                (grp[1:] != grp[:-1]) | (seg[1:] != seg[:-1])
            ) + 1
        else:
            cut = np.empty(0, dtype=np.int64)
        run_starts = np.concatenate(([0], cut))
        run_ends = np.concatenate((cut, [S]))
        run_lens = run_ends - run_starts
        padded_lens = _round_up(run_lens, CH)
        new_starts = np.zeros(run_starts.shape[0], dtype=np.int64)
        np.cumsum(padded_lens[:-1], out=new_starts[1:])
        S_pad = int(padded_lens.sum())
        run_of_row = np.repeat(
            np.arange(run_starts.shape[0], dtype=np.int64), run_lens
        )
        rmap = (
            np.arange(S, dtype=np.int64)
            - run_starts[run_of_row]
            + new_starts[run_of_row]
        )
        seg_pad = np.repeat(seg[run_starts], padded_lens)
        grp_pad = np.repeat(grp[run_starts], padded_lens)
        seg_blk = seg_pad[::CH].astype(np.int32)

        w10_pad = np.zeros(S_pad, dtype=np.int32)
        w10_pad[rmap] = w10

    with pt.phase("fill"):
        if native_ok:
            vals_pad, li_pad = _native.window_fill_ss_native(
                nrows, TILE, csr.rowptr, csr.cols, csr.vals,
                slice_offsets, rmap, base_col, S_pad,
            )
        else:
            li = np.where(
                pad_mask, 0, cols_plane - base_col[:, None]
            ).astype(np.int16)
            vals_pad = np.zeros((8, S_pad, 128), dtype=np.float32)
            li_pad = np.zeros((8, S_pad, 128), dtype=np.int16)
            vals_pad[:, rmap] = np.ascontiguousarray(
                vals_plane.reshape(S, 8, 128).transpose(1, 0, 2)
            )
            li_pad[:, rmap] = np.ascontiguousarray(
                li.reshape(S, 8, 128).transpose(1, 0, 2)
            )

    with pt.phase("emit"):
        emit = np.full(S_pad, -1, dtype=np.int32)
        nonempty = widths > 0
        sl = np.flatnonzero(nonempty).astype(np.int64)
        ends = slice_offsets[1:][nonempty] - 1  # last plane row per slice
        emit[rmap[ends]] = (sl % YB).astype(np.int32)
        # per reduce call: (first padded row, padded row count)
        ycall_rows = np.zeros((n_ycalls, 2), dtype=np.int64)
        counts = np.bincount(grp_pad.astype(np.int64), minlength=n_ycalls)
        starts = np.zeros(n_ycalls, dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        ycall_rows[:, 0] = starts
        ycall_rows[:, 1] = counts

    return SellWindow(
        vals_ss=vals_pad,
        li=li_pad,
        w10=w10_pad,
        seg_blk=seg_blk,
        emit=emit,
        ycall_rows=ycall_rows,
        shape=csr.shape,
        nnz=csr.nnz,
        W=W,
        S=S,
        S_pad=S_pad,
        nslices=nslices,
        segw=int(segw),
        n_segs=int(n_segs),
        convert_time=pt.total,
        convert_phases=dict(pt.phases),
    )
