"""SELL-W: the window-gather SpMV format — the locality fast path.

The routed path (cvr_tpu/formats/sell_routed.py) makes NO assumption
about the matrix's column structure and pays for it: every element takes
four windowed-gather passes (expand, two route stages, reduce) and the
pack compiles a Clos route.  But the reference's non-scale-free suite —
road networks, routing matrices, FEM/engineering matrices (paper Table 2;
the domains where the reference reports 9.6-21.1 GFLOPS) — has strong
column LOCALITY: with rows kept in natural order, the 1024 columns of one
packed plane row span a narrow range.  SELL-W exploits that:

  * rows stay in **natural order** (slice i = rows [i*1024/D,
    (i+1)*1024/D), each row on D consecutive lanes); no permutation, so
    y is a reshape + D-fold of the slice sums — no y-route, no scatter;
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
# (G * 8 * (segw + 2), 128) VMEM block (~2.1 MB at segw=128, G=4)
# selected per grid block: G offset grids (columns shifted by g*1024/G)
# of (segw + 2) windows each.  Window bases must be 1024-aligned
# (Mosaic: dynamic sublane slabs need provable 8-row alignment), which
# costs up to 1023 columns of alignment loss; the G=4 shifted grids cap
# the loss at 255, so a W-wide window covers any true spread <= W - 256.
SEGW_WIN = 128
NGRIDS = 4


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
    D: int  # lane duplication: each row occupies D lanes
    G: int  # aligned offset grids in the x table
    S: int  # plane rows before padding
    S_pad: int
    nslices: int
    segw: int
    n_segs: int
    wrl: int = 0  # gather-candidate count; 0/absent = W // 128
    y_ra: dict | None = None  # compiled y-route (sigma-sorted packs only)
    convert_time: float = 0.0
    convert_phases: dict = field(default_factory=dict)

    @property
    def padded_nnz(self) -> int:
        return self.S_pad * TILE

    def save(self, path: str | Path) -> None:
        """Persist the packed artifact (reference analogue: VHCC's binary
        matrix cache, MatrixDataConverter.cpp:14-89)."""
        extra = {}
        if self.y_ra is not None:
            ymid = self.y_ra["mid_planes"]
            extra = {
                "y_s1": self.y_ra["s1"], "y_s3": self.y_ra["s3"],
                "y_T": np.int64(self.y_ra["T"]),
                "y_Tp": np.int64(self.y_ra["Tp"]),
                "y_n": np.int64(self.y_ra["n"]),
                "ymid_kind": np.bytes_(ymid["kind"].encode()),
                "ymid_Tk": np.int64(ymid["Tk"]),
                **{
                    f"ymid_{k}": ymid[k]
                    for k in ("mid", "m1", "csel", "m3")
                    if k in ymid
                },
            }
        np.savez_compressed(
            path,
            vals_ss=self.vals_ss, li=self.li, w10=self.w10,
            seg_blk=self.seg_blk, emit=self.emit,
            ycall_rows=self.ycall_rows,
            shape=np.asarray(self.shape, dtype=np.int64),
            nnz=np.int64(self.nnz), W=np.int64(self.W),
            D=np.int64(self.D), G=np.int64(self.G),
            S=np.int64(self.S), S_pad=np.int64(self.S_pad),
            nslices=np.int64(self.nslices), segw=np.int64(self.segw),
            n_segs=np.int64(self.n_segs), wrl=np.int64(self.wrl),
            **extra,
        )

    @staticmethod
    def load(path: str | Path) -> "SellWindow":
        z = np.load(path)
        return SellWindow(
            vals_ss=z["vals_ss"], li=z["li"], w10=z["w10"],
            seg_blk=z["seg_blk"], emit=z["emit"],
            ycall_rows=z["ycall_rows"],
            shape=tuple(int(v) for v in z["shape"]),
            nnz=int(z["nnz"]), W=int(z["W"]), D=int(z["D"]),
            G=int(z["G"]), S=int(z["S"]),
            S_pad=int(z["S_pad"]), nslices=int(z["nslices"]),
            segw=int(z["segw"]), n_segs=int(z["n_segs"]),
            wrl=int(z["wrl"]) if "wrl" in z.files else 0,
            y_ra=(
                {
                    "s1": z["y_s1"], "s3": z["y_s3"],
                    "T": int(z["y_T"]), "Tp": int(z["y_Tp"]),
                    "n": int(z["y_n"]),
                    "mid_planes": {
                        "kind": bytes(z["ymid_kind"]).decode(),
                        "Tk": int(z["ymid_Tk"]),
                        **{
                            k: z[f"ymid_{k}"]
                            for k in ("mid", "m1", "csel", "m3")
                            if f"ymid_{k}" in z.files
                        },
                    },
                }
                if "y_s1" in z.files
                else None
            ),
        )


def _plan_for_d(nrows, row_lengths, D):
    """Slice layout for duplication factor D: a slice covers 1024/D rows,
    each row occupying D lanes with ceil(len/D) slots."""
    rps = TILE // D
    nslices = max(1, _round_up(max(nrows, 1), rps) // rps)
    L = np.zeros(nslices * rps, dtype=np.int64)
    L[:nrows] = -(-row_lengths // D)
    widths = L.reshape(nslices, rps).max(axis=1)
    slice_offsets = np.zeros(nslices + 1, dtype=np.int64)
    np.cumsum(widths, out=slice_offsets[1:])
    S = int(slice_offsets[-1])
    if S == 0:  # empty matrix: one zero plane row for shape sanity
        widths[0] = 1
        slice_offsets[1:] = 1
        S = 1
    return nslices, widths, slice_offsets, S


def _window_fill_numpy(nrows, C, D, rowptr, cols, vals, slice_offsets,
                       perm=None):
    """Pure-NumPy fallback for the native fill (tests / small matrices)."""
    S = int(slice_offsets[-1])
    SENT = np.iinfo(np.int32).max
    vals_plane = np.zeros((S, C), dtype=np.float32)
    cols_plane = np.full((S, C), SENT, dtype=np.int32)
    nnz = int(rowptr[-1])
    rps = C // D
    if nnz:
        lengths = np.diff(rowptr)
        # plane position of each row (identity or the sigma-sort perm)
        if perm is None:
            pos = np.arange(nrows, dtype=np.int64)
        else:
            pos = np.empty(nrows, dtype=np.int64)
            pos[np.asarray(perm, dtype=np.int64)] = np.arange(
                nrows, dtype=np.int64
            )
        r = np.repeat(np.arange(nrows, dtype=np.int64), lengths)
        pr = pos[r]
        j = np.arange(nnz, dtype=np.int64) - np.repeat(rowptr[:-1], lengths)
        L = np.repeat(np.maximum(-(-lengths // D), 1), lengths)
        slot = j % L
        lane = (pr % rps) * D + j // L
        dest = (slice_offsets[pr // rps] + slot) * C + lane
        vals_plane.reshape(-1)[dest] = vals
        cols_plane.reshape(-1)[dest] = cols
    masked = np.ma.masked_equal(cols_plane, SENT)
    wmin = masked.min(axis=1).filled(0).astype(np.int32)
    wmax = masked.max(axis=1).filled(0).astype(np.int32)
    pad = cols_plane == SENT
    cols_plane = np.where(pad, wmin[:, None], cols_plane)
    return vals_plane, cols_plane, pad, wmin, wmax


def _grid_fit(wmin, wmax, W, G):
    """Per plane row, the offset grid whose W-wide aligned window covers
    [wmin, wmax] with the SMALLEST max in-window offset (fewer gather
    candidates in the kernel — the WRL class).  Returns
    (all_fit, grid, wb)."""
    step = 1024 // G
    wmin64 = wmin.astype(np.int64)
    wmax64 = wmax.astype(np.int64)
    grid = np.full(wmin.shape[0], -1, dtype=np.int32)
    wb = np.zeros(wmin.shape[0], dtype=np.int32)
    best = np.full(wmin.shape[0], np.iinfo(np.int64).max)
    for g in range(G):
        wb_g = (wmin64 - g * step) >> 10
        base = wb_g * 1024 + g * step
        ok = (wb_g >= 0) & (wmax64 < base + W)
        limax = wmax64 - base  # max in-window offset under this grid
        take = ok & (limax < best)
        grid = np.where(take, g, grid)
        wb = np.where(take, wb_g.astype(np.int32), wb)
        best = np.where(take, limax, best)
    return bool(np.all(grid >= 0)), grid, wb


def sell_pack_window(
    csr: CSRMatrix,
    segw: int = SEGW_WIN,
    use_native: bool | None = None,
    force_dw: tuple[int, int] | None = None,
) -> SellWindow:
    """CSR -> SELL-W converter (O(nnz) streaming; a reported metric).

    Chooses the cheapest feasible (D, W) pair: duplication D shrinks the
    per-plane-row column spread ~D-fold at ~D/2 extra slots per row, and
    W = 1024 halves the kernel's gather count vs 2048.  Raises
    WindowInfeasible when nothing fits — use the routed path.

    force_dw pins (D, W) — the distributed packer uses it so every
    row shard shares one kernel geometry (cvr_tpu/parallel/dist_window).
    """
    from cvr_tpu.ops.pallas_window import CH, YB

    pt = PhaseTimer()
    nrows, ncols = csr.shape
    if use_native is None:
        use_native = csr.vals.dtype == np.float32
    native_ok = False
    if use_native:
        from cvr_tpu import _native

        native_ok = _native.available()

    with pt.phase("plan"):
        row_lengths = csr.row_lengths
        plans = {}  # D -> (nslices, widths, slice_offsets, S)
        # NOTE a sigma-sorted row permutation (length sort within blocks)
        # was tried for low-fill Poisson-degree inputs (road) and is
        # structurally infeasible here: a slice's 1024 rows must stay
        # NEIGHBORS for the per-slot column windows to hold, and sorting
        # across sigma*1024 rows explodes the spread past the window
        # reach.  Low-fill inputs route better through the length-sorted
        # SELL-R path (pack_auto handles the dispatch).
        perms = {D: None for D in (1, 2, 4)}
        for D in (1, 2, 4):
            plans[D] = _plan_for_d(nrows, row_lengths, D)
        # candidate order: estimated kernel cost = rows x (base + gathers)
        if force_dw is not None:
            cands = [tuple(force_dw)]
        else:
            cands = sorted(
                [(D, W) for D in (1, 2, 4) for W in (1024, 2048)],
                key=lambda dw: plans[dw[0]][3] * (40 + 4.5 * (dw[1] // 128)),
            )

    with pt.phase("minmax"):
        minmax = {}  # D -> (wmin, wmax)
        fills = {}  # D -> numpy fill tuple (fallback path only)

        def get_minmax(D):
            if D in minmax:
                return minmax[D]
            offs = plans[D][2]
            if native_ok:
                mm = _native.window_minmax_native(
                    nrows, TILE, D, csr.rowptr, csr.cols, offs,
                    perm=perms[D],
                )
            else:
                fills[D] = _window_fill_numpy(
                    nrows, TILE, D, csr.rowptr, csr.cols,
                    csr.vals.astype(np.float32), offs, perm=perms[D],
                )
                mm = (fills[D][3], fills[D][4])
            minmax[D] = mm
            return mm

        chosen = None
        for D, W in cands:
            wmin, wmax = get_minmax(D)
            ok, grid, wb_used = _grid_fit(wmin, wmax, W, NGRIDS)
            if ok:
                chosen = (D, W, grid, wb_used)
                break
        if chosen is None:
            wmin, wmax = minmax[1]
            true_spread = int(
                (wmax.astype(np.int64) - wmin.astype(np.int64)).max()
            )
            raise WindowInfeasible(
                f"max plane-row column spread {true_spread} exceeds the "
                "window reach even with lane duplication; no window "
                "locality — use the routed path"
            )
        D, W, grid, wb_used = chosen
        nslices, widths, slice_offsets, S = plans[D]
        step = 1024 // NGRIDS
        base_col = wb_used * 1024 + grid * step
        wmin, wmax = minmax[D]
        # gather-candidate class: the kernel only selects over slab rows
        # that can actually hold an offset (WRL <= W/128)
        li_max = int(
            (wmax.astype(np.int64) - base_col.astype(np.int64)).max()
        ) if S else 0
        wrl = min(W // 128, (max(li_max, 0) >> 7) + 1)

    with pt.phase("segments"):
        nwin = max(1, -(-ncols // 1024))
        segw = min(segw, _round_up(nwin, 8))
        n_segs = -(-nwin // segw)
        seg = (wb_used // segw).astype(np.int32)
        # window index into the segment's G-grid x table: grid g's
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
                nrows, TILE, D, csr.rowptr, csr.cols, csr.vals,
                slice_offsets, rmap, base_col, S_pad, perm=perms[D],
            )
        else:
            vals_plane, cols_plane, pad_mask, _, _ = fills[D]
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
        D=D,
        G=NGRIDS,
        S=S,
        S_pad=S_pad,
        nslices=nslices,
        segw=int(segw),
        n_segs=int(n_segs),
        wrl=int(wrl),
        convert_time=pt.total,
        convert_phases=dict(pt.phases),
    )
