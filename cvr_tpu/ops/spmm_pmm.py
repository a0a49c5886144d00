"""PMM SpMM: exact MXU permutation-matmul gather for hub-concentrated
matrices at small K (the BASELINE "8-64 RHS" range).

The round-4 record left power-law SpMM at K=8-64 on the vmapped routed
pipeline (~11 useful GFLOPS on web-class inputs): every route crossing
is a VPU gather/select that runs at VALUE rate, so the per-column cost
never amortizes over K (docs/DESIGN.md round 4; confirmed by the gbc64
control in experiments/probe_permmm.py).  The one unit that beats value
rate is the MXU: a within-128-lane gather of K-wide data is

    g (K, 128) = XTwin (K, 128) @ P (128, 128)

with P the one-hot of the index plane — and with X split into three
bf16 planes (24 = 3x8 mantissa bits, an EXACT f32 decomposition; the
0/1 P is bf16-exact) the gather is EXACT and measures 16 ns/tile at
K=32 (experiments/probe_pmm_precision.py), ~8x the VPU's effective
per-value rate.

The catch is fan-in: one P serves one aligned 128-column window, so a
128-element chunk costs one matmul per DISTINCT window it touches.
Measured on the bench fixtures (experiments/pmm_fanin.py): web-class
power-law matrices touch C~36-44 windows per chunk — PMM is REFUTED
there (the routed floor stands) — while hub-concentrated matrices
(fsm-class automata: failure links into a tiny column set + short
forward edges) measure C~2.  ``pmm_plan`` computes C at pack time and
the measured-constants gate (``pmm_projected_ms``) dispatches PMM only
where it wins, exactly like the round-4 hot-capture gate.

Stream layout: elements grouped by row-tile (row >> 7), column-sorted
within the group, padded per group to a 128 multiple ("chunks"); each
chunk emits one PAIR per distinct window.  The kernel runs one pair
per grid step:

  * gather:  acc (K, 128e) += sum_i xt3[i, :, win*128:+128] @ P_pair,
    P_pair[src, e] = (lc[e] == src), lc = 128 sentinel for element
    slots not in this pair (their P column is all-zero);
  * chunk end: acc *= vals (exact f32 on the VPU — vals never ride
    the MXU), then Y_rowtile (K, 128rows) += split3(acc) @ R,
    R[e, y] = (rl[e] == y) — the reduce rides the MXU too, exact by
    the same 3x-bf16 split;
  * Y row-tile blocks are revisited consecutively (pairs are sorted by
    row-tile), the standard Pallas accumulation pattern
    (ops/pallas_bsr.py).

Every element is touched by exactly one pair's P column and one
chunk's reduce, so products are single f32 multiplies and the sum
order per output row matches a per-row-tile tree — the 1e-6 row-scaled
contract of ops/spmv_ref.py holds (verified in tests/test_spmm_pmm.py).

Reference context: CVR's steal machinery exists for exactly this hub
structure (reference spmv.cpp:869-943); VHCC column-blocks the x-gather
(vhcc_matrix.h:300-375).  The 128-lane window is the MXU's natural
"cache line"; the fan-in gate is the TPU analogue of their
structure-follows-format decision.
"""

from __future__ import annotations

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cvr_tpu.ops.pallas_route import use_interpret

__all__ = [
    "PmmPlan",
    "PmmDevice",
    "pmm_plan",
    "pmm_projected_ms",
    "to_device_pmm",
    "spmm_pmm",
    "save_pmm",
    "load_pmm",
]

LC_SENTINEL = 128  # local-col value that matches no source lane

# Measured kernel constants (v5e, calibrated against the fsm-like chip
# sweep: 11.5/15.0/17.9 ms at K=32/64/128 with 259K pairs + 131K chunks
# — docs/DESIGN.md "Round 5").  ns per pair grid step by Kp; the probe
# floor is 16 ns at K=32, the full kernel pays DMA + step overhead.
NS_PAIR = {16: 30.0, 32: 30.0, 64: 40.0, 128: 48.0}
NS_CHUNK_EXTRA = {16: 18.0, 32: 18.0, 64: 24.0, 128: 29.0}
FIXED_US = 60.0
# Dispatch-gate rivals (measured slopes): the vmapped routed SpMM costs
# ~0.149 ns/(element*column) (web: 1.093 ms/col at 7.34M padded nnz,
# flat in K — DESIGN round 4), and the lane path ~15.6 ns/element
# K-independent up to 128 (take-bound, 103 ms at 6.6M nnz).
NS_ROUTED_PER_ELEM = 0.149
NS_LANE_PER_ELEM = 15.6


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass
class PmmPlan:
    """Host-side PMM plan: pair/chunk streams + planes (see module doc)."""

    win: np.ndarray  # (npairs,) int32 aligned column-window id
    rt: np.ndarray  # (npairs,) int32 output row-tile per pair
    ch: np.ndarray  # (npairs,) int32 chunk id per pair (nondecreasing)
    lc: np.ndarray  # (npairs, 128) int32 local col or LC_SENTINEL
    val: np.ndarray  # (nchunks, 128) f32 element values (pads 0)
    rl: np.ndarray  # (nchunks, 128) int32 local row (pads 127)
    shape: tuple
    nnz: int
    nchunks: int
    npairs: int
    ncb: int  # column blocks (windows)
    nrt: int  # row tiles = output blocks
    convert_time: float = 0.0

    @property
    def c_mean(self) -> float:
        """Mean distinct windows per chunk (the fan-in gate input)."""
        return self.npairs / max(self.nchunks, 1)


def pmm_plan(rows, cols, vals, shape) -> PmmPlan:
    """Build the PMM plan from COO arrays (vectorized host passes).

    Grouping is by row-tile with columns sorted inside each group, so
    chunks never span row-tiles and windows are nondecreasing within a
    chunk; pad slots repeat the group's last column (adding no pair)
    with the LC sentinel and val 0.  Empty row-tiles get one all-pad
    chunk so every output block is visited (and therefore zeroed).
    """
    t0 = time.perf_counter()
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.float32)
    nrows, ncols = int(shape[0]), int(shape[1])
    nnz = rows.shape[0]
    nrt = max(_round_up(nrows, 128) // 128, 1)
    ncb = max(_round_up(ncols, 128) // 128, 1)

    rt_e = rows >> 7
    order = np.lexsort((cols, rt_e))
    r = rows[order]
    c = cols[order]
    v = vals[order]

    counts = np.bincount(rt_e, minlength=nrt)
    pk = np.maximum((counts + 127) // 128, 1) * 128
    offs_p = np.concatenate([[0], np.cumsum(pk)])
    total_p = int(offs_p[-1])
    starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    within = np.arange(nnz, dtype=np.int64) - np.repeat(starts, counts)
    dstpos = np.repeat(offs_p[:-1], counts) + within

    # pad columns repeat the group's last real column (no extra pair)
    lastcol = np.zeros(nrt, dtype=np.int64)
    nz = counts > 0
    lastcol[nz] = c[starts[nz] + counts[nz] - 1]
    colp = np.repeat(lastcol, pk)
    colp[dstpos] = c
    valp = np.zeros(total_p, dtype=np.float32)
    valp[dstpos] = v
    rlp = np.full(total_p, 127, dtype=np.int32)
    rlp[dstpos] = (r & 127).astype(np.int32)
    lcp = np.full(total_p, LC_SENTINEL, dtype=np.int32)
    lcp[dstpos] = (c & 127).astype(np.int32)

    w_p = (colp >> 7).astype(np.int32)
    pos = np.arange(total_p, dtype=np.int64)
    runstart = np.empty(total_p, dtype=bool)
    runstart[0] = True
    runstart[1:] = w_p[1:] != w_p[:-1]
    runstart |= (pos & 127) == 0
    pair_of = np.cumsum(runstart) - 1
    npairs = int(pair_of[-1]) + 1
    nchunks = total_p // 128

    win = w_p[runstart]
    ch = (pos[runstart] >> 7).astype(np.int32)
    chunk_rt = np.repeat(
        np.arange(nrt, dtype=np.int32), (pk // 128).astype(np.int64)
    )
    rt = chunk_rt[ch]

    lc = np.full((npairs, 128), LC_SENTINEL, dtype=np.int32)
    lc[pair_of, (pos & 127)] = lcp

    return PmmPlan(
        win=win.astype(np.int32),
        rt=rt,
        ch=ch,
        lc=lc,
        val=valp.reshape(nchunks, 128),
        rl=rlp.reshape(nchunks, 128),
        shape=(nrows, ncols),
        nnz=nnz,
        nchunks=nchunks,
        npairs=npairs,
        ncb=ncb,
        nrt=nrt,
        convert_time=time.perf_counter() - t0,
    )


def _ns_pair(K: int) -> tuple[float, float]:
    Kp = min(_round_up(max(min(K, 128), 16), 16), 128)
    key = min((k for k in NS_PAIR if k >= Kp), default=128)
    return NS_PAIR[key], NS_CHUNK_EXTRA[key]


def pmm_projected_ms(plan_or_est, K: int) -> float:
    """Measured-constants time model for one PMM SpMM at width K.

    Accepts a PmmPlan or the (npairs, nchunks) estimate from
    ``pmm_estimate``.  Constants are A/B-calibrated on chip (round 5).
    """
    if isinstance(plan_or_est, PmmPlan):
        npairs, nchunks = plan_or_est.npairs, plan_or_est.nchunks
    else:
        npairs, nchunks = plan_or_est
    nk = -(-K // 128)
    ns_p, ns_c = _ns_pair(K)
    return nk * (npairs * ns_p + nchunks * ns_c) / 1e6 + FIXED_US / 1e3


def pmm_estimate(rows, cols, shape, sample: int = 256, seed: int = 0):
    """Cheap sampled (npairs, nchunks) estimate for the dispatch gate.

    Sorts only ``sample`` row-tile buckets (instead of the whole
    stream), measures their exact chunk/pair counts, and extrapolates
    by the sampled nnz fraction — a few ms on web-scale inputs vs the
    full plan's seconds, so auto dispatch can REJECT PMM cheaply
    (web-class C~40 makes rejection the common case).
    """
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    nrt = max(_round_up(int(shape[0]), 128) // 128, 1)
    rt_e = rows >> 7
    if nrt <= sample:
        picked = np.ones(rows.shape[0], dtype=bool)
        frac = 1.0
    else:
        rng = np.random.default_rng(seed)
        sel = np.zeros(nrt, dtype=bool)
        sel[rng.choice(nrt, size=sample, replace=False)] = True
        picked = sel[rt_e]
        frac = sample / nrt
    r = rt_e[picked]
    c = cols[picked]
    order = np.lexsort((c, r))
    r, c = r[order], c[order]
    counts = np.bincount(r)
    counts = counts[counts > 0]
    nchunks_s = int(np.sum((counts + 127) // 128))
    # windows per chunk, same walk as pmm_fanin
    w = c >> 7
    ends = np.cumsum(counts)
    pos = np.arange(r.shape[0], dtype=np.int64)
    off = pos - np.repeat(ends - counts, counts)
    bnd = np.empty(r.shape[0], dtype=bool)
    bnd[0] = True
    bnd[1:] = (w[1:] != w[:-1]) | (r[1:] != r[:-1])
    bnd |= (off & 127) == 0
    npairs_s = int(bnd.sum())
    return (
        max(int(npairs_s / frac), 1),
        max(int(nchunks_s / frac), 1),
    )


# Pairs per pallas call: the scalar-prefetch arrays (win/rt/ch/li,
# int32 x SEG each) live in the core's 1 MB SMEM, so one call cannot
# carry an unbounded pair stream.  Streams longer than SEG run as
# consecutive segments cut at chunk boundaries (a chunk has at most 128
# pairs, so a boundary always lands within any SEG window); the
# boundary row-tile's partial blocks are overlap-added on the host side
# of the kernel.  Tail pads extend the final chunk with the dedicated
# all-sentinel lc row (li points there), contributing exact zeros.
SEG = 32768
NRT_SEG_QUANT = 256  # output-range bucket (limits kernel recompiles)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["win", "rt", "ch", "li", "lc", "val", "rl"],
    meta_fields=[
        "shape", "nnz", "nchunks", "npairs", "ncb", "nrt", "segs",
        "nrt_seg",
    ],
)
@dataclasses.dataclass(frozen=True)
class PmmDevice:
    win: jax.Array  # (nseg, SEG) int32
    rt: jax.Array  # (nseg, SEG) int32 segment-local row tile
    ch: jax.Array  # (nseg, SEG) int32 global chunk id
    li: jax.Array  # (nseg, SEG) int32 global lc row (pads -> sentinel)
    lc: jax.Array  # (npairs8 + 8, 128) int32 (+ sentinel group)
    val: jax.Array
    rl: jax.Array
    shape: tuple
    nnz: int
    nchunks: int
    npairs: int
    ncb: int
    nrt: int
    segs: tuple  # ((pair_start, n_real, rt0, rt_span), ...) per segment
    nrt_seg: int  # shared output blocks per segment (bucketed max)


def _pad_rows8(a: np.ndarray, fill, extra: int = 0) -> np.ndarray:
    """Pad the leading axis to a multiple of 8 (+ extra rows)."""
    pad = _round_up(a.shape[0], 8) - a.shape[0] + extra
    if pad == 0:
        return a
    return np.concatenate(
        [a, np.full((pad,) + a.shape[1:], fill, dtype=a.dtype)]
    )


def to_device_pmm(plan: PmmPlan, device=None) -> PmmDevice:
    put = functools.partial(jax.device_put, device=device)
    npairs = plan.npairs
    sentinel_row = _round_up(npairs, 8)  # first all-sentinel lc row

    # cut the pair stream at chunk boundaries into <=SEG segments
    cuts = [0]
    while cuts[-1] + SEG < npairs:
        q = cuts[-1] + SEG
        while plan.ch[q] == plan.ch[q - 1]:
            q -= 1
        cuts.append(q)
    cuts.append(npairs)

    segs = []
    nrt_seg = 0
    win_s, rt_s, ch_s, li_s = [], [], [], []
    for a, b in zip(cuts[:-1], cuts[1:]):
        n = b - a
        rt0 = int(plan.rt[a])
        span = int(plan.rt[b - 1]) - rt0 + 1
        nrt_seg = max(nrt_seg, span)
        pad = SEG - n
        win_s.append(np.pad(plan.win[a:b], (0, pad), mode="edge"))
        rt_s.append(np.pad(plan.rt[a:b] - rt0, (0, pad), mode="edge"))
        ch_s.append(np.pad(plan.ch[a:b], (0, pad), mode="edge"))
        li_s.append(
            np.concatenate(
                [
                    np.arange(a, b, dtype=np.int32),
                    np.full(pad, sentinel_row, dtype=np.int32),
                ]
            )
        )
        segs.append((a, n, rt0, span))
    nrt_seg = min(_round_up(max(nrt_seg, 1), NRT_SEG_QUANT), plan.nrt)

    return PmmDevice(
        win=put(np.stack(win_s).astype(np.int32)),
        rt=put(np.stack(rt_s).astype(np.int32)),
        ch=put(np.stack(ch_s).astype(np.int32)),
        li=put(np.stack(li_s)),
        lc=put(_pad_rows8(plan.lc, LC_SENTINEL, extra=8)),
        val=put(_pad_rows8(plan.val, 0.0)),
        rl=put(_pad_rows8(plan.rl, 127)),
        shape=plan.shape,
        nnz=plan.nnz,
        nchunks=plan.nchunks,
        npairs=plan.npairs,
        ncb=plan.ncb,
        nrt=plan.nrt,
        segs=tuple(segs),
        nrt_seg=nrt_seg,
    )


def _split3(x):
    """Exact 3-way bf16 split of f32 (24 = 3x8 mantissa bits)."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _dot(a, p):
    return jax.lax.dot_general(
        a, p, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _pmm_kernel(
    seg: int,
    win_ref, rt_ref, ch_ref, li_ref,  # scalar prefetch (one segment)
    lc_ref, val_ref, rl_ref, xt3_ref, y_ref, acc_ref,
):
    # Mosaic needs (8, 128) minimum VMEM blocks, so plane rows arrive
    # in groups of 8 (indexed li//8 resp. ch//8) and the kernel selects
    # its row with a dynamic sublane index.  Tail pads carry the last
    # chunk's id with the sentinel lc row, so they add exact zeros and
    # the final pad performs the chunk's reduce.
    p = pl.program_id(0)
    prev = jnp.maximum(p - 1, 0)
    ch = ch_ref[p]
    first_pair = jnp.logical_or(p == 0, ch != ch_ref[prev])
    first_rt = jnp.logical_or(p == 0, rt_ref[p] != rt_ref[prev])
    last_pair = jnp.logical_or(
        p == seg - 1, ch != ch_ref[jnp.minimum(p + 1, seg - 1)]
    )

    @pl.when(first_rt)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    src = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    lc = lc_ref[li_ref[p] % 8]
    P = (src == lc[None, :]).astype(jnp.bfloat16)
    # Mosaic's (M,128)@(128,128) dot degrades ~15x past M=32 (measured,
    # experiments/probe_permmm.py m64 vs m32), so wide K runs as 32-row
    # sub-blocks of the same matmul.
    Kp = acc_ref.shape[0]
    MB = min(Kp, 32)

    def gat(lo_r, hi_r):
        return sum(
            _dot(xt3_ref[i, lo_r:hi_r], P) for i in range(3)
        )

    @pl.when(first_pair)
    def _():
        for b in range(0, Kp, MB):
            acc_ref[b : b + MB] = gat(b, b + MB)

    @pl.when(jnp.logical_not(first_pair))
    def _():
        for b in range(0, Kp, MB):
            acc_ref[b : b + MB] = acc_ref[b : b + MB] + gat(b, b + MB)

    @pl.when(last_pair)
    def _():
        dsty = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        R = (rl_ref[ch % 8][:, None] == dsty).astype(jnp.bfloat16)
        v = val_ref[ch % 8][None, :]
        for b in range(0, Kp, MB):
            a = acc_ref[b : b + MB] * v
            hi, mid, lo = _split3(a)
            y_ref[0, b : b + MB] += (
                _dot(hi, R) + _dot(mid, R) + _dot(lo, R)
            )


@functools.lru_cache(maxsize=None)
def _pmm_call(seg: int, nrt_seg: int, Kp: int, interpret: bool):
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # win, rt, ch, li
        grid=(seg,),
        in_specs=[
            pl.BlockSpec(
                (8, 128), lambda p, w, r, c, li: (li[p] // 8, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, 128), lambda p, w, r, c, li: (c[p] // 8, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, 128), lambda p, w, r, c, li: (c[p] // 8, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, Kp, 128), lambda p, w, r, c, li: (0, 0, w[p]),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, Kp, 128), lambda p, w, r, c, li: (r[p], 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((Kp, 128), jnp.float32)],
    )

    def fn(win, rt, ch, li, lc, val, rl, xt3):
        return pl.pallas_call(
            functools.partial(_pmm_kernel, seg),
            grid_spec=spec,
            out_shape=jax.ShapeDtypeStruct(
                (nrt_seg, Kp, 128), jnp.float32
            ),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )(win, rt, ch, li, lc, val, rl, xt3)

    return jax.jit(fn)


def spmm_pmm(dev: PmmDevice, X: jax.Array) -> jax.Array:
    """Y = A @ X for dense X [ncols, K] via the PMM kernel.

    K > 128 is processed in 128-lane chunks (same convention as the
    lane path); K is padded to a bf16-sublane multiple (16).
    """
    nrows, ncols = dev.shape
    K = X.shape[1]
    ncolsp = dev.ncb * 128
    interpret = use_interpret()
    outs = []
    for k0 in range(0, K, 128):
        kw = min(128, K - k0)
        Kp = _round_up(max(kw, 16), 16)
        Xc = X[:, k0 : k0 + kw].astype(jnp.float32)
        xt = jnp.pad(Xc, ((0, ncolsp - ncols), (0, Kp - kw))).T
        hi, mid, lo = _split3(xt)
        xt3 = jnp.stack([hi, mid, lo])
        call = _pmm_call(int(dev.win.shape[1]), dev.nrt_seg, Kp,
                         interpret)
        if len(dev.segs) == 1:
            y = call(
                dev.win[0], dev.rt[0], dev.ch[0], dev.li[0],
                dev.lc, dev.val, dev.rl, xt3,
            )[: dev.nrt]
        else:
            y = jnp.zeros((dev.nrt, Kp, 128), jnp.float32)
            for s, (_a, _n, rt0, span) in enumerate(dev.segs):
                ys = call(
                    dev.win[s], dev.rt[s], dev.ch[s], dev.li[s],
                    dev.lc, dev.val, dev.rl, xt3,
                )
                # boundary row-tiles may split across segments:
                # overlap-add the segment's real span
                y = y.at[rt0 : rt0 + span].add(ys[:span])
        Y = jnp.transpose(y, (0, 2, 1)).reshape(dev.nrt * 128, Kp)
        outs.append(Y[:nrows, :kw])
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


@functools.lru_cache(maxsize=None)
def _jitted_spmm_pmm():
    return jax.jit(spmm_pmm)


def save_pmm(plan: PmmPlan, path) -> None:
    """Persist the PMM plan (--save-packed amortization, like save_lane)."""
    np.savez_compressed(
        path,
        pmm_win=plan.win,
        pmm_rt=plan.rt,
        pmm_ch=plan.ch,
        pmm_lc=plan.lc,
        pmm_val=plan.val,
        pmm_rl=plan.rl,
        pmm_meta=np.asarray(
            [
                plan.shape[0], plan.shape[1], plan.nnz, plan.nchunks,
                plan.npairs, plan.ncb, plan.nrt,
            ],
            dtype=np.int64,
        ),
    )


def load_pmm(path) -> PmmPlan:
    z = np.load(path)
    m = z["pmm_meta"]
    return PmmPlan(
        win=z["pmm_win"],
        rt=z["pmm_rt"],
        ch=z["pmm_ch"],
        lc=z["pmm_lc"],
        val=z["pmm_val"],
        rl=z["pmm_rl"],
        shape=(int(m[0]), int(m[1])),
        nnz=int(m[2]),
        nchunks=int(m[3]),
        npairs=int(m[4]),
        ncb=int(m[5]),
        nrt=int(m[6]),
    )
