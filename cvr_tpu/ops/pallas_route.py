"""Pallas TPU kernels for the routed-gather SpMV pipeline.

Four kernels plus two XLA relayouts execute the v3 "routed gather" SpMV
(docs/DESIGN.md addendum):

  expand        x window-gather in column-sorted order (+ fused stage 1)
  tileperm_ss   within-tile permutation               (route stages 1/3)
  groupperm_ss  within-logical-row permutation         (route middle stage)
  reduce        FMA with the value planes + per-slice accumulation
                (+ fused stage 3), full y_sorted resident in VMEM

Every gather is built from the one primitive a v5e is fast at: a 128-lane
dynamic gather (``take_along_axis(axis=1)``, one VPU op) extended to a
1024-element window by 8 gathers + selects (measured 29 Gelem/s,
experiments/probe_gather.py).  The reference's hot loop leans on KNL's
hardware vector gather (`_mm512_i32logather_pd`, spmv.cpp:1227); the TPU
VPU has none, so the format supplies window locality ahead of time.

Layouts — the load-bearing design decision
------------------------------------------
Naive per-tile loops (fori + dynamic (8,128) slices) measured 6-100x below
the probe rates: Mosaic serializes small dynamically-addressed vector ops.
All streams therefore use the **sublane-split** layout

    stream  (8, T, 128):  logical element (tile a, pos p) at [p>>7, a, p&127]

so that candidate ``s`` of the 8-way window decomposition is the *static*
slab ``ref[s]`` for every tile at once, and each gather/select runs at full
block width (T_chunk, 128).  The middle stage uses

    middle  (K, 1024, 128):  element (tile a = k*128+l, color q) at [k,q,l]

so its K-way decomposition is likewise static slabs.  The stream<->middle
conversions are XLA relayouts (transposes) between the Pallas calls.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# Tiles per grid step for stream-layout kernels (block = (8, TC, 128)).
TC = int(os.environ.get("CVR_TC", "512"))
# Q rows per grid step in the middle kernel (block = (K, QC, 128));
# chosen per-K so in+idx+out blocks (double-buffered) fit VMEM.
def _qc_for(K: int) -> int:
    budget = 6 * 1024 * 1024  # bytes for single-buffered in+idx+out
    for qc in (128, 64, 32, 16, 8):
        if K * qc * 128 * (4 + 2 + 4) <= budget:
            return qc
    return 8
# Plane rows (tiles) per grid step in the reduce kernel.
CH = int(os.environ.get("CVR_CH", "128"))
# Slices per reduce call: the call's y block (8, YB, 128) lives whole in
# VMEM, so matrices with nslices > YB run several reduce calls.  512
# slices = 2 MB leaves room for the fused-M3 reduce's 4 MB mstream block.
YB = 512
# Tiles per grid step in the expand kernel (per-tile windows force a loop).
TB = int(os.environ.get("CVR_TB", "128"))


# Flag bit marking a two-emission group code (see group_emit_encode).
_EMIT2_BIT = 1 << 29


def _emit_store_slab(y_ref, acc, dest):
    """Aligned 8-slice slab rewrite with a lane-select (Mosaic rejects
    unaligned dynamic stores)."""
    d8 = pl.multiple_of(jax.lax.shift_right_logical(dest, 3) * 8, 8)
    cur = y_ref[:, pl.ds(d8, 8), :]
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (8, 8, 128), 1)
        == (dest - d8)[None, None, None]
    )
    y_ref[:, pl.ds(d8, 8), :] = jnp.where(sel, acc[:, None, :], cur)


def _emission_sweep(blk, emit_ref, gemit_ref, p_ref, y_ref, acc_ref):
    """Phase-2 slice accumulation over CH plane rows, dispatched per
    8-row group on the host-computed emission code (group_emit_encode):
    zero-emission groups take one (8,8,128) tree reduction, single-
    emission groups two masked reductions, only multi-emission groups
    (slices narrower than ~8 rows) walk row by row — measured to be the
    dominant cost of the reduce pass before this dispatch."""

    def rgroup(rg, _):
        r8 = pl.multiple_of(rg * 8, 8)
        code = gemit_ref[blk * (CH // 8) + rg]

        @pl.when(code == -2)
        def _():
            acc_ref[...] += jnp.sum(p_ref[:, pl.ds(r8, 8), :], axis=1)

        @pl.when((code >= 0) & (code < _EMIT2_BIT))
        def _():
            j = jax.lax.shift_right_logical(code, 16)
            dest = jnp.bitwise_and(code, 65535)
            p8 = p_ref[:, pl.ds(r8, 8), :]
            le = (
                jax.lax.broadcasted_iota(jnp.int32, (8, 8, 128), 1)
                <= j[None, None, None]
            )
            emitted = acc_ref[...] + jnp.sum(
                jnp.where(le, p8, 0.0), axis=1
            )
            rest = jnp.sum(jnp.where(le, 0.0, p8), axis=1)
            _emit_store_slab(y_ref, emitted, dest)
            acc_ref[...] = rest

        @pl.when(code >= _EMIT2_BIT)
        def _():
            # Two emissions at rows j1 < j2 with consecutive dests d,
            # d+1 (group_emit_encode): three masked reductions + two
            # slab writes instead of the eight-iteration row walk.
            j1 = jnp.bitwise_and(jax.lax.shift_right_logical(code, 26), 7)
            j2 = jnp.bitwise_and(jax.lax.shift_right_logical(code, 23), 7)
            d = jnp.bitwise_and(code, (1 << 23) - 1)
            p8 = p_ref[:, pl.ds(r8, 8), :]
            it = jax.lax.broadcasted_iota(jnp.int32, (8, 8, 128), 1)
            le1 = it <= j1[None, None, None]
            le2 = it <= j2[None, None, None]
            first = acc_ref[...] + jnp.sum(
                jnp.where(le1, p8, 0.0), axis=1
            )
            second = jnp.sum(
                jnp.where(le1, 0.0, jnp.where(le2, p8, 0.0)), axis=1
            )
            rest = jnp.sum(jnp.where(le2, 0.0, p8), axis=1)
            _emit_store_slab(y_ref, first, d)
            _emit_store_slab(y_ref, second, d + 1)
            acc_ref[...] = rest

        @pl.when(code == -1)
        def _():
            p8 = p_ref[:, pl.ds(r8, 8), :]
            for j in range(8):
                acc_ref[...] += p8[:, j, :]
                dest = emit_ref[blk * CH + rg * 8 + j]

                @pl.when(dest >= 0)
                def _():
                    _emit_store_slab(y_ref, acc_ref[...], dest)
                    acc_ref[...] = jnp.zeros_like(acc_ref)

        return 0

    jax.lax.fori_loop(0, CH // 8, rgroup, 0, unroll=False)


def group_emit_encode(emit):
    """Per-8-row-group emission code: -2 none, -1 three-or-more (the
    row-walk path), ``j << 16 | dest`` for a single emission at group
    row j, or — exactly two emissions at rows j1 < j2 with CONSECUTIVE
    dests d, d+1 (slices emit in plane-row order, so in-group dests are
    consecutive except across empty slices) —
    ``(1 << 29) | (j1 << 26) | (j2 << 23) | d``: two masked prefix
    reductions instead of the eight-iteration walk.  The round-5 width
    study (experiments/reduce_width_study.py) found ~44% of web's
    walk groups are exactly-two-emission.  CVR_EMIT2=0 keeps them on
    the walk (A/B control)."""
    e = np.asarray(emit).reshape(-1, 8)
    has = e >= 0
    cnt = has.sum(axis=1)
    j = np.argmax(has, axis=1)
    dest = e[np.arange(e.shape[0]), j]
    enc = np.where(
        cnt == 0, -2, np.where(cnt > 1, -1, (j << 16) | dest)
    )
    if os.environ.get("CVR_EMIT2", "1") != "0":
        j2 = 7 - np.argmax(has[:, ::-1], axis=1)
        dest2 = e[np.arange(e.shape[0]), j2]
        two = (cnt == 2) & (dest2 == dest + 1)
        enc = np.where(
            two, _EMIT2_BIT | (j << 26) | (j2 << 23) | dest, enc
        )
    return enc.astype(np.int32)


def use_interpret() -> bool:
    """Interpret mode off-TPU (CPU tests); compiled on tpu/axon backends."""
    try:
        dev = jax.devices()[0]
        return "tpu" not in getattr(dev, "device_kind", "").lower()
    except Exception:  # noqa: BLE001
        return True


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# tileperm_ss: out[i, a, l] = data[idx>>7, a, idx&127], idx = idx_[i, a, l]
# ---------------------------------------------------------------------------


def _tileperm_kernel(d_ref, i_ref, o_ref):
    for i in range(8):
        idx = i_ref[i].astype(jnp.int32)
        lo = jnp.bitwise_and(idx, 127)
        hi = jax.lax.shift_right_logical(idx, 7)
        acc = jnp.zeros(lo.shape, jnp.float32)
        for s in range(8):
            cand = jnp.take_along_axis(d_ref[s], lo, axis=1)
            acc = jnp.where(hi == s, cand, acc)
        o_ref[i] = acc


@functools.lru_cache(maxsize=None)
def _tileperm_call(T: int, interpret: bool):
    grid = T // TC if T % TC == 0 else -(-T // TC)

    def fn(data, idx):
        return pl.pallas_call(
            _tileperm_kernel,
            grid=(grid,),
            out_shape=jax.ShapeDtypeStruct((8, grid * TC, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(
                    (8, TC, 128),
                    lambda i: (0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (8, TC, 128),
                    lambda i: (0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (8, TC, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
        )(data, idx)

    return jax.jit(fn)


def tileperm_ss(data: jax.Array, idx: jax.Array) -> jax.Array:
    """Within-tile permutation in stream layout.

    data (8, T, 128) f32; idx (8, T, 128) int16 in [0, 1024).
    """
    T = data.shape[1]
    Tp = _round_up(T, TC)
    if Tp != T:
        data = jnp.pad(data, ((0, 0), (0, Tp - T), (0, 0)))
        idx = jnp.pad(idx, ((0, 0), (0, Tp - T), (0, 0)))
    out = _tileperm_call(Tp, use_interpret())(data, idx)
    return out[:, :T]


# ---------------------------------------------------------------------------
# groupperm_ss: out[k, q, l] = data[idx>>7, q, idx&127], idx = idx_[k, q, l]
# (within-logical-row permutation over T = K*128 tiles; the middle stage)
# ---------------------------------------------------------------------------


def _groupperm_kernel(K: int, d_ref, i_ref, o_ref):
    # Both loops static: dynamic-leading-axis reads measured ~9x slower
    # (Mosaic materializes the slab per access); K*K static gather+select
    # pairs at (QC,128) width run at VPU rate.
    for k in range(K):
        idx = i_ref[k].astype(jnp.int32)
        lo = jnp.bitwise_and(idx, 127)
        hi = jax.lax.shift_right_logical(idx, 7)
        acc = jnp.zeros(lo.shape, jnp.float32)
        for s in range(K):
            cand = jnp.take_along_axis(d_ref[s], lo, axis=1)
            acc = jnp.where(hi == s, cand, acc)
        o_ref[k] = acc


@functools.lru_cache(maxsize=None)
def _groupperm_call(K: int, interpret: bool):
    QC = _qc_for(K)
    grid = 1024 // QC

    def fn(data, idx):
        return pl.pallas_call(
            functools.partial(_groupperm_kernel, K),
            grid=(grid,),
            out_shape=jax.ShapeDtypeStruct((K, 1024, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(
                    (K, QC, 128),
                    lambda i: (0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (K, QC, 128),
                    lambda i: (0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (K, QC, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
        )(data, idx)

    return jax.jit(fn)


def groupperm_ss(data: jax.Array, idx: jax.Array) -> jax.Array:
    """data (K, 1024, 128) f32, idx (K, 1024, 128) int16 in [0, K*128)."""
    K = data.shape[0]
    return _groupperm_call(K, use_interpret())(data, idx)


# ---------------------------------------------------------------------------
# expand: per-tile x window gather (the only data-dependent-window kernel)
# ---------------------------------------------------------------------------


# Windows per x-table segment: the expand kernel sees x through one
# (SEGW*8 + 8, 128) VMEM block (4 MB; Mosaic double-buffers it) selected
# per grid block via a scalar-prefetched index_map; tiles are
# column-sorted, so segment switches are monotone and x streams through
# VMEM exactly once even when ncols*4 bytes far exceeds VMEM.  Segments
# carry an 8-row (1024-column) halo so a 16-row read at any in-segment
# sublane base stays in bounds.
SEGW = 1024


def _roll_sub(x, shift, interpret: bool):
    """Dynamic sublane roll: pltpu.roll compiled, jnp.roll in interpret
    mode (the Mosaic primitive has no interpret lowering for dynamic
    shifts)."""
    if interpret:
        return jnp.roll(x, shift, axis=0)
    return pltpu.roll(x, shift, axis=0)


def _expand_kernel(interpret: bool, w8_ref, gcls_ref, seg_ref, li_ref,
                   x2_ref, o_ref):
    # Mosaic requires dynamic sublane slab reads to be provably
    # 8-aligned; window bases have 128-column (sublane) granularity, so
    # each tile reads the ALIGNED 16-row slab containing its 8-row
    # window and rotates it down with one dynamically-shifted roll.
    # Tiles are class-sorted at pack time: each 8-tile group runs the
    # 1/2/4/8 gather-candidate branch its widest tile needs (power-law
    # column-sorted tiles average ~2.2 subwindows, docs/DESIGN.md r3).
    blk = pl.program_id(0)

    def tgroup(tg, _):
        t8 = pl.multiple_of(tg * 8, 8)
        li8 = li_ref[:, pl.ds(t8, 8), :].astype(jnp.int32)  # (8,8,128)
        code = gcls_ref[blk * (TB // 8) + tg]

        def do(ncand):
            outs = []
            for j in range(8):
                idx = li8[:, j, :]
                lo = jnp.bitwise_and(idx, 127)
                hi = jax.lax.shift_right_logical(idx, 7)
                b = w8_ref[blk * TB + tg * 8 + j]
                a8 = pl.multiple_of(
                    jax.lax.shift_right_logical(b, 3) * 8, 8
                )
                r16 = x2_ref[pl.ds(a8, 16), :]
                w = _roll_sub(
                    r16,
                    jnp.bitwise_and(16 - jnp.bitwise_and(b, 7), 15),
                    interpret,
                )
                acc = jnp.zeros((8, 128), jnp.float32)
                for s in range(ncand):
                    op = jnp.broadcast_to(w[s : s + 1, :], (8, 128))
                    cand = jnp.take_along_axis(op, lo, axis=1)
                    acc = jnp.where(hi == s, cand, acc)
                outs.append(acc)
            o_ref[:, pl.ds(t8, 8), :] = jnp.stack(outs, axis=1)

        for c in (1, 2, 4, 8):

            @pl.when(code == c)
            def _(c=c):
                do(c)

        return 0

    jax.lax.fori_loop(0, TB // 8, tgroup, 0, unroll=False)


@functools.lru_cache(maxsize=None)
def _expand_call(T: int, n_segs: int, segw: int, interpret: bool):
    grid = T // TB
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (8, TB, 128), lambda i, w8, gc, seg: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (segw * 8 + 8, 128),
                lambda i, w8, gc, seg: (seg[i], 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (8, TB, 128),
            lambda i, w8, gc, seg: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    def fn(w8, gcls, seg, li, x2):
        return pl.pallas_call(
            functools.partial(_expand_kernel, interpret),
            grid_spec=spec,
            out_shape=jax.ShapeDtypeStruct((8, T, 128), jnp.float32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=24 * 1024 * 1024
            ),
        )(w8, gcls, seg, li, x2)

    return jax.jit(fn)


def expand_x_table(
    x: jax.Array, ncols: int, segw: int, n_segs: int
) -> jax.Array:
    """The expand kernel's x table: per-segment row ranges with an 8-row
    halo (physical stride segw*8 + 8 sublane rows per segment)."""
    segw8 = segw * 8
    xp = jnp.pad(x, (0, (n_segs * segw8 + 8) * 128 - ncols)).reshape(
        -1, 128
    )
    if n_segs == 1:
        return xp
    return jnp.concatenate(
        [
            jax.lax.dynamic_slice_in_dim(xp, s * segw8, segw8 + 8)
            for s in range(n_segs)
        ]
    )


def expand(
    w8: jax.Array, gcls: jax.Array, seg: jax.Array, li: jax.Array,
    x2: jax.Array, segw: int,
) -> jax.Array:
    """Windowed gather producing the expanded x stream (+ fused stage 1).

    w8:  (T,) int32 segment-relative sublane bases in [0, segw*8)
         (window = columns [128*(seg*segw*8 + w8), +1024));
    gcls: (T // 8,) int32 gather class (1/2/4/8) per 8-tile group;
    seg: (T // TB,) int32 x-table segment per grid block (tile blocks
         never straddle segments — the pack pads them to TB);
    li:  (8, T, 128) int16 in [0, 1024) — in-window offsets (stage-1
         composed), stream layout;
    x2:  ((n_segs * (segw*8+8)), 128) f32 from expand_x_table.
    Returns g1 (8, T, 128).
    """
    T = w8.shape[0]
    if T % TB:
        raise ValueError("expand tiles must be padded to TB by the pack")
    n_segs = x2.shape[0] // (segw * 8 + 8)
    return _expand_call(T, n_segs, segw, use_interpret())(
        w8, gcls, seg, li, x2
    )


@functools.lru_cache(maxsize=None)
def _expand_ring_call(off: int, cnt: int, segw: int, interpret: bool):
    """One ring step of the overlapped expand (cvr_tpu/parallel/dist_routed).

    The ring-scheduled stream layout puts every step's tile blocks in a
    contiguous range [off, off + cnt): this call runs the UNCHANGED
    expand kernel over that range only, reading x through a small
    per-step table that covers just the ring pieces received so far.
    w8/gcls/seg arrive pre-sliced to the step (they are cheap scalar
    prefetch arrays); li stays whole — its index map carries the offset
    so no copy of the big plane is made.
    """
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(cnt,),
        in_specs=[
            pl.BlockSpec(
                (8, TB, 128), lambda i, w8, gc, seg: (0, off + i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (segw * 8 + 8, 128),
                lambda i, w8, gc, seg: (seg[i], 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (8, TB, 128),
            lambda i, w8, gc, seg: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    def fn(w8_s, gcls_s, seg_s, li, xtab):
        return pl.pallas_call(
            functools.partial(_expand_kernel, interpret),
            grid_spec=spec,
            out_shape=jax.ShapeDtypeStruct((8, cnt * TB, 128), jnp.float32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=24 * 1024 * 1024
            ),
        )(w8_s, gcls_s, seg_s, li, xtab)

    return jax.jit(fn)


def expand_ring_step(
    off: int, cnt: int, w8_s, gcls_s, seg_s, li, xtab, segw: int
):
    """Expand stream blocks [off, off+cnt) against a per-step x table."""
    return _expand_ring_call(off, cnt, segw, use_interpret())(
        w8_s, gcls_s, seg_s, li, xtab
    )


# ---------------------------------------------------------------------------
# reduce: y_sorted[slice] = sum over its plane rows of vals * gx(+stage 3)
# ---------------------------------------------------------------------------


def _reduce_kernel(emit_ref, gemit_ref, v_ref, g_ref, p3_ref, y_ref,
                   acc_ref, p_ref):
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        # zero-width slices (all-empty rows) never emit: pre-zero y.
        y_ref[...] = jnp.zeros_like(y_ref)

    # Stage-3 gather + FMA at full block width, staged through scratch.
    for i in range(8):
        idx = p3_ref[i].astype(jnp.int32)
        lo = jnp.bitwise_and(idx, 127)
        hi = jax.lax.shift_right_logical(idx, 7)
        acc = jnp.zeros(lo.shape, jnp.float32)
        for s in range(8):
            cand = jnp.take_along_axis(g_ref[s], lo, axis=1)
            acc = jnp.where(hi == s, cand, acc)
        p_ref[i] = acc * v_ref[i]

    _emission_sweep(blk, emit_ref, gemit_ref, p_ref, y_ref, acc_ref)


@functools.lru_cache(maxsize=None)
def _reduce_call(S: int, nslices: int, interpret: bool):
    # nslices here is already padded to a multiple of 8 (aligned emission
    # slabs need y rows [d8, d8+8) to exist).
    grid = S // CH
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # emit, gemit
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (8, CH, 128), lambda i, e, ge: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, CH, 128), lambda i, e, ge: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, CH, 128), lambda i, e, ge: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (8, nslices, 128), lambda i, e, ge: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((8, CH, 128), jnp.float32),
        ],
    )

    def fn(emit, gemit, vals, gx, p3):
        return pl.pallas_call(
            _reduce_kernel,
            grid_spec=spec,
            out_shape=jax.ShapeDtypeStruct((8, nslices, 128), jnp.float32),
            interpret=interpret,
        )(emit, gemit, vals, gx, p3)

    return jax.jit(fn)


def reduce_slices(
    emit: jax.Array,
    gemit: jax.Array,
    vals: jax.Array,
    gx: jax.Array,
    p3: jax.Array,
    nslices: int,
) -> jax.Array:
    """Per-slice tile sums with fused stage-3 gather.

    emit: (S_pad,) int32 — slice id if that plane row ends its slice,
          else -1 (padding rows -1; S_pad must be a multiple of CH);
    gemit: (S_pad // 8,) int32 from group_emit_encode;
    vals/gx: (8, S_pad, 128) f32 stream layout; p3: int16 same shape.
    Returns y_sorted (8, nslices, 128) — slice sigma's 1024 lane sums at
    [:, sigma, :].
    """
    S_pad = emit.shape[0]
    if S_pad % CH:
        raise ValueError("emit length must be padded to a multiple of CH")
    nsp = _round_up(max(nslices, 8), 8)
    out = _reduce_call(S_pad, nsp, use_interpret())(
        emit, gemit, vals, gx, p3
    )
    return out[:, :nslices]


# ---------------------------------------------------------------------------
# reduce_m3: the reduce pass consuming the MSTREAM directly — the route's
# M3 stage (within-slab gather) and the mstream->stream relayout run
# in-kernel, saving a 58 MB HBM round trip per SpMV.  Each grid step
# covers 128 plane rows = one f-row of every q-slab of one d-chunk, so
# the 4 MB mstream chunk block is reused for 8 consecutive steps.
# Requires CH == 128.
# ---------------------------------------------------------------------------


def _reduce_m3_kernel(
    ofs: int, s3fast: bool, emit_ref, gemit_ref, m_ref, m3_ref, v_ref,
    p3_ref, y_ref, acc_ref, p_ref
):
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        y_ref[...] = jnp.zeros_like(y_ref)

    # M3: within-slab gather for this step's f-row, all 1024 q-slabs.
    idx3 = m3_ref[0].astype(jnp.int32)  # (1024, 128) [q, fL]
    lo3 = jnp.bitwise_and(idx3, 127)
    hi3 = jax.lax.shift_right_logical(idx3, 7)
    g = jnp.zeros((1024, 128), jnp.float32)
    for s in range(8):
        cand = jnp.take_along_axis(m_ref[s], lo3, axis=1)
        g = jnp.where(hi3 == s, cand, g)
    # relayout to stream tiles: t2[qh, fL, ql] = g[qh*128+ql, fL]
    t2 = jnp.transpose(g.reshape(8, 128, 128), (0, 2, 1))

    # Stage-3 (p3) gather + FMA at full width, staged through scratch.
    # Zone-A rows (s3fast): the pack made every color's top-3 bits
    # equal its slot sublane, so sublane i gathers from t2[i] alone —
    # one lane-gather, no hi selects (sell_routed._zone_plan).
    for i in range(8):
        idx = p3_ref[i].astype(jnp.int32)
        lo = jnp.bitwise_and(idx, 127)
        if s3fast:
            acc = jnp.take_along_axis(t2[i], lo, axis=1)
        else:
            hi = jax.lax.shift_right_logical(idx, 7)
            acc = jnp.zeros(lo.shape, jnp.float32)
            for s in range(8):
                cand = jnp.take_along_axis(t2[s], lo, axis=1)
                acc = jnp.where(hi == s, cand, acc)
        p_ref[i] = acc * v_ref[i]

    _emission_sweep(blk, emit_ref, gemit_ref, p_ref, y_ref, acc_ref)


@functools.lru_cache(maxsize=None)
def _reduce_m3_call(
    S_rows: int, nslices: int, ofs: int, Tslabs: int, s3fast: bool,
    interpret: bool,
):
    if CH != 128:
        raise ValueError("reduce_m3 requires CH == 128")
    grid = S_rows // CH
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # emit, gemit
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (8, 1024, 128),
                lambda i, e, ge: (0, (ofs + i) // 8, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1024, 128),
                lambda i, e, ge: ((ofs + i) % 8, (ofs + i) // 8, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, CH, 128), lambda i, e, ge: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, CH, 128), lambda i, e, ge: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (8, nslices, 128), lambda i, e, ge: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((8, CH, 128), jnp.float32),
        ],
    )

    def fn(emit, gemit, m, m3, vals, p3):
        return pl.pallas_call(
            functools.partial(_reduce_m3_kernel, ofs, s3fast),
            grid_spec=spec,
            out_shape=jax.ShapeDtypeStruct((8, nslices, 128), jnp.float32),
            interpret=interpret,
            # the block set sits exactly at the 16 MB default scoped-vmem
            # limit (observed +4 KiB over on some libtpu builds); give
            # Mosaic headroom — v5e has far more physical VMEM
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=24 * 1024 * 1024
            ),
        )(emit, gemit, m, m3, vals, p3)

    return jax.jit(fn)


# ---------------------------------------------------------------------------
# reduce_m3_regular: the reduce pass over a REGULAR-WIDTH slice region.
# Length-sorted slices give long runs of equal width w; for w in
# {1, 2, 4, 8} a run needs no emission sweep at all — each 128-row grid
# step covers exactly 128/w whole slices, so the per-slice sums are one
# static reshape-sum and the y rows come out dense and in order.  This
# removes the reduce pass's sequential per-row branch walk exactly where
# it is most expensive (narrow slices: road / wiki / social planes).
# ---------------------------------------------------------------------------


def _reduce_m3_regular_kernel(ofs: int, w: int, s3fast: bool, m_ref,
                              m3_ref, v_ref, p3_ref, o_ref):
    idx3 = m3_ref[0].astype(jnp.int32)
    lo3 = jnp.bitwise_and(idx3, 127)
    hi3 = jax.lax.shift_right_logical(idx3, 7)
    g = jnp.zeros((1024, 128), jnp.float32)
    for s in range(8):
        cand = jnp.take_along_axis(m_ref[s], lo3, axis=1)
        g = jnp.where(hi3 == s, cand, g)
    t2 = jnp.transpose(g.reshape(8, 128, 128), (0, 2, 1))

    rows = []
    for i in range(8):
        idx = p3_ref[i].astype(jnp.int32)
        lo = jnp.bitwise_and(idx, 127)
        if s3fast:
            acc = jnp.take_along_axis(t2[i], lo, axis=1)
        else:
            hi = jax.lax.shift_right_logical(idx, 7)
            acc = jnp.zeros(lo.shape, jnp.float32)
            for s in range(8):
                cand = jnp.take_along_axis(t2[s], lo, axis=1)
                acc = jnp.where(hi == s, cand, acc)
        rows.append(acc * v_ref[i])
    p = jnp.stack(rows, axis=0)  # (8, CH, 128)
    o_ref[...] = p.reshape(8, CH // w, w, 128).sum(axis=2)


@functools.lru_cache(maxsize=None)
def _reduce_m3_regular_call(S_rows: int, w: int, ofs: int, s3fast: bool,
                            interpret: bool):
    if CH != 128:
        raise ValueError("reduce_m3_regular requires CH == 128")
    if 128 % w or w > 16:
        # w = 16 keeps the out block at (8, 8, 128) — still 8 sublanes
        raise ValueError("regular width must be in {1, 2, 4, 8, 16}")
    grid = S_rows // CH
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (8, 1024, 128),
                lambda i: (0, (ofs + i) // 8, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1024, 128),
                lambda i: ((ofs + i) % 8, (ofs + i) // 8, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, CH, 128), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, CH, 128), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (8, CH // w, 128), lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    def fn(m, m3, vals, p3):
        return pl.pallas_call(
            functools.partial(_reduce_m3_regular_kernel, ofs, w, s3fast),
            grid_spec=spec,
            out_shape=jax.ShapeDtypeStruct(
                (8, S_rows // w, 128), jnp.float32
            ),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=24 * 1024 * 1024
            ),
        )(m, m3, vals, p3)

    return jax.jit(fn)


def reduce_m3_regular(
    m: jax.Array,
    m3: jax.Array,
    vals: jax.Array,
    p3: jax.Array,
    w: int,
    ofs: int,
    s3fast: bool = False,
) -> jax.Array:
    """Per-slice sums over a width-w regular region (no emission sweep).

    vals/p3: the region's plane-row slices (8, nr, 128), nr a multiple
    of CH; m/m3: the FULL mstream and M3 planes; w in {1, 2, 4, 8, 16}
    must divide CH and every slice in the region has exactly w rows.
    s3fast: the rows are zone-A (aligned stage-3, one gather/sublane).
    Returns (8, nr // w, 128) slice sums in region slice order.
    """
    S_rows = vals.shape[1]
    if S_rows % CH:
        raise ValueError("region rows must be a multiple of CH")
    return _reduce_m3_regular_call(S_rows, w, ofs, s3fast, use_interpret())(
        m, m3, vals, p3
    )


def reduce_m3_slices(
    emit: jax.Array,
    gemit: jax.Array,
    m: jax.Array,
    m3: jax.Array,
    vals: jax.Array,
    p3: jax.Array,
    nslices: int,
    ofs: int,
    s3fast: bool = False,
) -> jax.Array:
    """Fused M3 + relayout + stage-3 + per-slice reduce.

    emit/vals/p3 are this call's plane-row slices ((8, nr, 128) etc.);
    m/m3 are the FULL mstream and M3 planes (8, Tk*1024, 128); ofs is the
    call's first plane row divided by CH (so in-kernel chunk math lines
    up with global d-chunks).  s3fast: all rows are zone-A (aligned
    stage-3, one lane-gather per sublane — see sell_routed._zone_plan).
    """
    S_rows = emit.shape[0]
    if S_rows % CH:
        raise ValueError("emit length must be a multiple of CH")
    nsp = _round_up(max(nslices, 8), 8)
    out = _reduce_m3_call(
        S_rows, nsp, ofs, m.shape[1], s3fast, use_interpret()
    )(emit, gemit, m, m3, vals, p3)
    return out[:, :nslices]


# ---------------------------------------------------------------------------
# reduce_hot: the hot-column hybrid's reduce (cvr_tpu/formats/hot.py).
# gx comes from ONE static VMEM-resident (8, 128) hot table instead of
# the routed mstream: per 8-plane-row group, a 1/2/4/8-candidate window
# gather (the expand kernel's class dispatch, minus the dynamic window
# base — the hot table IS the window).  Everything downstream (emission
# sweep, regular regions, y-stream layout) is shared with the routed
# reduce, so the hot slice sums add straight into the y stream.
# ---------------------------------------------------------------------------


def _hot_gather_groups(blk, gcls_ref, xh_ref, v_ref, hi_ref, p_ref,
                       ncand_max: int):
    """Stage hot products into p_ref (8, CH, 128), class-dispatched."""
    if ncand_max == 1:
        # single 128-column window: flat full-width gather, no classes
        for i in range(8):
            lo = jnp.bitwise_and(hi_ref[i].astype(jnp.int32), 127)
            op = jnp.broadcast_to(xh_ref[0:1, :], lo.shape)
            p_ref[i] = jnp.take_along_axis(op, lo, axis=1) * v_ref[i]
        return

    def tgroup(tg, _):
        t8 = pl.multiple_of(tg * 8, 8)
        idx8 = hi_ref[:, pl.ds(t8, 8), :].astype(jnp.int32)  # (8,8,128)
        v8 = v_ref[:, pl.ds(t8, 8), :]
        code = gcls_ref[blk * (CH // 8) + tg]

        def do(nc):
            outs = []
            for j in range(8):
                idx = idx8[:, j, :]
                lo = jnp.bitwise_and(idx, 127)
                hi = jax.lax.shift_right_logical(idx, 7)
                acc = jnp.zeros((8, 128), jnp.float32)
                for s in range(nc):
                    op = jnp.broadcast_to(xh_ref[s : s + 1, :], (8, 128))
                    cand = jnp.take_along_axis(op, lo, axis=1)
                    acc = cand if nc == 1 else jnp.where(hi == s, cand, acc)
                outs.append(acc)
            p_ref[:, pl.ds(t8, 8), :] = jnp.stack(outs, axis=1) * v8

        for c in (1, 2, 4, 8):
            if c <= ncand_max:

                @pl.when(code == c)
                def _(c=c):
                    do(c)

        return 0

    jax.lax.fori_loop(0, CH // 8, tgroup, 0, unroll=False)


def _reduce_hot_kernel(ncand_max: int, emit_ref, gemit_ref, gcls_ref,
                       xh_ref, v_ref, hi_ref, y_ref, acc_ref, p_ref):
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        y_ref[...] = jnp.zeros_like(y_ref)

    _hot_gather_groups(blk, gcls_ref, xh_ref, v_ref, hi_ref, p_ref,
                       ncand_max)
    _emission_sweep(blk, emit_ref, gemit_ref, p_ref, y_ref, acc_ref)


@functools.lru_cache(maxsize=None)
def _reduce_hot_call(S: int, nslices: int, ncand_max: int, interpret: bool):
    grid = S // CH
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # emit, gemit, gcls
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (8, 128), lambda i, e, ge, gc: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, CH, 128), lambda i, e, ge, gc: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, CH, 128), lambda i, e, ge, gc: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (8, nslices, 128), lambda i, e, ge, gc: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((8, CH, 128), jnp.float32),
        ],
    )

    def fn(emit, gemit, gcls, xh, vals, hidx):
        return pl.pallas_call(
            functools.partial(_reduce_hot_kernel, ncand_max),
            grid_spec=spec,
            out_shape=jax.ShapeDtypeStruct((8, nslices, 128), jnp.float32),
            interpret=interpret,
        )(emit, gemit, gcls, xh, vals, hidx)

    return jax.jit(fn)


def reduce_hot_slices(
    emit: jax.Array,
    gemit: jax.Array,
    gcls: jax.Array,
    xh: jax.Array,
    vals: jax.Array,
    hidx: jax.Array,
    nslices: int,
    ncand_max: int,
) -> jax.Array:
    """Per-slice sums of hot products (see cvr_tpu/formats/hot.py).

    xh (8, 128) f32 hot table; vals/hidx (8, S_pad, 128) stream layout;
    emit/gemit as in reduce_slices; gcls (S_pad // 8,) int32 classes.
    """
    S_pad = emit.shape[0]
    if S_pad % CH:
        raise ValueError("emit length must be padded to a multiple of CH")
    nsp = _round_up(max(nslices, 8), 8)
    out = _reduce_hot_call(S_pad, nsp, ncand_max, use_interpret())(
        emit, gemit, gcls, xh, vals, hidx
    )
    return out[:, :nslices]


def _reduce_hot_regular_kernel(w: int, ncand_max: int, gcls_ref, xh_ref,
                               v_ref, hi_ref, o_ref, p_ref):
    blk = pl.program_id(0)
    _hot_gather_groups(blk, gcls_ref, xh_ref, v_ref, hi_ref, p_ref,
                       ncand_max)
    o_ref[...] = p_ref[...].reshape(8, CH // w, w, 128).sum(axis=2)


@functools.lru_cache(maxsize=None)
def _reduce_hot_regular_call(S: int, w: int, ncand_max: int,
                             interpret: bool):
    grid = S // CH
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # gcls
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (8, 128), lambda i, gc: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (8, CH, 128), lambda i, gc: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, CH, 128), lambda i, gc: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (8, CH // w, 128), lambda i, gc: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((8, CH, 128), jnp.float32)],
    )

    def fn(gcls, xh, vals, hidx):
        return pl.pallas_call(
            functools.partial(_reduce_hot_regular_kernel, w, ncand_max),
            grid_spec=spec,
            out_shape=jax.ShapeDtypeStruct((8, S // w, 128), jnp.float32),
            interpret=interpret,
        )(gcls, xh, vals, hidx)

    return jax.jit(fn)


def reduce_hot_regular(
    gcls: jax.Array,
    xh: jax.Array,
    vals: jax.Array,
    hidx: jax.Array,
    w: int,
    ncand_max: int,
) -> jax.Array:
    """Hot per-slice sums over a regular width-w region (no emission
    sweep).  w <= 16 so the (8, CH//w, 128) out block keeps a sublane
    dimension divisible by 8 (Mosaic block alignment)."""
    S_rows = vals.shape[1]
    if S_rows % CH or CH % w or w > 16:
        raise ValueError("region rows must align to CH, w | CH, w <= 16")
    return _reduce_hot_regular_call(S_rows, w, ncand_max, use_interpret())(
        gcls, xh, vals, hidx
    )


# ---------------------------------------------------------------------------
# chunksel: the M2 pass of the recursive middle stage — move elements
# across the Tk chunks of each logical row at a fixed chunk-color position.
# Data is the mstream layout (8, Tk*1024, 128) viewed as (8, Tk, 1024, 128).
# ---------------------------------------------------------------------------


def _chunksel_kernel(Tk: int, d_ref, c_ref, o_ref):
    for cd in range(Tk):
        sel = c_ref[:, cd].astype(jnp.int32)
        acc = jnp.zeros(sel.shape, jnp.float32)
        for ca in range(Tk):
            acc = jnp.where(sel == ca, d_ref[:, ca], acc)
        o_ref[:, cd] = acc


def _qb_for(Tk: int) -> int:
    # block = (8, Tk, QB, 128); in f32 + csel int16 + out f32 = 10 B/elem,
    # double-buffered by Mosaic -> keep single-buffered total under ~5 MB.
    # QB = 8 is the floor (f32 sublane tile); it holds up to Tk ~ 96
    # (VMEM scoped limit 16 MB double-buffered), i.e. T <= 98304 tiles =
    # ~100M stored nnz per chip.  Larger needs a depth-3 middle stage.
    budget = 5 * 1024 * 1024
    for qb in (256, 128, 64, 32, 16, 8):
        if 8 * Tk * qb * 128 * (4 + 2 + 4) <= budget:
            return qb
    return 8


@functools.lru_cache(maxsize=None)
def _chunksel_call(Tk: int, interpret: bool):
    QB = _qb_for(Tk)
    grid = 1024 // QB

    def fn(data4, csel4):
        return pl.pallas_call(
            functools.partial(_chunksel_kernel, Tk),
            grid=(grid,),
            out_shape=jax.ShapeDtypeStruct((8, Tk, 1024, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(
                    (8, Tk, QB, 128),
                    lambda i: (0, 0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (8, Tk, QB, 128),
                    lambda i: (0, 0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (8, Tk, QB, 128),
                lambda i: (0, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            interpret=interpret,
        )(data4, csel4)

    return jax.jit(fn)


def chunksel(data: jax.Array, csel: jax.Array, Tk: int) -> jax.Array:
    """data/csel (8, Tk*1024, 128); moves slab ca*1024+q -> cd*1024+q."""
    out = _chunksel_call(Tk, use_interpret())(
        data.reshape(8, Tk, 1024, 128), csel.reshape(8, Tk, 1024, 128)
    )
    return out.reshape(8, Tk * 1024, 128)


def stream_to_mstream(g: jax.Array, Tk: int) -> jax.Array:
    """(8,T,128) [qh, a, ql] -> (8, Tk*1024, 128) [pH, ca*1024+q, pL]
    where a = ca*1024 + p (p = within-chunk position)."""
    h = g.reshape(8, Tk, 8, 128, 128)  # [qh, ca, pH, pL, ql]
    return jnp.transpose(h, (2, 1, 0, 4, 3)).reshape(8, Tk * 1024, 128)


def mstream_to_stream(m: jax.Array, Tk: int) -> jax.Array:
    """(8, Tk*1024, 128) [fH, cd*1024+q, fL] -> (8,T,128) [qh, d, ql]
    where d = cd*1024 + f."""
    h = m.reshape(8, Tk, 8, 128, 128)  # [fH, cd, qh, ql, fL]
    return jnp.transpose(h, (2, 1, 0, 4, 3)).reshape(8, Tk * 1024, 128)


# ---------------------------------------------------------------------------
# Fused middle kernels: the stream<->mstream relayouts, executed as XLA
# transposes, materialize at ~126 GB/s and cost as much as all three
# middle passes combined.  In-kernel Mosaic transposes of one chunk are
# ~free (probed), so M1 fuses transpose-in and M3 fuses transpose-out;
# the flat (Tk == 1) middle fuses all three steps into one kernel.
# Grid = (Tk, 2): one chunk x one q-half (4 sublanes) per step, keeping
# blocks at 2 MB.
# ---------------------------------------------------------------------------


def _gather_slabs(t, idx):
    """tileperm core: t (8, W, 128), idx int32 (8, W, 128) in [0,1024)."""
    out = []
    for i in range(8):
        lo = jnp.bitwise_and(idx[i], 127)
        hi = jax.lax.shift_right_logical(idx[i], 7)
        acc = jnp.zeros(lo.shape, jnp.float32)
        for s in range(8):
            cand = jnp.take_along_axis(t[s], lo, axis=1)
            acc = jnp.where(hi == s, cand, acc)
        out.append(acc)
    return jnp.stack(out, axis=0)


# q-quarters: 2 sublane rows of the stream chunk = 256 mstream slabs per
# grid step, keeping blocks at ~1 MB so Mosaic's scoped VMEM stays <16 MB.
NQ = 4  # quarters per chunk
QS = 1024 // NQ  # slabs per step
SS = 8 // NQ  # stream sublane rows per step


def _m1_fused_kernel(d_ref, i_ref, o_ref):
    # in: stream chunk quarter (SS, 1024, 128) [qh, p, ql]
    x = d_ref[...].reshape(SS, 8, 128, 128)  # [qh, pH, pL, ql]
    t = jnp.transpose(x, (1, 0, 3, 2)).reshape(8, QS, 128)  # [pH, q, pL]
    o_ref[...] = _gather_slabs(t, i_ref[...].astype(jnp.int32))


def _m3_fused_kernel(d_ref, i_ref, o_ref):
    # in: mstream slabs (8, QS, 128) [mH, q, mL]; gather then transpose
    g = _gather_slabs(d_ref[...], i_ref[...].astype(jnp.int32))
    x = g.reshape(8, SS, 128, 128)  # [fH, qh, ql, fL]
    o_ref[...] = jnp.transpose(x, (1, 0, 3, 2)).reshape(SS, 1024, 128)


def _flat_fused_kernel(d_ref, i_ref, o_ref):
    x = d_ref[...].reshape(SS, 8, 128, 128)
    t = jnp.transpose(x, (1, 0, 3, 2)).reshape(8, QS, 128)
    g = _gather_slabs(t, i_ref[...].astype(jnp.int32))
    x2 = g.reshape(8, SS, 128, 128)
    o_ref[...] = jnp.transpose(x2, (1, 0, 3, 2)).reshape(SS, 1024, 128)


@functools.lru_cache(maxsize=None)
def _mid_fused_call(Tk: int, which: str, interpret: bool):
    kern = {
        "m1": _m1_fused_kernel,
        "m3": _m3_fused_kernel,
        "flat": _flat_fused_kernel,
    }[which]
    stream_spec = pl.BlockSpec(
        (SS, 1024, 128), lambda c, h: (h, c, 0), memory_space=pltpu.VMEM
    )
    slab_spec = pl.BlockSpec(
        (8, QS, 128), lambda c, h: (0, c * NQ + h, 0),
        memory_space=pltpu.VMEM,
    )
    in_spec, out_spec = {
        "m1": (stream_spec, slab_spec),
        "m3": (slab_spec, stream_spec),
        "flat": (stream_spec, stream_spec),
    }[which]
    out_shape = {
        "m1": (8, Tk * 1024, 128),
        "m3": (8, Tk * 1024, 128),
        "flat": (8, Tk * 1024, 128),
    }[which]

    def fn(data, idx):
        return pl.pallas_call(
            kern,
            grid=(Tk, NQ),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[
                in_spec,
                pl.BlockSpec(
                    (8, QS, 128),
                    lambda c, h: (0, c * NQ + h, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=out_spec,
            interpret=interpret,
        )(data, idx)

    return jax.jit(fn)


# ---------------------------------------------------------------------------
# Small-route fused executor: a whole T == 1024 route (the y-route) in two
# kernels — [stage1 + transpose + middle] and [transpose + stage3 +
# flatten] — instead of five passes.  The input is already in stream
# layout, so there are zero XLA relayouts.
# ---------------------------------------------------------------------------


def _sr1_kernel(d_ref, s1_ref, mid_ref, o_ref):
    # d: full stream (8, 1024, 128) [pH, tile, pL]; s1 rows for this
    # quarter (2, 1024, 128); mid slabs quarter (8, 256, 128).
    outs = []
    for j in range(2):
        idx = s1_ref[j].astype(jnp.int32)
        lo = jnp.bitwise_and(idx, 127)
        hi = jax.lax.shift_right_logical(idx, 7)
        acc = jnp.zeros(lo.shape, jnp.float32)
        for s in range(8):
            cand = jnp.take_along_axis(d_ref[s], lo, axis=1)
            acc = jnp.where(hi == s, cand, acc)
        outs.append(acc)
    g2 = jnp.stack(outs, axis=0)  # (2, 1024, 128) [qh_local, a, ql]
    t = jnp.transpose(
        g2.reshape(2, 8, 128, 128), (1, 0, 3, 2)
    ).reshape(8, 256, 128)  # [aH, q_local, aL]
    o_ref[...] = _gather_slabs(t, mid_ref[...].astype(jnp.int32))


def _sr2_kernel(d_ref, s3_ref, o_ref):
    # d: mstream rows quarter (2, 1024, 128) [dH_local, q, dL];
    # s3 tiles quarter (8, 256, 128); out natural-flat (256, 8, 128).
    x = d_ref[...].reshape(2, 8, 128, 128)  # [dH, qh, ql, dL]
    t2 = jnp.transpose(x, (1, 0, 3, 2)).reshape(8, 256, 128)
    g = _gather_slabs(t2, s3_ref[...].astype(jnp.int32))
    o_ref[...] = jnp.transpose(g, (1, 0, 2))  # (256, 8, 128)


@functools.lru_cache(maxsize=None)
def _route_small_call(interpret: bool):
    def fn(g, s1, mid, s3):
        m = pl.pallas_call(
            _sr1_kernel,
            grid=(4,),
            out_shape=jax.ShapeDtypeStruct((8, 1024, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(
                    (8, 1024, 128),
                    lambda h: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (2, 1024, 128),
                    lambda h: (h, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (8, 256, 128),
                    lambda h: (0, h, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (8, 256, 128), lambda h: (0, h, 0), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
            # under vmap (SpMM) the batched blocks push the default
            # 16M scoped-vmem limit; plenty of headroom on v5e
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )(g, s1, mid)
        y = pl.pallas_call(
            _sr2_kernel,
            grid=(4,),
            out_shape=jax.ShapeDtypeStruct((1024, 8, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(
                    (2, 1024, 128),
                    lambda h: (h, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (8, 256, 128),
                    lambda h: (0, h, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (256, 8, 128), lambda h: (h, 0, 0), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )(m, s3)
        return y.reshape(-1)

    return jax.jit(fn)


def apply_route_stream(ra, g: jax.Array) -> jax.Array:
    """Route with the input already in stream layout (8, Tp, 128)."""
    if isinstance(ra, dict):
        T, Tp, n = ra["T"], ra["Tp"], ra["n"]
        s1, mp, s3 = ra["s1"], ra["mid_planes"], ra["s3"]
    else:
        T, Tp, n = ra.T, ra.Tp, ra.n
        s1, mp, s3 = ra.s1, ra.mid, ra.s3
    kind = mp["kind"] if isinstance(mp, dict) else mp.kind
    get = mp.get if isinstance(mp, dict) else (lambda k: getattr(mp, k))
    if Tp == 1024 and kind == "flat":
        return _route_small_call(use_interpret())(
            g, s1, get("mid"), s3
        )[:n]
    g1 = tileperm_ss(g, s1)
    g2 = middle_pass(g1, mp)
    g3 = tileperm_ss(g2, s3)
    return stream_to_flat(g3)[:n]


def middle_pass(g1: jax.Array, planes) -> jax.Array:
    """The route middle stage on a stream-layout array (8, T, 128).

    planes (dict or RouteMidDevice):
      kind "flat":  mid plane, T == 1024 (fused transpose+perm+transpose)
      kind "rec":   m1/csel/m3 planes, T == Tk*1024 (fused relayouts)
      kind "brute": mid plane, any T (legacy O(T/128)-per-element kernel)
    """
    get = planes.get if isinstance(planes, dict) else (
        lambda k: getattr(planes, k)
    )
    kind = get("kind")
    if kind == "brute":
        return middle_to_stream(
            groupperm_ss(stream_to_middle(g1), get("mid"))
        )
    Tk = get("Tk")
    interp = use_interpret()
    if kind == "flat":
        return _mid_fused_call(Tk, "flat", interp)(g1, get("mid"))
    m = _mid_fused_call(Tk, "m1", interp)(g1, get("m1"))
    m = chunksel(m, get("csel"), Tk)
    return _mid_fused_call(Tk, "m3", interp)(m, get("m3"))


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["mid", "m1", "csel", "m3"],
    meta_fields=["kind", "Tk"],
)
@dataclasses.dataclass(frozen=True)
class RouteMidDevice:
    """Device-resident middle-stage planes (see middle_pass)."""

    kind: str
    Tk: int
    mid: jax.Array | None = None
    m1: jax.Array | None = None
    csel: jax.Array | None = None
    m3: jax.Array | None = None

    def get(self, k):
        return getattr(self, k)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["s1", "mid", "s3"],
    meta_fields=["T", "Tp", "n"],
)
@dataclasses.dataclass(frozen=True)
class RouteDevice:
    """Device-resident full route (stages 1/3 + middle)."""

    s1: jax.Array
    mid: RouteMidDevice
    s3: jax.Array
    T: int
    Tp: int
    n: int


def mid_to_device(mp: dict, device=None) -> RouteMidDevice:
    put = functools.partial(jax.device_put, device=device)
    return RouteMidDevice(
        kind=mp["kind"],
        Tk=mp["Tk"],
        mid=put(mp["mid"]) if "mid" in mp else None,
        m1=put(mp["m1"]) if "m1" in mp else None,
        csel=put(mp["csel"]) if "csel" in mp else None,
        m3=put(mp["m3"]) if "m3" in mp else None,
    )


def route_to_device(ra: dict, device=None) -> RouteDevice:
    put = functools.partial(jax.device_put, device=device)
    return RouteDevice(
        s1=put(ra["s1"]),
        mid=mid_to_device(ra["mid_planes"], device),
        s3=put(ra["s3"]),
        T=ra["T"],
        Tp=ra["Tp"],
        n=ra["n"],
    )


# ---------------------------------------------------------------------------
# Layout conversions + full route executor
# ---------------------------------------------------------------------------


def flat_to_stream(v: jax.Array, T: int) -> jax.Array:
    """(T*1024,) -> (8, T, 128) stream layout."""
    return jnp.transpose(v.reshape(T, 8, 128), (1, 0, 2))


def stream_to_flat(g: jax.Array) -> jax.Array:
    """(8, T, 128) -> (T*1024,)."""
    return jnp.transpose(g, (1, 0, 2)).reshape(-1)


def stream_to_middle(g: jax.Array) -> jax.Array:
    """(8, T, 128) [qh, a, ql] -> (K, 1024, 128) [k, q, l], T = K*128."""
    _, T, _ = g.shape
    K = T // 128
    return jnp.transpose(g.reshape(8, K, 128, 128), (1, 0, 3, 2)).reshape(
        K, 1024, 128
    )


def middle_to_stream(m: jax.Array) -> jax.Array:
    """(K, 1024, 128) [k, q, l] -> (8, T, 128) [qh, a, ql]."""
    K = m.shape[0]
    return jnp.transpose(
        m.reshape(K, 8, 128, 128), (1, 0, 3, 2)
    ).reshape(8, K * 128, 128)


def _to_ss16(a: np.ndarray) -> np.ndarray:
    """Logical [Ntiles, 1024] int plane -> stream layout (8, Ntiles, 128)."""
    n = a.shape[0]
    return np.ascontiguousarray(
        a.astype(np.int16).reshape(n, 8, 128).transpose(1, 0, 2)
    )


def middle_planes(plan) -> dict:
    """Device-ready middle-stage planes for a RoutePlan (host NumPy)."""
    return middle_planes_from(plan.mid, plan.n_tiles)


def middle_planes_from(mid_arr: np.ndarray, T: int) -> dict:
    """Middle-stage planes straight from the (1024, T) mid array."""
    from cvr_tpu.ops.route import mid_recursive_planes

    if T % 1024 == 0:
        Tk = T // 1024
        if Tk == 1:
            return {"kind": "flat", "mid": _to_ss16(mid_arr), "Tk": 1}
        from cvr_tpu import _native

        if _native.available() and hasattr(_native, "mid_planes_ss_native"):
            # capacitated per-row colorings + planes emitted straight in
            # the sublane-split device layout (no numpy relayout pass)
            mid_c = np.ascontiguousarray(mid_arr, dtype=np.int32)
            colors = _native.color_rows_cap_native(mid_c, T, Tk)
            m1, csel, m3 = _native.mid_planes_ss_native(mid_c, T, colors)
            return {"kind": "rec", "m1": m1, "csel": csel, "m3": m3,
                    "Tk": Tk}
        rec = mid_recursive_planes(mid_arr, T)
        return {
            "kind": "rec",
            "m1": _to_ss16(rec["m1"]),
            "csel": _to_ss16(rec["csel"]),
            "m3": _to_ss16(rec["m3"]),
            "Tk": Tk,
        }
    # legacy brute kernel for streams not rounded to 1024 tiles
    if T > 32767:
        raise ValueError(
            "brute middle stage holds tile ids in int16 (T <= 32767); "
            "pad the stream to a 1024-tile multiple for the recursive "
            "middle"
        )
    Tp = _round_up(T, 128)
    K = Tp // 128
    mid = np.tile(np.arange(Tp, dtype=np.int16), (1024, 1))
    mid[:, :T] = mid_arr.astype(np.int16)
    mid_ss = np.ascontiguousarray(
        mid.reshape(1024, K, 128).transpose(1, 0, 2)
    )
    return {"kind": "brute", "mid": mid_ss, "Tk": K}


def route_arrays_from_perm(
    perm, n: int | None = None, tile_multiple: int = 1024
) -> dict:
    """Device-ready route arrays straight from a permutation — the
    coloring, the ss-layout stage planes, and the middle planes in one
    native pass each (no logical-plane detour).  Numpy fallback: the
    plan_route + route_arrays path."""
    from cvr_tpu import _native
    from cvr_tpu.ops.route import TILE as RTILE, plan_route

    if not (
        _native.available()
        and hasattr(_native, "route_compile_native")
    ):
        return route_arrays(plan_route(perm, n=n, tile_multiple=tile_multiple))
    perm = np.asarray(perm, dtype=np.int64)
    n = int(perm.shape[0]) if n is None else n
    N = perm.shape[0]
    T = max(1, -(-N // RTILE))
    T = -(-T // tile_multiple) * tile_multiple
    full = np.arange(T * RTILE, dtype=np.int64)
    full[:N] = perm
    perm32 = full.astype(np.int32)
    Tp = _round_up(T, 128)
    s1_ss, mid, s3_ss = _native.route_compile_native(perm32, T, Tp, Tp)
    return {
        "s1": s1_ss,
        "mid_planes": middle_planes_from(mid, T),
        "s3": s3_ss,
        "T": T,
        "Tp": Tp,
        "n": n,
    }


def route_arrays(plan) -> dict:
    """Device-ready sublane-split int16 index planes for a RoutePlan."""
    T = plan.n_tiles
    Tp = _round_up(T, 128)
    # s1 (T, 1024) -> stream layout (8, Tp, 128); padded tiles: identity.
    s1 = np.tile(np.arange(1024, dtype=np.int16), (Tp, 1)).reshape(Tp, 1024)
    s1[:T] = plan.s1.astype(np.int16)
    s3 = np.tile(np.arange(1024, dtype=np.int16), (Tp, 1)).reshape(Tp, 1024)
    s3[:T] = plan.s3.astype(np.int16)
    return {
        "s1": _to_ss16(s1),
        "mid_planes": middle_planes(plan),
        "s3": _to_ss16(s3),
        "T": T,
        "Tp": Tp,
        "n": plan.n,
    }


def apply_route_tpu(ra, v: jax.Array) -> jax.Array:
    """Execute a compiled route on device: out = v[perm] (flat).

    ``ra``: a route_arrays dict (host) or RouteDevice (device pytree).
    """
    if isinstance(ra, dict):
        T, Tp, n = ra["T"], ra["Tp"], ra["n"]
        s1, mp, s3 = ra["s1"], ra["mid_planes"], ra["s3"]
    else:
        T, Tp, n = ra.T, ra.Tp, ra.n
        s1, mp, s3 = ra.s1, ra.mid, ra.s3
    n_pad = Tp * 1024 - v.shape[0]
    g = flat_to_stream(jnp.pad(v, (0, n_pad)) if n_pad else v, Tp)
    return apply_route_stream(ra, g)
