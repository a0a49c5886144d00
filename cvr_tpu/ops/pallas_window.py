"""The fused SELL-W SpMV kernel: window gather + FMA + slice reduce.

ONE Pallas pass computes y = A @ x on the SELL-W planes
(cvr_tpu/formats/sell_window.py): for each plane row (1024 nonzeros), x is
gathered through the row's aligned column window (the only gather form a
v5e runs at vector rate — 8/16 lane-gathers + selects over a VMEM slab,
see docs/DESIGN.md "Gather strategies"), multiplied by the value plane,
and accumulated into the running slice sum; slice-end rows emit the sum
into the VMEM-resident y block.

This is the whole SpMV in a single ~6 bytes/nnz stream (2B in-window
offset + 4B value), against the routed path's four passes — the payoff
for the locality assumption.  The reference's analogue of this case is a
banded/regular matrix where CVR's 8 trackers advance in lockstep and its
kernel is pure streaming (spmv.cpp:1351-1437, phase 3: no record drains).

Kernel structure mirrors pallas_route's reduce (sequential emission with
aligned 8-slab rewrites) and expand (per-tile dynamic window slabs,
provably 8-aligned bases) — the Mosaic rules those encode apply here
unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cvr_tpu.ops.pallas_route import CH, YB, use_interpret  # noqa: F401

__all__ = ["window_reduce", "CH", "YB"]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _win_kernel(WR: int, emit_ref, w10_ref, seg_ref, li_ref, v_ref,
                x3_ref, y_ref, acc_ref, p_ref):
    """Two phases, measured to matter (docs/DESIGN.md): interleaving the
    per-row emission branch with the window gathers serializes Mosaic's
    pipeline (178 ns/plane-row); staging all gathered+scaled rows through
    VMEM scratch first and sweeping emissions afterwards pipelines both
    (the structure of pallas_route's reduce kernel)."""
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        # zero-width slices (all-empty rows) never emit: pre-zero y.
        y_ref[...] = jnp.zeros_like(y_ref)

    # Phase 1: window gather + FMA for every plane row of the block, no
    # cross-row dependencies.
    def ggroup(rg, _):
        r8 = pl.multiple_of(rg * 8, 8)
        li8 = li_ref[:, pl.ds(r8, 8), :].astype(jnp.int32)
        v8 = v_ref[:, pl.ds(r8, 8), :]
        outs = []
        for j in range(8):
            idx = li8[:, j, :]
            lo = jnp.bitwise_and(idx, 127)
            hi = jax.lax.shift_right_logical(idx, 7)
            # The window base is stored as a window INDEX so base = w10*8
            # is provably 8-aligned (Mosaic requires it for dynamic
            # sublane slabs; same trick as the expand kernel).
            base = pl.multiple_of(
                w10_ref[blk * CH + rg * 8 + j] * 8, 8
            )
            w = x3_ref[0, pl.ds(base, WR), :]  # (WR, 128) window slab
            acc = jnp.zeros((8, 128), jnp.float32)
            for s in range(WR):
                op = jnp.broadcast_to(w[s : s + 1, :], (8, 128))
                cand = jnp.take_along_axis(op, lo, axis=1)
                acc = jnp.where(hi == s, cand, acc)
            outs.append(acc * v8[:, j, :])
        p_ref[:, pl.ds(r8, 8), :] = jnp.stack(outs, axis=1)
        return 0

    jax.lax.fori_loop(0, CH // 8, ggroup, 0, unroll=False)

    # Phase 2: sequential per-row accumulation with slice-end emissions.
    def rgroup(rg, _):
        r8 = pl.multiple_of(rg * 8, 8)
        p8 = p_ref[:, pl.ds(r8, 8), :]
        for j in range(8):
            acc_ref[...] += p8[:, j, :]
            dest = emit_ref[blk * CH + rg * 8 + j]

            @pl.when(dest >= 0)
            def _():
                # Aligned 8-slice slab rewrite with a lane-select (Mosaic
                # rejects unaligned dynamic stores).
                d8 = pl.multiple_of(
                    jax.lax.shift_right_logical(dest, 3) * 8, 8
                )
                cur = y_ref[:, pl.ds(d8, 8), :]
                sel = (
                    jax.lax.broadcasted_iota(jnp.int32, (8, 8, 128), 1)
                    == (dest - d8)[None, None, None]
                )
                y_ref[:, pl.ds(d8, 8), :] = jnp.where(
                    sel, acc_ref[...][:, None, :], cur
                )
                acc_ref[...] = jnp.zeros_like(acc_ref)

        return 0

    jax.lax.fori_loop(0, CH // 8, rgroup, 0, unroll=False)


@functools.lru_cache(maxsize=None)
def _win_call(S_rows: int, nslices: int, W: int, segw: int, G: int,
              interpret: bool):
    grid = S_rows // CH
    WR = W // 128
    # G-offset-grid x table: G grids x (segw + 2) windows x 8 rows
    # (see formats/sell_window.py)
    xrows = G * 8 * (segw + 2)
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # emit, w10, seg_blk
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (8, CH, 128), lambda i, e, w, s: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, CH, 128), lambda i, e, w, s: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, xrows, 128), lambda i, e, w, s: (s[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (8, nslices, 128), lambda i, e, w, s: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((8, CH, 128), jnp.float32),
        ],
    )

    def fn(emit, w10, seg_blk, li, vals, x3):
        return pl.pallas_call(
            functools.partial(_win_kernel, WR),
            grid_spec=spec,
            out_shape=jax.ShapeDtypeStruct((8, nslices, 128), jnp.float32),
            interpret=interpret,
        )(emit, w10, seg_blk, li, vals, x3)

    return jax.jit(fn)


def window_reduce(
    emit: jax.Array,
    w10: jax.Array,
    seg_blk: jax.Array,
    li: jax.Array,
    vals: jax.Array,
    x3: jax.Array,
    nslices: int,
    W: int,
    segw: int,
    G: int,
) -> jax.Array:
    """One reduce call: per-slice lane sums for ``nslices`` slices.

    emit/w10: (nr,) with nr a CH multiple; seg_blk: (nr // CH,);
    li/vals: (8, nr, 128); x3: (n_segs, G*8*(segw+2), 128).
    Returns (8, nslices, 128): slice sigma's 1024 lane sums at
    [:, sigma, :] (lane p of the slice at [p >> 7, sigma, p & 127]).
    """
    nr = emit.shape[0]
    if nr % CH:
        raise ValueError("row count must be a multiple of CH")
    nsp = _round_up(max(nslices, 8), 8)
    out = _win_call(nr, nsp, W, segw, G, use_interpret())(
        emit, w10, seg_blk, li, vals, x3
    )
    return out[:, :nslices]
