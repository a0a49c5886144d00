"""The fused SELL-W SpMV kernel: window gather + FMA + slice reduce.

ONE Pallas pass computes y = A @ x on the SELL-W planes
(cvr_tpu/formats/sell_window.py): for each plane row (1024 nonzeros), x is
gathered through the row's aligned column window (the only gather form a
v5e runs at vector rate — lane-gathers + selects over a VMEM slab, see
docs/DESIGN.md "Gather strategies"), multiplied by the value plane, and
accumulated into the running slice sum; slice-end rows emit the sum into
the VMEM-resident y block.

This is the whole SpMV in a single ~6 bytes/nnz stream (2B in-window
offset + 4B value), against the routed path's four passes — the payoff
for the locality assumption.  The reference's analogue of this case is a
banded/regular matrix where CVR's 8 trackers advance in lockstep and its
kernel is pure streaming (spmv.cpp:1351-1437, phase 3: no record drains).

Two round-2 speedups (both measured to matter):

  * **WRL — the gather-candidate class.**  The slab read must start on an
    8-row (1024-column) boundary (Mosaic dynamic-sublane alignment), but
    the number of gather+select candidates only has to cover the LARGEST
    in-window offset actually present.  The pack computes
    ``wrl = (max li >> 7) + 1`` (and picks the offset grid per row that
    minimizes it), so a banded matrix with spread < 256 runs 2 candidate
    selects per row instead of 8.
  * **Single-emission groups.**  The sequential phase-2 sweep costs
    ~10 ns/row in per-row branches; but most 8-row groups contain zero or
    one slice boundary.  A host-side per-group code (``gemit``) dispatches
    zero-emission groups to one (8,8,128) reduction and single-emission
    groups to two masked reductions; only multi-emission groups (slices
    narrower than ~8 rows) walk row by row.

Kernel structure mirrors pallas_route's reduce (aligned 8-slab rewrites)
and expand (per-row dynamic window slabs, provably 8-aligned bases).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cvr_tpu.ops.pallas_route import (  # noqa: F401
    CH,
    YB,
    _emission_sweep,
    group_emit_encode,
    use_interpret,
)

__all__ = ["window_reduce", "group_emit_encode", "CH", "YB"]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _win_kernel(WR: int, WRL: int, emit_ref, w10_ref, seg_ref, gemit_ref,
                li_ref, v_ref, x3_ref, y_ref, acc_ref, p_ref):
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        # zero-width slices (all-empty rows) never emit: pre-zero y.
        y_ref[...] = jnp.zeros_like(y_ref)

    # Phase 1: window gather + FMA for every plane row of the block, no
    # cross-row dependencies; results staged through VMEM scratch
    # (interleaving the emission branch with the gathers serializes
    # Mosaic's pipeline — measured 178 vs 112 ns/row).
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
            for s in range(WRL):
                op = jnp.broadcast_to(w[s : s + 1, :], (8, 128))
                cand = jnp.take_along_axis(op, lo, axis=1)
                acc = jnp.where(hi == s, cand, acc)
            outs.append(acc * v8[:, j, :])
        p_ref[:, pl.ds(r8, 8), :] = jnp.stack(outs, axis=1)
        return 0

    jax.lax.fori_loop(0, CH // 8, ggroup, 0, unroll=False)

    # Phase 2: per-group accumulation dispatched on the emission code
    # (shared with the routed reduce kernels).
    _emission_sweep(blk, emit_ref, gemit_ref, p_ref, y_ref, acc_ref)


@functools.lru_cache(maxsize=None)
def _win_call(S_rows: int, nslices: int, W: int, segw: int, G: int,
              wrl: int, interpret: bool):
    grid = S_rows // CH
    WR = W // 128
    # G-offset-grid x table: G grids x (segw + 2) windows x 8 rows
    # (see formats/sell_window.py)
    xrows = G * 8 * (segw + 2)
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # emit, w10, seg_blk, gemit
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (8, CH, 128), lambda i, e, w, s, ge: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, CH, 128), lambda i, e, w, s, ge: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, xrows, 128), lambda i, e, w, s, ge: (s[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (8, nslices, 128), lambda i, e, w, s, ge: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((8, CH, 128), jnp.float32),
        ],
    )

    def fn(emit, w10, seg_blk, gemit, li, vals, x3):
        return pl.pallas_call(
            functools.partial(_win_kernel, WR, wrl),
            grid_spec=spec,
            out_shape=jax.ShapeDtypeStruct((8, nslices, 128), jnp.float32),
            interpret=interpret,
        )(emit, w10, seg_blk, gemit, li, vals, x3)

    return jax.jit(fn)


def window_reduce(
    emit: jax.Array,
    w10: jax.Array,
    seg_blk: jax.Array,
    gemit: jax.Array,
    li: jax.Array,
    vals: jax.Array,
    x3: jax.Array,
    nslices: int,
    W: int,
    segw: int,
    G: int,
    wrl: int | None = None,
) -> jax.Array:
    """One reduce call: per-slice lane sums for ``nslices`` slices.

    emit/w10: (nr,) with nr a CH multiple; seg_blk: (nr // CH,); gemit:
    (nr // 8,) from group_emit_encode; li/vals: (8, nr, 128);
    x3: (n_segs, G*8*(segw+2), 128); wrl: gather-candidate count
    (defaults to the full W // 128).
    Returns (8, nslices, 128): slice sigma's 1024 lane sums at
    [:, sigma, :] (lane p of the slice at [p >> 7, sigma, p & 127]).
    """
    nr = emit.shape[0]
    if nr % CH:
        raise ValueError("row count must be a multiple of CH")
    if wrl is None:
        wrl = W // 128
    nsp = _round_up(max(nslices, 8), 8)
    out = _win_call(nr, nsp, W, segw, G, int(wrl), use_interpret())(
        emit, w10, seg_blk, gemit, li, vals, x3
    )
    return out[:, :nslices]
