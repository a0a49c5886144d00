#!/usr/bin/env python
"""Probe the candidate-class expand inner loop (round 3).

The expand kernel burns 8 gather+select pairs per tile because every tile
reads an aligned 1024-column window.  Column-sorted tiles are much
narrower (mean span ~2.7 subwindows on web-Google-like), so a tile whose
window base had 128-column granularity would need only ~2 pairs — but
Mosaic requires dynamic sublane slab reads to be provably 8-aligned.

Candidate fix probed here: read an ALIGNED 16-row slab containing the
unaligned 8-row window, rotate it down with a dynamically-shifted
``pltpu.roll`` (one VPU shuffle?), then run k < 8 gather+select pairs.

Variants (per tile, inside the real expand loop structure):
  cur8    aligned 8-slab read + 8 pairs            (today's kernel)
  roll8   16-slab read + dynamic roll + 8 pairs    (roll overhead)
  roll4   16-slab read + dynamic roll + 4 pairs
  roll2   16-slab read + dynamic roll + 2 pairs
  roll1   16-slab read + dynamic roll + 1 pair

Reports ns/tile; the win to confirm is roll2 ~= cur8/3.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TB = 128  # tiles per grid step (matches ops/pallas_route.py)
TAB_ROWS = 8192  # x-table rows resident per step (4 MB)


def _expand_body(ncand: int, use_roll: bool, w8_ref, li_ref, x2_ref, o_ref):
    blk = pl.program_id(0)

    def tgroup(tg, _):
        t8 = pl.multiple_of(tg * 8, 8)
        li8 = li_ref[:, pl.ds(t8, 8), :].astype(jnp.int32)
        outs = []
        for j in range(8):
            idx = li8[:, j, :]
            lo = jnp.bitwise_and(idx, 127)
            hi = jax.lax.shift_right_logical(idx, 7)
            b = w8_ref[blk * TB + tg * 8 + j]
            if use_roll:
                a8 = pl.multiple_of(
                    jax.lax.shift_right_logical(b, 3) * 8, 8
                )
                r16 = x2_ref[pl.ds(a8, 16), :]
                w = pltpu.roll(r16, 16 - jnp.bitwise_and(b, 7), axis=0)
            else:
                a8 = pl.multiple_of(b * 8, 8)
                w = x2_ref[pl.ds(a8, 8), :]
            acc = jnp.zeros((8, 128), jnp.float32)
            for s in range(ncand):
                op = jnp.broadcast_to(w[s : s + 1, :], (8, 128))
                cand = jnp.take_along_axis(op, lo, axis=1)
                acc = jnp.where(hi == s, cand, acc)
            outs.append(acc)
        o_ref[:, pl.ds(t8, 8), :] = jnp.stack(outs, axis=1)
        return 0

    jax.lax.fori_loop(0, TB // 8, tgroup, 0, unroll=False)


VARIANTS = {
    "cur8": (8, False),
    "roll8": (8, True),
    "roll4": (4, True),
    "roll2": (2, True),
    "roll1": (1, True),
}


def build(name: str, T: int, iters: int):
    ncand, use_roll = VARIANTS[name]
    grid = T // TB
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (8, TB, 128), lambda i, w8: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TAB_ROWS, 128), lambda i, w8: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (8, TB, 128), lambda i, w8: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    call = functools.partial(
        pl.pallas_call,
        functools.partial(_expand_body, ncand, use_roll),
        grid_spec=spec,
        out_shape=jax.ShapeDtypeStruct((8, T, 128), jnp.float32),
    )

    @jax.jit
    def run(w8, li, seed):
        x2 = jax.random.normal(
            jax.random.PRNGKey(seed), (TAB_ROWS, 128), jnp.float32
        )

        def body(_, tab):
            out = call()(w8, li, tab)
            return tab * 0.5 + out[0, :TAB_ROWS // 8].reshape(-1, 128)[
                :TAB_ROWS
            ] * 1e-6

        def body2(_, tab):
            out = call()(w8, li, tab)
            return tab * 0.5 + jnp.pad(
                out[:, 0, :], ((0, TAB_ROWS - 8), (0, 0))
            ) * 1e-6

        return jnp.sum(jax.lax.fori_loop(0, iters, body2, x2))

    return run


def probe(name: str, T: int = 4096) -> None:
    ncand, use_roll = VARIANTS[name]
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    try:
        li = jnp.asarray(
            rng.integers(0, ncand * 128, size=(8, T, 128)).astype(np.int16)
        )
        hi_base = TAB_ROWS - 16
        if use_roll:
            w8 = rng.integers(0, hi_base, size=(T,))
        else:
            w8 = rng.integers(0, (TAB_ROWS - 8) // 8, size=(T,))
        w8 = jnp.asarray(w8.astype(np.int32))
        it1, it2 = 4, 24
        runs = {}
        for iters in (it1, it2):
            f = build(name, T, iters)
            _ = np.asarray(f(w8, li, jnp.int32(0)))
            best = float("inf")
            for rep in range(1, 4):
                tr = time.perf_counter()
                _ = np.asarray(f(w8, li, jnp.int32(rep)))
                best = min(best, time.perf_counter() - tr)
            runs[iters] = best
        dt = runs[it2] - runs[it1]
        ns_tile = dt / (it2 - it1) / T * 1e9
        ms_pass = dt / (it2 - it1) * 1e3
        print(
            f"{name:6s} OK   {ns_tile:7.2f} ns/tile  ({ms_pass:.3f} ms per "
            f"{T}-tile pass; compile+run {time.perf_counter() - t0:.1f}s)"
        )
    except Exception as e:  # noqa: BLE001
        print(f"{name:6s} FAIL {str(e).splitlines()[0][:140]}")


if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    print(f"devices: {jax.devices()}")
    for n in names:
        probe(n)
