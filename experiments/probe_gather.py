#!/usr/bin/env python
"""Probe which gather forms Mosaic/v5e supports inside Pallas, and how fast.

The x-gather is THE bottleneck of TPU SpMV (docs/DESIGN.md): XLA lowers a
flat jnp.take at ~7 ns/element (scalar rate).  This probe compiles one tiny
Pallas kernel per candidate gather formulation and measures elements/s on
the real chip, using the slope between a small-grid and a large-grid
variant so tunnel dispatch latency and the remote execution cache cannot
distort the numbers (same methodology as cvr_tpu.bench.harness).

Forms probed (idx tile is always (8, 128) int32 per grid step):
  lane128      g[i,j] = W[0, lo[i,j]]            W=(1,128) bcast -> 8x128
  lane_same    g[i,j] = W[i, lo[i,j]]            take_along_axis axis=1
  window1k     g[i,j] = W[hi[i,j], lo[i,j]]      W=(8,128): 8 x (gather+sel)
  sublane8     g[i,j] = W[hi[i,j], j]            take_along_axis axis=0
  sublane512   same, W=(512,128)                 large-operand axis=0
  lane_wide    g[i,j] = W[i, idx[i,j]]           W=(8,512) axis=1 idx<512
  onehot128    g = onehot(lo) @ W                MXU gather, W=(128,128)
  scalar_loop  g[i,j] = X[hi[i,j]*128+lo] via fori + scalar SMEM idx loads
  flat_take    jnp.take(x_flat, idx_flat)        expect compile failure

Usage: python experiments/probe_gather.py [form ...]
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

# Big blocks per grid step: tiny (8,128) blocks make every form
# grid/DMA-latency bound (~230 ns/step measured); (1024,128) = 512 KB
# blocks let the HBM streams and the VPU rate show through.
TILE = (1024, 128)
ELEMS = TILE[0] * TILE[1]
BROWS = TILE[0]


# --- kernel bodies: (idx_ref, table_ref, out_ref) per grid step -----------


def k_lane128(idx_ref, tab_ref, out_ref):
    w = jnp.broadcast_to(tab_ref[0:1, :], TILE)  # one 128-wide window
    lo = jnp.bitwise_and(idx_ref[...], 127)
    out_ref[...] = jnp.take_along_axis(w, lo, axis=1)


def k_lane128_x8(idx_ref, tab_ref, out_ref):
    # 8 independent 128-windows selected per 128-row band (what the real
    # kernel does when consecutive bands use different column windows).
    idx = idx_ref[...]
    lo = jnp.bitwise_and(idx, 127)
    acc = jnp.zeros(TILE, jnp.float32)
    for r in range(8):
        w = jnp.broadcast_to(tab_ref[r : r + 1, :], TILE)
        cand = jnp.take_along_axis(w, lo, axis=1)
        band = jax.lax.broadcasted_iota(jnp.int32, TILE, 0) // (BROWS // 8)
        acc = jnp.where(band == r, cand, acc)
    out_ref[...] = acc


def k_lane_same(idx_ref, tab_ref, out_ref):
    lo = jnp.bitwise_and(idx_ref[...], 127)
    w = jnp.broadcast_to(tab_ref[0:8, :].reshape(1, 8, 128), (BROWS // 8, 8, 128)).reshape(TILE)
    out_ref[...] = jnp.take_along_axis(w, lo, axis=1)


def k_window1k(idx_ref, tab_ref, out_ref):
    idx = idx_ref[...]
    lo = jnp.bitwise_and(idx, 127)
    hi = jnp.bitwise_and(jax.lax.shift_right_logical(idx, 7), 7)
    acc = jnp.zeros(TILE, jnp.float32)
    for r in range(8):
        w = jnp.broadcast_to(tab_ref[r : r + 1, :], TILE)
        cand = jnp.take_along_axis(w, lo, axis=1)
        acc = jnp.where(hi == r, cand, acc)
    out_ref[...] = acc


def k_sublane8(idx_ref, tab_ref, out_ref):
    hi = jnp.bitwise_and(idx_ref[...], 7)
    out_ref[...] = jnp.take_along_axis(tab_ref[0:8, :], hi, axis=0)


def k_sublane512(idx_ref, tab_ref, out_ref):
    hi = jnp.bitwise_and(idx_ref[...], 511)
    out_ref[...] = jnp.take_along_axis(tab_ref[0:512, :], hi, axis=0)


def k_lane_wide(idx_ref, tab_ref, out_ref):
    lo = jnp.bitwise_and(idx_ref[...], 511)
    w = jnp.broadcast_to(tab_ref[0:8, 0:512].reshape(1, 8, 512), (BROWS // 8, 8, 512)).reshape(BROWS, 512)
    out_ref[...] = jnp.take_along_axis(w, lo, axis=1)


def k_onehot128(idx_ref, tab_ref, out_ref):
    lo = jnp.bitwise_and(idx_ref[...], 127)
    cols = jax.lax.broadcasted_iota(jnp.int32, TILE + (128,), 2)
    onehot = (lo[:, :, None] == cols).astype(jnp.float32)
    w = tab_ref[0, :]
    out_ref[...] = jax.lax.dot_general(
        onehot.reshape(ELEMS, 128),
        w.reshape(128, 1),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(TILE)


def k_scalar_loop(idx_ref, tab_ref, out_ref):
    # Scalar-core gather: one element at a time through SMEM-ish indexing.
    def body(k, acc):
        i = k // 128
        j = k % 128
        c = idx_ref[i, j]
        hi = jax.lax.shift_right_logical(c, 7)
        lo = jnp.bitwise_and(c, 127)
        v = tab_ref[hi, lo]
        return acc + v

    out_ref[...] = jnp.full(TILE, jax.lax.fori_loop(0, ELEMS, body, 0.0))


def k_flat_take(idx_ref, tab_ref, out_ref):
    flat = tab_ref[...].reshape(-1)
    out_ref[...] = jnp.take(flat, idx_ref[...].reshape(-1)).reshape(TILE)


FORMS = {
    "lane128": (k_lane128, 8),
    "lane128_x8": (k_lane128_x8, 8),
    "lane_same": (k_lane_same, 8),
    "window1k": (k_window1k, 8),
    "sublane8": (k_sublane8, 8),
    "sublane512": (k_sublane512, 512),
    "lane_wide": (k_lane_wide, 8),
    "onehot128": (k_onehot128, 8),
    "scalar_loop": (k_scalar_loop, 512),
    "flat_take": (k_flat_take, 512),
}


def build(form: str, n_tiles: int, table_rows: int, iters: int):
    """One jit call = ``iters`` chained passes over the idx planes.

    The pallas output is folded back into the table each pass (genuine
    loop-carried dependence, mirrors cvr_tpu.bench.harness.make_iterated),
    so neither XLA DCE nor the remote execution cache can elide work; the
    per-pass time comes from the slope between two iteration counts.
    """
    kernel, _ = FORMS[form]

    call = functools.partial(
        pl.pallas_call,
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE[0], 128), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(TILE, lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (table_rows, 128),
                lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            TILE, lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )

    @jax.jit
    def run(idx, seed):
        table = jax.random.normal(
            jax.random.PRNGKey(seed), (table_rows, 128), jnp.float32
        )

        def body(_, tab):
            out = call()(idx, tab)
            return tab * 0.5 + out[:table_rows] * 1e-6

        # NOTE: in this environment jax.block_until_ready does NOT force
        # execution through the remote tunnel; only fetching data does.
        # Return a scalar so the forced fetch is cheap.
        return jnp.sum(jax.lax.fori_loop(0, iters, body, table))

    return run


def probe(form: str, n_tiles: int = 512) -> None:
    _, table_rows = FORMS[form]
    rng = np.random.default_rng(0)
    t_compile0 = time.perf_counter()
    try:
        if form == "scalar_loop":
            n_tiles = 1  # scalar path is ~1000x slower
        idx = jnp.asarray(
            rng.integers(0, 1 << 20, size=(n_tiles * TILE[0], 128)).astype(
                np.int32
            )
        )
        it1, it2 = 4, 20
        runs = {}
        for iters in (it1, it2):
            f = build(form, n_tiles, table_rows, iters)
            _ = np.asarray(f(idx, jnp.int32(0)))  # compile + flush
            best = float("inf")
            for rep in range(1, 4):
                t0 = time.perf_counter()
                _ = np.asarray(f(idx, jnp.int32(rep)))
                best = min(best, time.perf_counter() - t0)
            runs[iters] = best
        dt = runs[it2] - runs[it1]
        n_el = (it2 - it1) * n_tiles * ELEMS
        rate = n_el / max(dt, 1e-9) / 1e9
        per_pass_ms = dt / (it2 - it1) * 1e3
        print(
            f"{form:12s} OK    {rate:8.2f} Gelem/s   "
            f"({per_pass_ms:7.3f} ms/pass of {n_tiles} tiles, "
            f"t[{it1}]={runs[it1] * 1e3:.1f}ms t[{it2}]={runs[it2] * 1e3:.1f}ms, "
            f"compile+run {time.perf_counter() - t_compile0:.1f}s)"
        )
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:140]
        print(f"{form:12s} FAIL  {msg}")


if __name__ == "__main__":
    forms = sys.argv[1:] or list(FORMS)
    print(f"devices: {jax.devices()}")
    for form in forms:
        probe(form)
