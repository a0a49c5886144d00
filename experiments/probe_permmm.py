#!/usr/bin/env python
"""Probe: batched per-tile PERMUTATION MATMULS on the MXU (v5e).

Round-5 design question (docs/DESIGN.md round 4 SpMM section): the VPU
executes every gather/select at VALUE rate, so no layout can amortize
route ops over the K RHS columns of an SpMM — the round-4 "K-in-sublane
/8" estimate was arithmetically wrong (a VREG holds 1024 values whether
they are 1024 positions x 1 column or 128 positions x 8 columns).  The
one unit that breaks value rate is the MXU: a within-128-tile gather of
K-wide data is ``data (K,128) @ P (128,128)`` with P the one-hot of the
int8-sized index plane, built in-kernel from one vector compare (P is
0/1 so f32 permutation matmuls are EXACT — the 1e-6 contract survives).

Whether a radix-128 perm-matmul route can beat the vmapped VPU pipeline
(~1.15 ms/column on web) hinges on ONE number measured here: ns per
(build-P + dot) tile at the SpMM operand shapes, where every tile has a
DIFFERENT P (weights reload per tile — the systolic-array worst case).

Forms (per 128-element tile, data f32, idx int32 in [0,128)):
  m8_loop     build P once; 8 x dot((8,128), P)   (K=64 as 8 k-chunks)
  m8_single   build P; 1 x dot((8,128), P)        (K=8)
  m32         build P; dot((32,128), P)           (K=32)
  m64         build P; dot((64,128), P)           (K=64, one matmul)
  m64_bf16    same, data+P bf16 (rate ceiling; NOT contract-legal)
  m64_batch   one lax.dot_general with a batch dim over tiles
  m64_nobuild P preloaded f32 from HBM (isolates build vs weight-load)
  gbc64       VPU control: broadcast-idx take_along_axis on (64,128)
              tiles (the refuted K-in-sublane form, for the record)

Usage: python experiments/probe_permmm.py [form ...]
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


def _onehot(idx_row):
    # P[src, dst] = 1 iff idx[dst] == src  ->  (data @ P)[m, dst] = data[m, idx[dst]]
    src = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    return (src == idx_row[None, :]).astype(jnp.float32)


def _dot(a, p):
    return jax.lax.dot_general(
        a, p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def make_kernel(form: str, TT: int, M: int):
    def k_m_loop(i_ref, d_ref, o_ref, reps: int, Mi: int):
        for t in range(TT):
            p = _onehot(i_ref[t])
            for r in range(reps):
                o_ref[t, r * Mi : (r + 1) * Mi] = _dot(
                    d_ref[t, r * Mi : (r + 1) * Mi], p
                )

    if form == "m8_loop":
        return functools.partial(k_m_loop, reps=8, Mi=8)
    if form in ("m8_single", "m32", "m64"):
        return functools.partial(k_m_loop, reps=1, Mi=M)

    if form == "m64_bf16":

        def k_bf16(i_ref, d_ref, o_ref):
            for t in range(TT):
                p = _onehot(i_ref[t]).astype(jnp.bfloat16)
                o_ref[t] = jax.lax.dot_general(
                    d_ref[t].astype(jnp.bfloat16),
                    p,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        return k_bf16

    if form == "m64_batch":

        def k_batch(i_ref, d_ref, o_ref):
            src = jax.lax.broadcasted_iota(jnp.int32, (TT, 128, 128), 1)
            p = (src == i_ref[...][:, None, :]).astype(jnp.float32)
            o_ref[...] = jax.lax.dot_general(
                d_ref[...],
                p,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )

        return k_batch

    if form == "m64_nobuild":

        def k_nobuild(i_ref, p_ref, d_ref, o_ref):
            for t in range(TT):
                o_ref[t] = _dot(d_ref[t], p_ref[t])

        return k_nobuild

    if form == "gbc64":

        def k_gbc(i_ref, d_ref, o_ref):
            for t in range(TT):
                idx = jnp.broadcast_to(i_ref[t][None, :], (M, 128))
                o_ref[t] = jnp.take_along_axis(d_ref[t], idx, axis=1)

        return k_gbc

    raise KeyError(form)


FORMS = {  # form -> (M rows of data per tile, tiles per grid step)
    "m8_loop": (64, 32),
    "m8_single": (8, 64),
    "m32": (32, 32),
    "m64": (64, 32),
    "m64_bf16": (64, 32),
    "m64_batch": (64, 32),
    "m64_nobuild": (64, 16),
    "gbc64": (64, 32),
}


def build(form: str, n_tiles: int, iters: int):
    M, TT = FORMS[form]
    kernel = make_kernel(form, TT, M)
    grid = n_tiles // TT
    in_specs = [
        pl.BlockSpec((TT, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    if form == "m64_nobuild":
        in_specs.append(
            pl.BlockSpec(
                (TT, 128, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        )
    in_specs.append(
        pl.BlockSpec((TT, M, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    )

    call = functools.partial(
        pl.pallas_call,
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles, M, 128), jnp.float32),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (TT, M, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )

    @jax.jit
    def run(idx, data, p):
        def body(_, d):
            if form == "m64_nobuild":
                out = call()(idx, p, d)
            else:
                out = call()(idx, d)
            return d * 0.5 + out * 0.25

        return jnp.sum(jax.lax.fori_loop(0, iters, body, data))

    return run


def probe(form: str, n_tiles: int = 4096) -> None:
    M, TT = FORMS[form]
    if form == "m64_nobuild":
        n_tiles = min(n_tiles, 2048)  # 64 KB/tile of P planes
    rng = np.random.default_rng(0)
    idx = jnp.asarray(
        rng.integers(0, 128, size=(n_tiles, 128)).astype(np.int32)
    )
    data = jnp.asarray(
        rng.standard_normal((n_tiles, M, 128)).astype(np.float32)
    )
    p = None
    if form == "m64_nobuild":
        pn = np.zeros((n_tiles, 128, 128), np.float32)
        pn[
            np.arange(n_tiles)[:, None],
            np.asarray(idx),
            np.arange(128)[None, :],
        ] = 1.0
        p = jnp.asarray(pn)
    it1, it2 = 4, 20
    t0 = time.perf_counter()
    runs = {}
    try:
        for iters in (it1, it2):
            f = build(form, n_tiles, iters)
            _ = np.asarray(f(idx, data, p))  # compile + flush
            best = float("inf")
            for _rep in range(3):
                t1 = time.perf_counter()
                _ = np.asarray(f(idx, data, p))
                best = min(best, time.perf_counter() - t1)
            runs[iters] = best
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:140]
        print(f"{form:13s} FAIL: {msg}")
        return
    dt = runs[it2] - runs[it1]
    per_pass = dt / (it2 - it1)
    ns_tile = per_pass / n_tiles * 1e9
    gval = n_tiles * M * 128 / max(per_pass, 1e-12) / 1e9
    print(
        f"{form:13s} M={M:3d} {ns_tile:8.1f} ns/tile  {gval:8.1f} Gval/s"
        f"  pass={per_pass * 1e3:7.3f} ms/{n_tiles} tiles"
        f"  (compile+total {time.perf_counter() - t0:.0f}s)"
    )


if __name__ == "__main__":
    forms = sys.argv[1:] or list(FORMS)
    for f in forms:
        probe(f)
