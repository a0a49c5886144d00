#!/usr/bin/env python
"""Probe the Mosaic primitives the routed-SpMV kernels depend on.

(a) dynamic middle-dim index into a 3D VMEM ref: data_ref[:, s, :]
(b) dynamic sublane slice + broadcast: data_ref[pl.ds(t, 1), :] -> (8,128)
(c) take_along_axis with idx upcast from an int16 plane
(d) conditional (8,128) store at dynamic row offset into a full-VMEM output
(e) scratch accumulator persisting across grid steps
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def ok(name, fn):
    try:
        fn()
        print(f"{name:10s} OK")
    except Exception as e:  # noqa: BLE001
        print(f"{name:10s} FAIL {str(e).splitlines()[0][:160]}")


def probe_a():
    K = 16

    def kernel(d_ref, i_ref, o_ref):
        def body(s, acc):
            op = d_ref[:, s, :]  # (8,128) dynamic middle index
            lo = jnp.bitwise_and(i_ref[:, 0, :].astype(jnp.int32), 127)
            hi = jax.lax.shift_right_logical(
                i_ref[:, 0, :].astype(jnp.int32), 7
            )
            cand = jnp.take_along_axis(op, lo, axis=1)
            return jnp.where(hi == s, cand, acc)

        o_ref[:, 0, :] = jax.lax.fori_loop(
            0, K, body, jnp.zeros((8, 128), jnp.float32)
        )

    d = jnp.asarray(np.random.rand(8, K, 128).astype(np.float32))
    idx = jnp.asarray(
        np.random.randint(0, K * 128, (8, 1, 128)).astype(np.int16)
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 1, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(d, idx)
    got = np.asarray(out)[:, 0, :]
    i = np.asarray(idx)[:, 0, :].astype(np.int64)
    want = np.asarray(d)[
        np.arange(8)[:, None], i >> 7, i & 127
    ]
    np.testing.assert_allclose(got, want)


def probe_bc():
    T = 4

    def kernel(d_ref, i_ref, o_ref):
        def tile(t, _):
            idx = i_ref[pl.ds(t * 8, 8), :].astype(jnp.int32)
            lo = jnp.bitwise_and(idx, 127)
            hi = jax.lax.shift_right_logical(idx, 7)
            acc = jnp.zeros((8, 128), jnp.float32)
            for s in range(8):
                row = d_ref[pl.ds(t * 8 + s, 1), :]  # (1,128) dynamic row
                op = jnp.broadcast_to(row, (8, 128))
                cand = jnp.take_along_axis(op, lo, axis=1)
                acc = jnp.where(hi == s, cand, acc)
            o_ref[pl.ds(t * 8, 8), :] = acc
            return 0

        jax.lax.fori_loop(0, T, tile, 0)

    d = jnp.asarray(np.random.rand(T * 8, 128).astype(np.float32))
    idxn = np.random.randint(0, 1024, (T * 8, 128)).astype(np.int16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T * 8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(d, jnp.asarray(idxn))
    got = np.asarray(out)
    dn = np.asarray(d).reshape(T, 1024)
    want = np.take_along_axis(
        dn, idxn.reshape(T, 1024).astype(np.int64), axis=1
    ).reshape(T * 8, 128)
    np.testing.assert_allclose(got, want)


def probe_de():
    # grid of 8 steps; scratch acc accumulates pairs of steps; every 2nd
    # step stores to a dynamic row of the full-VMEM output.
    S = 8

    def kernel(d_ref, o_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            o_ref[...] = jnp.zeros_like(o_ref)

        acc_ref[...] += d_ref[...]

        @pl.when(i % 2 == 1)
        def _():
            dst = i // 2
            o_ref[pl.ds(dst * 8, 8), :] = acc_ref[...]
            acc_ref[...] = jnp.zeros_like(acc_ref)

    d = jnp.asarray(np.random.rand(S * 8, 128).astype(np.float32))
    out = pl.pallas_call(
        kernel,
        grid=(S,),
        out_shape=jax.ShapeDtypeStruct((S // 2 * 8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (S // 2 * 8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )(d)
    got = np.asarray(out)
    dn = np.asarray(d).reshape(S, 8, 128)
    want = (dn[0::2] + dn[1::2]).reshape(-1, 128)
    np.testing.assert_allclose(got, want)


if __name__ == "__main__":
    which = sys.argv[1:] or ["a", "bc", "de"]
    if "a" in which:
        ok("3d-dyn", probe_a)
    if "bc" in which:
        ok("row-bcast", probe_bc)
    if "de" in which:
        ok("acc-store", probe_de)
