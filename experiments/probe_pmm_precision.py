#!/usr/bin/env python
"""PMM numerics probe: cost AND exactness of (K,128)@(128,128) one-hot
permutation matmuls per MXU precision strategy (v5e).

The m32=31.3 ns/tile headline in probe_permmm.py was measured at
Precision.DEFAULT, which on TPU truncates f32 operands to bf16 for the
MXU — fine for the 0/1 permutation plane P, NOT fine for the gathered
x values (the 1e-6 row-scaled contract needs f32 products).  Measured
(v5e chip, 2026-08-19, M=32 rows of data per 128-wide tile):

  form  strategy                                   max rel err   ns/tile
  d     Precision.DEFAULT (bf16x1)                 3.89e-03      31.3
  h     Precision.HIGH                             unsupported by Mosaic
  hh    Precision.HIGHEST (full f32 decomposition) 0.0           65.5
  s2    2-way bf16 split of the data               7.61e-06      ~16
  s3    3-way bf16 split of the data               0.0 (EXACT)   16.0

The s3 form is the PMM kernel's choice: x = hi + mid + lo with three
bf16 parts is an EXACT split of an f32 (24 = 3x8 mantissa bits), the
one-hot P is exact in bf16, and three bf16 MXU passes measure FASTER
than one f32-DEFAULT pass (half the operand bytes through VMEM).  It is
also 4x cheaper than HIGHEST, which splits BOTH operands even though a
permutation plane needs no splitting.

Verdict used by ops/spmm_pmm.py; see docs/DESIGN.md round 5.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, TT, NT = 32, 32, 4096


def _onehot(idx_row, dtype):
    src = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    return (src == idx_row[None, :]).astype(dtype)


def _dot(a, p, **kw):
    return jax.lax.dot_general(
        a, p, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, **kw
    )


def make_kernel(form: str):
    def k(i_ref, d_ref, o_ref):
        for t in range(TT):
            x = d_ref[t]
            if form in ("s2", "s3"):
                p = _onehot(i_ref[t], jnp.bfloat16)
                hi = x.astype(jnp.bfloat16)
                r1 = x - hi.astype(jnp.float32)
                acc = _dot(hi, p)
                if form == "s3":
                    mid = r1.astype(jnp.bfloat16)
                    lo = (r1 - mid.astype(jnp.float32)).astype(
                        jnp.bfloat16
                    )
                    acc += _dot(mid, p)
                    acc += _dot(lo, p)
                else:
                    acc += _dot(r1.astype(jnp.bfloat16), p)
                o_ref[t] = acc
            else:
                prec = {
                    "d": jax.lax.Precision.DEFAULT,
                    "hh": jax.lax.Precision.HIGHEST,
                }[form]
                o_ref[t] = _dot(x, _onehot(i_ref[t], jnp.float32),
                                precision=prec)

    return k


def main():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(
        rng.integers(0, 128, (NT, 128)).astype(np.int32)
    )
    dn = rng.standard_normal((NT, M, 128)).astype(np.float32)
    data = jnp.asarray(dn)
    ref = np.take_along_axis(
        dn,
        np.broadcast_to(np.asarray(idx)[:, None, :], (NT, M, 128)),
        axis=2,
    )
    for form in ("d", "hh", "s3", "s2"):
        call = functools.partial(
            pl.pallas_call,
            make_kernel(form),
            out_shape=jax.ShapeDtypeStruct((NT, M, 128), jnp.float32),
            grid=(NT // TT,),
            in_specs=[
                pl.BlockSpec((TT, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TT, M, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TT, M, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )

        def build(iters):
            @jax.jit
            def run(i_, d_):
                def body(_, d):
                    return d * 0.5 + call()(i_, d) * 0.25

                return jnp.sum(jax.lax.fori_loop(0, iters, body, d_))

            return run

        out = np.asarray(jax.jit(lambda i_, d_: call()(i_, d_))(idx, data))
        err = np.max(np.abs(out - ref) / np.maximum(np.abs(ref), 1e-30))
        f1, f2 = build(4), build(20)
        _ = np.asarray(f1(idx, data))
        _ = np.asarray(f2(idx, data))
        best = float("inf")
        for _rep in range(3):
            t = time.perf_counter()
            _ = np.asarray(f2(idx, data))
            d2 = time.perf_counter() - t
            t = time.perf_counter()
            _ = np.asarray(f1(idx, data))
            best = min(best, (d2 - (time.perf_counter() - t)) / 16)
        print(f"{form:3s} err={err:.2e}  {best / NT * 1e9:7.1f} ns/tile")


if __name__ == "__main__":
    main()
