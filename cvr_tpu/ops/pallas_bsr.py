"""Fused Pallas BSR-128 SpMM kernel: gather-free dense-brick matmul.

The XLA BSR path (ops/spmm_bsr.py) materializes the per-brick X-block
gather and the per-brick products in HBM (~320 B of traffic per brick
element vs the ~128 B the math needs) — measured to be the bound at
K=128.  This kernel fuses the whole pipeline into one grid over the
brick stream:

  * the X block for brick i arrives via the BlockSpec index_map reading
    the scalar-prefetched ``brick_col`` — no materialized gather, and
    Mosaic skips the DMA entirely when consecutive bricks share a
    column block;
  * the output block index_map reads ``brick_row``: consecutive bricks
    of one row block revisit the same output block, which therefore
    stays resident in VMEM and is flushed once per row block (the
    standard Pallas revisited-output accumulation pattern) — the
    segment-sum disappears;
  * the brick matmul runs at ``precision=HIGHEST`` inside the kernel
    (Mosaic's own multi-pass bf16 decomposition; hand-rolled splits are
    unnecessary here and the XLA dot-merge hazard documented in
    spmm_bsr.py does not exist inside a kernel).

Same numerics contract as the XLA path (~1.5e-7 scaled error vs the
float64 golden).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cvr_tpu.formats.bsr import B
from cvr_tpu.ops.pallas_route import use_interpret

__all__ = ["bsr_spmm_pallas"]


def _bsr_kernel(brow_ref, bcol_ref, vals_ref, x_ref, y_ref):
    i = pl.program_id(0)
    prev = brow_ref[jnp.maximum(i - 1, 0)]
    first = jnp.logical_or(i == 0, brow_ref[i] != prev)

    @pl.when(first)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    y_ref[...] += jax.lax.dot_general(
        vals_ref[0],
        x_ref[0],
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )[None]


@functools.lru_cache(maxsize=None)
def _bsr_call(nbricks: int, ncb: int, nrb: int, K: int, interpret: bool):
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # brick_row, brick_col
        grid=(nbricks,),
        in_specs=[
            pl.BlockSpec(
                (1, B, B), lambda i, br, bc: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, B, K), lambda i, br, bc: (bc[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, B, K), lambda i, br, bc: (br[i], 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    def fn(brow, bcol, vals, xb):
        return pl.pallas_call(
            _bsr_kernel,
            grid_spec=spec,
            out_shape=jax.ShapeDtypeStruct((nrb, B, K), jnp.float32),
            interpret=interpret,
        )(brow, bcol, vals, xb)

    return jax.jit(fn)


def bsr_spmm_pallas(dev, X: jax.Array) -> jax.Array:
    """Y = A @ X on a BsrDevice via the fused kernel.

    K is padded to a lane multiple (128); rows of X to the column-block
    grid.  Bricks must be sorted by row block (bsr_pack guarantees it).
    """
    nrows, ncols = dev.shape
    K = X.shape[1]
    Kp = -(-K // 128) * 128
    Xp = jnp.pad(
        X.astype(jnp.float32),
        ((0, dev.ncb * B - ncols), (0, Kp - K)),
    ).reshape(dev.ncb, B, Kp)
    nb = int(dev.brick_row.shape[0])
    Y = _bsr_call(nb, dev.ncb, dev.nrb, Kp, use_interpret())(
        dev.brick_row, dev.brick_col, dev.vals, Xp
    )
    return Y.reshape(dev.nrb * B, Kp)[:nrows, :K]


@functools.lru_cache(maxsize=None)
def _jitted_bsr_spmm_pallas():
    return jax.jit(bsr_spmm_pallas)
