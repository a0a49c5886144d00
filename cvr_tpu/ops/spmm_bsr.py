"""Y = A @ X on the BSR-128 artifact: dense-brick SpMM on the MXU.

Per occupied brick: ``Y[rb*128:(rb+1)*128] += A_brick @ X[cb*128:(cb+1)
*128]`` — a [128,128] x [128,K] dense matmul.  The whole SpMM is one
batched dot_general over the brick stream (a per-brick gather of X
blocks on the way in) plus one sorted segment-sum into row blocks; XLA
maps the batched matmul straight onto the MXU.

Exactness: the matmul runs at ``precision=HIGHEST`` — XLA's 6-pass bf16
decomposition of f32 operands (both sides split into hi/mid/lo bf16
planes covering the 24-bit mantissa, cross terms accumulated in f32).
Measured ~5e-7 scaled error vs a float64 golden on heavy-tailed values,
the same verification contract as the SpMV paths (reference:
spmv.cpp:1916-1938).  NOTE a hand-rolled split (three bf16 planes + six
dots) is NOT safe here: XLA's algebraic simplifier merges
``dot(a,b)+dot(a,c)`` into ``dot(a,b+c)`` and the bf16 add absorbs the
low planes — letting XLA own the decomposition avoids the hazard and
halves format memory (f32 bricks, no duplicate planes).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from cvr_tpu.formats.bsr import B, BsrMatrix


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["vals", "brick_row", "brick_col"],
    meta_fields=["shape", "nnz", "nrb", "ncb"],
)
@dataclasses.dataclass(frozen=True)
class BsrDevice:
    vals: jax.Array  # (nbricks, B, B) f32 dense bricks
    brick_row: jax.Array  # (nbricks,) int32, non-decreasing
    brick_col: jax.Array
    shape: tuple[int, int]
    nnz: int
    nrb: int
    ncb: int


def to_device_bsr(bm: BsrMatrix, device=None) -> BsrDevice:
    put = functools.partial(jax.device_put, device=device)
    return BsrDevice(
        vals=put(bm.vals),
        brick_row=put(bm.brick_row),
        brick_col=put(bm.brick_col),
        shape=bm.shape,
        nnz=bm.nnz,
        nrb=_round_up(bm.shape[0], B) // B,
        ncb=_round_up(bm.shape[1], B) // B,
    )


def spmm_bsr(
    dev: BsrDevice,
    X: jax.Array,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Y = A @ X for dense X [ncols, K].

    precision=HIGHEST (default): XLA's 6-pass bf16 decomposition —
    f32-grade exact (~5e-7 scaled error), the framework's verification
    contract.  Measured HIGH (3-pass, ~3e-5 error) runs at the SAME
    speed as HIGHEST at K=128 on banded-1M: the path is bound by HBM
    traffic of the materialized X-block gather, not by MXU passes —
    exactness is free here.
    """
    nrows, ncols = dev.shape
    K = X.shape[1]
    Xp = jnp.pad(
        X.astype(jnp.float32), ((0, dev.ncb * B - ncols), (0, 0))
    ).reshape(dev.ncb, B, K)
    gx = Xp[dev.brick_col]  # (nbricks, B, K) block gather
    prod = jax.lax.dot_general(
        dev.vals,
        gx,
        (((2,), (1,)), ((0,), (0,))),
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    Y = jax.ops.segment_sum(
        prod,
        dev.brick_row,
        num_segments=dev.nrb,
        indices_are_sorted=True,
    )
    return Y.reshape(dev.nrb * B, K)[:nrows]


@functools.lru_cache(maxsize=None)
def _jitted_spmm_bsr():
    return jax.jit(spmm_bsr, static_argnames=("precision",))
