"""BELL SpMV: one fused gather-MAC kernel + optional routed spill.

y comes out of the kernel already row-major (no route, no reduce, no
y-route — see ops/pallas_bell.py); the spill residual (rows deeper than
k planes or entries past the reach cap) adds a routed SpMV on a matrix
that is a few percent of the nnz.  Reference context: this is the road
domain answer (spmv.cpp:1197-1233, paper Table 3 road_usa 9.57 GFLOPS).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from cvr_tpu.formats.bell import BellMatrix
from cvr_tpu.ops.pallas_bell import bell_gather_mac
from cvr_tpu.ops.spmv_routed import (
    SellRoutedDevice,
    spmv_routed,
    to_device_routed,
)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["li", "vals", "spill", "spill_map"],
    meta_fields=["shape", "reach", "k", "d", "pre", "ncand", "TBb"],
)
@dataclasses.dataclass(frozen=True)
class BellDevice:
    li: jax.Array  # (k, R_sub, 128) int16
    vals: jax.Array  # (k, R_sub, 128) f32
    spill: SellRoutedDevice | None
    spill_map: jax.Array | None  # natural rows of the compressed spill
    shape: tuple
    reach: int
    k: int
    d: int
    pre: int
    ncand: int
    TBb: int


def to_device_bell(bm: BellMatrix, device=None) -> BellDevice:
    put = functools.partial(jax.device_put, device=device)
    return BellDevice(
        li=put(bm.li),
        vals=put(bm.vals),
        spill=(
            to_device_routed(bm.spill, device)
            if bm.spill is not None
            else None
        ),
        spill_map=(
            put(np.asarray(bm.spill_map, dtype=np.int32))
            if bm.spill_map is not None
            else None
        ),
        shape=bm.shape,
        reach=bm.reach,
        k=bm.k,
        d=bm.d,
        pre=bm.pre,
        ncand=bm.ncand,
        TBb=bm.TBb,
    )


def spmv_bell(sd: BellDevice, x: jax.Array) -> jax.Array:
    """y = A @ x via BELL planes (+ routed spill), jit-compatible."""
    nrows, ncols = sd.shape
    R_sub = sd.li.shape[1]
    x = x.astype(jnp.float32)
    # x table: pre zeros (negative-reach phase) + x + tail out to one
    # whole extra grid block for the halo spec
    X = R_sub + sd.TBb * 8
    # in-plane columns never exceed nrows-1 + reach < (X - pre)*128;
    # wide-rectangular tails live in the spill (which sees the full x)
    n_keep = min(ncols, (X - sd.pre) * 128)
    xt = jnp.zeros(X * 128, jnp.float32)
    xt = jax.lax.dynamic_update_slice(xt, x[:n_keep], (sd.pre * 128,))
    y2 = bell_gather_mac(
        sd.li, sd.vals, xt.reshape(X, 128), sd.d, sd.ncand, sd.TBb
    )
    y = y2.reshape(-1)[:nrows]
    if sd.spill is not None:
        # the spill is row-compressed: route its y back through the map
        yc = spmv_routed(sd.spill, x)
        y = y.at[sd.spill_map].add(yc, mode="drop")
    return y


def spmm_bell(sd: BellDevice, X: jax.Array) -> jax.Array:
    """Y = A @ X for dense X [ncols, K] via K vmapped BELL SpMVs."""
    return jax.vmap(lambda col: spmv_bell(sd, col), in_axes=1, out_axes=1)(
        X
    )


@functools.lru_cache(maxsize=None)
def _jitted_spmv_bell():
    return jax.jit(spmv_bell)


@functools.lru_cache(maxsize=None)
def _jitted_spmm_bell():
    return jax.jit(spmm_bell)
