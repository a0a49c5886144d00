"""y = A @ x (and Y = A @ X) on the DIA artifact: shifted streaming FMAs.

Each diagonal contributes ``band_k * x[r + off_k]`` — a static slice of a
zero-padded x, so the whole SpMV is nd fused elementwise FMAs with zero
gathers.  XLA fuses the slices into one pass; the kernel is
HBM-bandwidth bound by the band planes (4 B/nnz), the roofline the other
formats can only approach.  (Reference best case: CVR's pure-streaming
phase 3 on regular rows, spmv.cpp:1351-1437.)
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from cvr_tpu.formats.dia import DiaMatrix


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["bands"],
    meta_fields=["offsets", "shape", "nnz"],
)
@dataclasses.dataclass(frozen=True)
class DiaDevice:
    bands: jax.Array  # (nd, nrows) f32
    offsets: tuple  # static python ints -> static slice starts
    shape: tuple[int, int]
    nnz: int


def to_device_dia(dm: DiaMatrix, device=None) -> DiaDevice:
    return DiaDevice(
        bands=jax.device_put(dm.bands, device=device),
        offsets=tuple(int(o) for o in dm.offsets),
        shape=dm.shape,
        nnz=dm.nnz,
    )


def spmv_dia(sd: DiaDevice, x: jax.Array) -> jax.Array:
    """y = A @ x via the fused Pallas roll kernel when the padded x fits
    VMEM (measured 62.8 vs 40.8 GFLOPS for the XLA path on banded-2M —
    the XLA path relayouts x once per non-128-multiple diagonal), else
    the XLA shifted-FMA path."""
    nrows, ncols = sd.shape
    reach = max(sd.offsets) - min(min(sd.offsets), 0)
    if (nrows + reach + 256 * 128) * 4 <= 24 * 1024 * 1024:
        from cvr_tpu.ops.pallas_dia import spmv_dia_pallas

        return spmv_dia_pallas(sd, x)
    return spmv_dia_xla(sd, x)


def spmv_dia_xla(sd: DiaDevice, x: jax.Array) -> jax.Array:
    """XLA shifted-FMA formulation (any size; one x relayout per
    unaligned diagonal)."""
    nrows, ncols = sd.shape
    lo = min(sd.offsets + (0,))
    hi = max(sd.offsets + (0,))
    # pad so every shifted slice is in-bounds: xp[i] = x[i - (-lo)]
    xp = jnp.pad(
        x.astype(jnp.float32), (max(-lo, 0), max(nrows + hi - ncols, 0))
    )
    y = jnp.zeros(nrows, jnp.float32)
    base = max(-lo, 0)
    for k, off in enumerate(sd.offsets):
        y = y + sd.bands[k] * jax.lax.dynamic_slice_in_dim(
            xp, base + off, nrows
        )
    return y


def spmm_dia(sd: DiaDevice, X: jax.Array) -> jax.Array:
    """Y = A @ X for dense X [ncols, K].

    Dispatches to the fused halo Pallas kernel (X streams through HBM
    once; measured 582 useful GFLOPS at K=128 on banded-1M — above the
    fused BSR MXU kernel's 494, with exact f32 and no densification);
    the XLA formulation (one X pass per diagonal, 305 GFLOPS) covers
    reaches beyond the halo block."""
    from cvr_tpu.ops.pallas_dia import RS, spmm_dia_pallas

    lo = min(sd.offsets + (0,))
    pad0 = -(-max(-lo, 0) // 8) * 8
    if pad0 + max(sd.offsets) < RS and len(sd.offsets) <= 128:
        return spmm_dia_pallas(sd, X)
    return spmm_dia_xla(sd, X)


def spmm_dia_xla(sd: DiaDevice, X: jax.Array) -> jax.Array:
    """XLA shifted-FMA SpMM (any reach; re-reads X once per diagonal)."""
    nrows, ncols = sd.shape
    lo = min(sd.offsets + (0,))
    hi = max(sd.offsets + (0,))
    Xp = jnp.pad(
        X.astype(jnp.float32),
        ((max(-lo, 0), max(nrows + hi - ncols, 0)), (0, 0)),
    )
    Y = jnp.zeros((nrows, X.shape[1]), jnp.float32)
    base = max(-lo, 0)
    for k, off in enumerate(sd.offsets):
        Y = Y + sd.bands[k][:, None] * jax.lax.dynamic_slice_in_dim(
            Xp, base + off, nrows, axis=0
        )
    return Y


@functools.lru_cache(maxsize=None)
def _jitted_spmv_dia():
    return jax.jit(spmv_dia)


@functools.lru_cache(maxsize=None)
def _jitted_spmm_dia():
    return jax.jit(spmm_dia)
