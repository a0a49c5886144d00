"""Fused Pallas DIA SpMV: lane-rolled shifted FMAs on a resident x block.

The XLA DIA path (ops/spmv_dia.py) materializes each shifted slice of x:
a diagonal offset that is not a multiple of 128 forces a lane relayout of
the whole vector per diagonal — measured 2.78 ms on banded-2M (27
diagonals), i.e. ~27 full-vector rotations of HBM traffic.  This kernel
keeps a (rows + reach) x-slab in VMEM per grid step and synthesizes each
shifted view in-register:

    rolled = pltpu.roll(x_slab, -s_lane, axis=1)       # one VPU op
    view   = where(lane < 128 - s_lane,
                   rolled[q : q + R], rolled[q + 1 : q + 1 + R])
    y     += band_k * view

i.e. one roll + one select + one FMA per diagonal per block — all static
(the offsets are compile-time constants), no HBM relayouts, the band
planes streaming at 4 B/nnz.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cvr_tpu.ops.pallas_route import use_interpret

# output rows per grid step (Rr sublane rows of 128 lanes)
RR = 256


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _dia_kernel(shifts: tuple, Wp: int, x_ref, b_ref, y_ref):
    c = pl.program_id(0)
    # aligned dynamic slab covering this block's rows + the reach
    base = pl.multiple_of(c * RR, 8)
    slab = x_ref[pl.ds(base, RR + Wp), :]
    acc = jnp.zeros((RR, 128), jnp.float32)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (RR, 128), 1)
    for k, s in enumerate(shifts):
        q, sl = s >> 7, s & 127
        if sl == 0:
            view = slab[q : q + RR, :]
        else:
            rolled = pltpu.roll(slab, 128 - sl, axis=1)
            view = jnp.where(
                lanes < 128 - sl,
                rolled[q : q + RR, :],
                rolled[q + 1 : q + 1 + RR, :],
            )
        acc = acc + b_ref[k] * view
    y_ref[...] = acc


@functools.lru_cache(maxsize=None)
def _dia_call(shifts: tuple, Hy: int, Wp: int, interpret: bool):
    grid = Hy // RR

    def fn(x2, bands3):
        return pl.pallas_call(
            functools.partial(_dia_kernel, shifts, Wp),
            grid=(grid,),
            out_shape=jax.ShapeDtypeStruct((Hy, 128), jnp.float32),
            in_specs=[
                # whole padded x resident (constant index -> fetched once)
                pl.BlockSpec(
                    (Hy + Wp, 128), lambda c: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (len(shifts), RR, 128), lambda c: (0, c, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (RR, 128), lambda c: (c, 0), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=48 * 1024 * 1024
            ),
        )(x2, bands3)

    return jax.jit(fn)


def spmv_dia_pallas(sd, x: jax.Array) -> jax.Array:
    """y = A @ x on a DiaDevice via the fused roll kernel.

    Equivalent to ops.spmv_dia.spmv_dia; preferred on hardware (the XLA
    path relayouts x once per diagonal).
    """
    nrows, ncols = sd.shape
    lo = min(sd.offsets + (0,))
    hi = max(sd.offsets + (0,))
    pad0 = _round_up(max(-lo, 0), 128)
    Hy = _round_up(max(nrows, 1), RR * 128) // 128
    # shifts are block-relative: element j of output block c reads
    # xp[c*RR*128 + shift + j]
    shifts = tuple(pad0 + off for off in sd.offsets)
    Wp = _round_up((max(shifts) >> 7) + 1, 8)
    xp_len = (Hy + Wp) * 128
    xp = jnp.pad(
        x.astype(jnp.float32),
        (pad0, xp_len - pad0 - ncols),
    ).reshape(Hy + Wp, 128)
    bands3 = jnp.pad(
        sd.bands, ((0, 0), (0, Hy * 128 - sd.bands.shape[1]))
    ).reshape(sd.bands.shape[0], Hy, 128)
    y = _dia_call(shifts, Hy, Wp, use_interpret())(xp, bands3)
    return y.reshape(-1)[:nrows]
