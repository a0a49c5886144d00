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
    # columns beyond the last reachable row (nrows-1 + max offset) are
    # never read; slicing keeps the tail pad non-negative for wide
    # rectangular matrices (ncols >> nrows).  Reachable count is always
    # <= xp_len - pad0 because max(shifts) < Wp*128.
    xr = min(ncols, xp_len - pad0)
    xp = jnp.pad(
        x[:xr].astype(jnp.float32),
        (pad0, xp_len - pad0 - xr),
    ).reshape(Hy + Wp, 128)
    bands3 = jnp.pad(
        sd.bands, ((0, 0), (0, Hy * 128 - sd.bands.shape[1]))
    ).reshape(sd.bands.shape[0], Hy, 128)
    y = _dia_call(shifts, Hy, Wp, use_interpret())(xp, bands3)
    return y.reshape(-1)[:nrows]


# ---------------------------------------------------------------------------
# Fused DIA SpMM: Y[r, :] += band_k[r] * X[r + off_k, :].  With K in the
# lane dimension the diagonal shifts move along SUBLANES — static slices,
# no rolls at all.  Each grid step reads its X block plus the next one
# (the halo), so X streams through HBM exactly once instead of once per
# diagonal (the XLA path's bound: measured 305 useful GFLOPS at K=128 on
# banded-1M vs 494 for the fused BSR MXU kernel).
# ---------------------------------------------------------------------------

RS = 1024  # output rows per grid step


def _dia_spmm_kernel(shifts: tuple, xa_ref, xb_ref, bt_ref, y_ref):
    acc = jnp.zeros((RS, 128), jnp.float32)
    for k, s in enumerate(shifts):
        b = jnp.broadcast_to(bt_ref[:, k : k + 1], (RS, 128))
        if s == 0:
            acc = acc + b * xa_ref[...]
        else:
            view = jnp.concatenate(
                [xa_ref[s:, :], xb_ref[:s, :]], axis=0
            )
            acc = acc + b * view
    y_ref[...] = acc


@functools.lru_cache(maxsize=None)
def _dia_spmm_call(shifts: tuple, Hy: int, Kb: int, interpret: bool):
    grid = (Hy // RS, Kb)

    def fn(xp, bandsT):
        return pl.pallas_call(
            functools.partial(_dia_spmm_kernel, shifts),
            grid=grid,
            out_shape=jax.ShapeDtypeStruct((Hy, Kb * 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(
                    (RS, 128), lambda c, kb: (c, kb),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(  # halo: the next row block
                    (RS, 128), lambda c, kb: (c + 1, kb),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(  # per-row band values, one lane per diag
                    (RS, 128), lambda c, kb: (c, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (RS, 128), lambda c, kb: (c, kb),
                memory_space=pltpu.VMEM,
            ),
            interpret=interpret,
        )(xp, xp, bandsT)

    return jax.jit(fn)


def spmm_dia_pallas(sd, X: jax.Array) -> jax.Array:
    """Y = A @ X on a DiaDevice via the fused halo kernel.

    Requires the diagonal reach to fit one row block (reach < 1024 rows
    after front alignment) and at most 128 diagonals; callers fall back
    to the XLA path otherwise (ops.spmv_dia.spmm_dia dispatches).
    """
    nrows, ncols = sd.shape
    K = X.shape[1]
    Kb = -(-K // 128)
    lo = min(sd.offsets + (0,))
    pad0 = _round_up(max(-lo, 0), 8)
    shifts = tuple(pad0 + off for off in sd.offsets)
    if max(shifts) >= RS or len(shifts) > 128:
        raise ValueError("diagonal reach exceeds the halo block")
    Hy = _round_up(max(nrows, 1), RS)
    # one extra zero block so the halo read at the last step is in range.
    # X rows beyond the last reachable one (nrows-1 + max offset) are
    # never read; slicing keeps the tail pad non-negative for wide
    # rectangular matrices (reachable <= Hy + RS - pad0 since
    # max(shifts) < RS).
    xr = min(ncols, Hy + RS - pad0)
    xp = jnp.pad(
        X[:xr].astype(jnp.float32),
        ((pad0, Hy + RS - pad0 - xr), (0, Kb * 128 - K)),
    )
    bandsT = jnp.zeros((Hy, 128), jnp.float32)
    bandsT = bandsT.at[: sd.bands.shape[1], : len(shifts)].set(
        sd.bands.T.astype(jnp.float32)
    )
    y = _dia_spmm_call(shifts, Hy, Kb, use_interpret())(xp, bandsT)
    return y[:nrows, :K]
