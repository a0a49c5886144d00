"""Distributed SpMV with the FAST window kernel running per shard.

cvr_tpu.parallel.dist runs the XLA segment-sum SpMV inside shard_map —
simple, but scalar-gather-rate on real hardware.  This module is the
full-strength design: each device executes the fused SELL-W Pallas
kernel (cvr_tpu/ops/pallas_window.py) on its own nnz-balanced row shard,
with the dense x all-gathered over the mesh axis (ICI) first — the
BASELINE.json north-star configuration with the production kernel in the
per-shard slot.

shard_map requires one program and identical local shapes, so the packer
(a) pins one (D, W) window geometry feasible for EVERY shard, and
(b) splices each shard's plane rows so all shards share the same
per-reduce-call row counts (zero rows with emit = -1 are invisible to
the kernel).  The reference's analogue of (a)/(b) is its per-thread
nnz-balanced shards all running one kernel binary (spmv.cpp:577-667).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from cvr_tpu.formats.csr import CSRMatrix
from cvr_tpu.formats.sell_window import (
    SEGW_WIN,
    SellWindow,
    WindowInfeasible,
    sell_pack_window,
)
from cvr_tpu.ops.pallas_window import CH, YB, group_emit_encode, window_reduce
from cvr_tpu.parallel.dist import AXIS
from cvr_tpu.parallel.partition import (
    partition_balance,
    partition_rows_by_nnz,
)

# cost order mirrors the single-chip packer's estimate ordering
_CANDIDATES = [(1, 1024), (2, 1024), (4, 1024), (1, 2048), (2, 2048),
               (4, 2048)]


@dataclass
class DistWindowMatrix:
    """Row-sharded SELL-W planes stacked on a leading device axis."""

    planes: dict  # name -> jnp array, leading axis = n_shards
    bounds: np.ndarray  # [n_shards + 1] global row bounds
    unpad_index: jax.Array  # [nrows] -> flat index into stacked local y
    ycall_rows: tuple  # shared (start, rows) per reduce call
    shape: tuple[int, int]
    nnz: int
    W: int
    D: int
    G: int
    segw: int
    n_segs: int
    nslices_u: int
    rows_max: int
    wrl: int
    mesh: Mesh
    balance: dict | None = None  # partition_balance diagnostics

    @property
    def n_shards(self) -> int:
        return int(self.bounds.shape[0] - 1)


def _splice_uniform(shards: list[SellWindow]):
    """Pad every shard's per-reduce-call row count to the max across
    shards so all locals share one geometry.  Returns per-shard arrays
    plus the shared ycall_rows."""
    nslices_u = max(s.nslices for s in shards)
    n_ycalls = max(1, -(-nslices_u // YB))
    rows_max = np.zeros(n_ycalls, dtype=np.int64)
    for s in shards:
        for j in range(n_ycalls):
            if j < s.ycall_rows.shape[0]:
                rows_max[j] = max(rows_max[j], s.ycall_rows[j][1])
    starts = np.zeros(n_ycalls, dtype=np.int64)
    np.cumsum(rows_max[:-1], out=starts[1:])
    ycall_rows = tuple(
        (int(starts[j]), int(rows_max[j])) for j in range(n_ycalls)
    )
    S_u = int(rows_max.sum())

    out = []
    for s in shards:
        vals = np.zeros((8, S_u, 128), dtype=np.float32)
        li = np.zeros((8, S_u, 128), dtype=np.int16)
        w10 = np.zeros(S_u, dtype=np.int32)
        emit = np.full(S_u, -1, dtype=np.int32)
        seg_blk = np.zeros(S_u // CH, dtype=np.int32)
        for j in range(n_ycalls):
            if j >= s.ycall_rows.shape[0]:
                continue
            r0, nr = (int(v) for v in s.ycall_rows[j])
            d0 = int(starts[j])
            vals[:, d0 : d0 + nr] = s.vals_ss[:, r0 : r0 + nr]
            li[:, d0 : d0 + nr] = s.li[:, r0 : r0 + nr]
            w10[d0 : d0 + nr] = s.w10[r0 : r0 + nr]
            emit[d0 : d0 + nr] = s.emit[r0 : r0 + nr]
            seg_blk[d0 // CH : (d0 + nr) // CH] = s.seg_blk[
                r0 // CH : (r0 + nr) // CH
            ]
        out.append((vals, li, w10, emit, seg_blk))
    return out, ycall_rows, nslices_u


def dist_window_pack(
    csr: CSRMatrix, mesh: Mesh, segw: int = SEGW_WIN
) -> DistWindowMatrix:
    """Partition rows by nnz, SELL-W-pack each shard with one shared
    (D, W) geometry, splice to uniform shapes, stack + device_put.

    Raises WindowInfeasible when no geometry fits every shard (then use
    the XLA dist path or shard the routed format)."""
    n_shards = mesh.devices.size
    bounds = partition_rows_by_nnz(csr.rowptr, n_shards)
    locals_ = []
    for i in range(n_shards):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        locals_.append(
            CSRMatrix(
                rowptr=csr.rowptr[lo : hi + 1] - csr.rowptr[lo],
                cols=csr.cols[csr.rowptr[lo] : csr.rowptr[hi]],
                vals=csr.vals[csr.rowptr[lo] : csr.rowptr[hi]],
                shape=(hi - lo, csr.shape[1]),
            )
        )

    shards = None
    for cand in _CANDIDATES:
        try:
            shards = [
                sell_pack_window(lc, segw=segw, force_dw=cand)
                for lc in locals_
            ]
            break
        except WindowInfeasible:
            continue
    if shards is None:
        raise WindowInfeasible(
            "no window geometry fits every row shard — use the routed "
            "format or the XLA dist path"
        )

    spliced, ycall_rows, nslices_u = _splice_uniform(shards)
    rows_max = max(int(b) for b in (bounds[1:] - bounds[:-1]))

    planes_np = {
        "vals_ss": np.stack([t[0] for t in spliced]),
        "li": np.stack([t[1] for t in spliced]),
        "w10": np.stack([t[2] for t in spliced]),
        "emit": np.stack([t[3] for t in spliced]),
        "seg_blk": np.stack([t[4] for t in spliced]),
        "gemit": np.stack([group_emit_encode(t[3]) for t in spliced]),
    }
    sharding = NamedSharding(mesh, P(AXIS))
    planes = {k: jax.device_put(v, sharding) for k, v in planes_np.items()}

    nrows = csr.shape[0]
    row_ids = np.arange(nrows, dtype=np.int64)
    shard_of_row = (
        np.searchsorted(bounds, row_ids, side="right").astype(np.int64) - 1
    )
    local_idx = row_ids - bounds[shard_of_row]
    if n_shards * rows_max >= 2**31:
        raise ValueError(
            "stacked local-y index exceeds int32 range "
            f"({n_shards} shards x {rows_max} padded rows)"
        )
    unpad = (shard_of_row * rows_max + local_idx).astype(np.int32)

    s0 = shards[0]
    return DistWindowMatrix(
        planes=planes,
        bounds=bounds,
        unpad_index=jax.device_put(unpad, NamedSharding(mesh, P(None))),
        ycall_rows=ycall_rows,
        shape=csr.shape,
        nnz=csr.nnz,
        W=s0.W,
        D=s0.D,
        G=s0.G,
        segw=s0.segw,
        n_segs=s0.n_segs,
        nslices_u=nslices_u,
        rows_max=rows_max,
        # shard_map needs one program: the candidate class is the max
        # over shards (each shard's offsets stay within its own class)
        wrl=max(sh.wrl or (sh.W // 128) for sh in shards),
        mesh=mesh,
        balance=partition_balance(csr.rowptr, bounds),
    )


def dist_spmv_window(
    dm: DistWindowMatrix, x: jax.Array, x_sharded: bool = False
) -> jax.Array:
    """y = A @ x across the mesh with the fused window kernel per shard.

    x_sharded=True all-gathers a row-sharded x over the mesh axis (ICI)
    inside shard_map before the per-shard kernel (BASELINE config #5)."""
    from cvr_tpu.ops.spmv_window import _x_table

    nrows, ncols = dm.shape
    D_shards = dm.n_shards
    if x_sharded:
        ncp = -(-ncols // D_shards) * D_shards
        if x.shape[0] != ncp:
            x = jnp.pad(x, (0, ncp - x.shape[0]))
    x_spec = P(AXIS) if x_sharded else P(None)

    class _XGeom:  # minimal view for _x_table
        shape = dm.shape
        segw = dm.segw
        n_segs = dm.n_segs
        G = dm.G

    def fn(vals, li, w10, emit, seg_blk, gemit, xs):
        x_full = (
            jax.lax.all_gather(xs, AXIS, tiled=True)[:ncols]
            if x_sharded
            else xs
        )
        x3 = _x_table(_XGeom, x_full.astype(jnp.float32))
        vals, li, w10, emit, seg_blk, gemit = (
            vals[0], li[0], w10[0], emit[0], seg_blk[0], gemit[0]
        )
        parts = []
        for j, (r0, nr) in enumerate(dm.ycall_rows):
            nsl = min(YB, dm.nslices_u - j * YB)
            if nr == 0:
                parts.append(jnp.zeros((8, nsl, 128), jnp.float32))
                continue
            parts.append(
                window_reduce(
                    emit[r0 : r0 + nr],
                    w10[r0 : r0 + nr],
                    seg_blk[r0 // CH : (r0 + nr) // CH],
                    gemit[r0 // 8 : (r0 + nr) // 8],
                    li[:, r0 : r0 + nr],
                    vals[:, r0 : r0 + nr],
                    x3,
                    nsl,
                    dm.W,
                    dm.segw,
                    dm.G,
                    wrl=dm.wrl,
                )
            )
        ys = (
            parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
        )
        flat = jnp.transpose(ys, (1, 0, 2)).reshape(dm.nslices_u, 1024)
        if dm.D > 1:
            flat = flat.reshape(
                dm.nslices_u, 1024 // dm.D, dm.D
            ).sum(axis=2)
        return flat.reshape(-1)[: dm.rows_max][None]

    mapped = shard_map(
        fn,
        mesh=dm.mesh,
        in_specs=(P(AXIS),) * 6 + (x_spec,),
        out_specs=P(AXIS),
        # pallas_call's out_shape carries no vma annotation; per-shard
        # kernel outputs are trivially device-varying
        check_vma=False,
    )
    y_stacked = mapped(
        dm.planes["vals_ss"],
        dm.planes["li"],
        dm.planes["w10"],
        dm.planes["emit"],
        dm.planes["seg_blk"],
        dm.planes["gemit"],
        x,
    )
    return jnp.take(y_stacked.reshape(-1), dm.unpad_index, axis=0)


def dist_spmv_window_jit(dm: DistWindowMatrix, x_sharded: bool = False):
    return jax.jit(
        functools.partial(dist_spmv_window, dm, x_sharded=x_sharded)
    )
