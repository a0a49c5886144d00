#!/usr/bin/env python
"""Multi-host distributed SpMV launcher.

On a real v5e/v5p slice, run ONE copy of this script per host:

  python scripts/multihost_spmv.py --coordinator <host0>:8476 \
      --num-processes 4 --process-id $HOST_ID [--mtx file.mtx] [--iters 100]
      [--impl routed|window|dia|xla]

Each host calls jax.distributed.initialize, the global mesh spans every
chip in the slice, the matrix is row-partitioned by nnz across the global
device list, and x is all-gathered over ICI inside shard_map
(cvr_tpu.parallel.dist).  Single-host multi-chip runs work with no
coordinator flags.  This is the BASELINE.json config #5 entry point.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None, help="host0:port")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--mtx", default=None)
    ap.add_argument("--scale", type=int, default=18, help="rmat scale if no --mtx")
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--x-sharded", action="store_true", default=True)
    ap.add_argument(
        "--impl", default="routed",
        choices=["routed", "window", "dia", "xla", "routed2d", "bell",
                 "lane"],
        help="per-shard kernel (routed = the flagship Pallas pipeline; "
        "routed2d = the 2D row x col mesh, see --mesh2d)",
    )
    ap.add_argument(
        "--mesh2d", default=None, metavar="RxC",
        help="2D mesh shape for --impl routed2d (e.g. 4x2); default "
        "R = D//2, C = 2",
    )
    args = ap.parse_args()

    import jax

    if args.coordinator:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cvr_tpu.bench.harness import detect_chip, HBM_BW
    from cvr_tpu.bench.synthetic import rmat_matrix
    from cvr_tpu.io.mmio import read_matrix_market
    from cvr_tpu.parallel.dist import AXIS, dist_sell_pack, dist_spmv, make_mesh

    is_lead = jax.process_index() == 0
    devices = jax.devices()
    if is_lead:
        print(f"processes={jax.process_count()} devices={len(devices)}")

    if args.mtx:
        coo = read_matrix_market(args.mtx)
        name = args.mtx
    else:
        coo = rmat_matrix(scale=args.scale, edge_factor=6, seed=1)
        name = f"rmat{args.scale}"
    csr = coo.to_csr(sort_cols=False)

    mesh = make_mesh()
    t0 = time.perf_counter()
    if args.impl == "routed2d":
        from cvr_tpu.parallel.dist2d import (
            dist_routed_pack_2d,
            dist_spmv_routed_2d,
            make_mesh2d,
        )

        D = len(devices)
        if args.mesh2d:
            R, C = (int(v) for v in args.mesh2d.lower().split("x"))
        else:
            R, C = max(D // 2, 1), min(2, D)
        mesh = make_mesh2d(R, C)
        dm = dist_routed_pack_2d(csr, mesh)
        preproc = time.perf_counter() - t0
        x = np.ones(coo.shape[1], dtype=np.float32)
        step = jax.jit(lambda v: dist_spmv_routed_2d(dm, v))
        jax.block_until_ready(step(x))
        t0 = time.perf_counter()
        y = None
        for _ in range(args.iters):
            y = step(x)
        jax.block_until_ready(y)
        per = (time.perf_counter() - t0) / args.iters
        if is_lead:
            nnz = csr.nnz
            bw = HBM_BW[detect_chip()] * len(devices)
            print(f"[file: {name}] [threads: {R}x{C}mesh] "
                  f"Pre-processing Time: {preproc * 1e3:.3f} ms")
            print(f"[file: {name}] [threads: {R}x{C}mesh] "
                  f"SpMV Execution Time: {per * 1e3:.6f} ms")
            print(f"[file: {name}] [threads: {R}x{C}mesh] "
                  f"Throughput: {2 * nnz / per / 1e9:.3f} GFlops (2*nnz), "
                  f"{nnz / per / 1e9:.3f} Gnnz/s, "
                  f"{100 * nnz * 8.0 / per / bw:.1f}% of aggregate HBM "
                  f"roofline")
        return 0
    if args.impl == "bell":
        from cvr_tpu.parallel.dist_bell import (
            dist_bell_pack,
            dist_spmv_bell,
        )

        dm = dist_bell_pack(csr, mesh)
        fn = dist_spmv_bell
    elif args.impl == "lane":
        from cvr_tpu.parallel.dist_lane import (
            dist_lane_pack,
            dist_spmm_lane,
        )

        dm = dist_lane_pack(csr, mesh)
        fn = lambda d, v, x_sharded: dist_spmm_lane(
            d, v[:, None], x_sharded=x_sharded
        )[:, 0]
    elif args.impl == "routed":
        from cvr_tpu.parallel.dist_routed import (
            dist_routed_pack,
            dist_spmv_routed,
        )

        dm = dist_routed_pack(csr, mesh)
        fn = dist_spmv_routed
    elif args.impl == "window":
        from cvr_tpu.parallel.dist_window import (
            dist_spmv_window,
            dist_window_pack,
        )

        dm = dist_window_pack(csr, mesh)
        fn = dist_spmv_window
    elif args.impl == "dia":
        from cvr_tpu.parallel.dist_dia import dist_dia_pack, dist_spmv_dia

        dm = dist_dia_pack(csr, mesh)
        fn = dist_spmv_dia
    else:
        dm = dist_sell_pack(csr, mesh)
        fn = dist_spmv
    preproc = time.perf_counter() - t0

    x = np.ones(coo.shape[1], dtype=np.float32)
    D = mesh.devices.size
    ncp = -(-coo.shape[1] // D) * D
    xs = jax.device_put(
        np.pad(x, (0, ncp - coo.shape[1])) if args.x_sharded else x,
        NamedSharding(mesh, P(AXIS) if args.x_sharded else P(None)),
    )
    step = jax.jit(lambda v: fn(dm, v, x_sharded=args.x_sharded))
    jax.block_until_ready(step(xs))  # compile

    t0 = time.perf_counter()
    y = None
    for _ in range(args.iters):
        y = step(xs)
    jax.block_until_ready(y)
    per = (time.perf_counter() - t0) / args.iters

    if is_lead:
        nnz = csr.nnz
        gnnz = nnz / per / 1e9
        bw = HBM_BW[detect_chip()] * len(devices)
        print(f"[file: {name}] [threads: {len(devices)}chips] "
              f"Pre-processing Time: {preproc * 1e3:.3f} ms")
        print(f"[file: {name}] [threads: {len(devices)}chips] "
              f"SpMV Execution Time: {per * 1e3:.6f} ms")
        print(f"[file: {name}] [threads: {len(devices)}chips] "
              f"Throughput: {2 * nnz / per / 1e9:.3f} GFlops (2*nnz), "
              f"{gnnz:.3f} Gnnz/s, "
              f"{100 * nnz * 8.0 / per / bw:.1f}% of aggregate HBM roofline")
    return 0


if __name__ == "__main__":
    sys.exit(main())
