#!/usr/bin/env python
"""Per-pass profile of the routed-gather SpMV pipeline.

The reference's cache-locality harness (run_locality.sh) drives VTune
over each solution's kernel symbol and tabulates L1/L2 hit ratios.  The
TPU-meaningful analogue is a per-PASS wall-clock table of the pipeline
(expand / route middle / reduce / y-route) plus each pass's achieved HBM
bandwidth — the bound every pass should be pushing.

Honest timing rules (docs/DESIGN.md): each measurement loop-carries a
fresh PRNG-seeded x through the pass prefix, re-deriving x from a
data-dependent (never-true) predicate so XLA can neither hoist the pass
out of the loop nor dead-code it; per-pass time is the difference of
consecutive prefix slopes.

Usage: python scripts/profile_passes.py [--scale 20] [--edge-factor 6]
       [--impl routed|window|dia] [--matrix rmat|banded]

--impl routed profiles the 5-pass pipeline; window/dia are single fused
kernels, so their profile is [x-table prep, full kernel] — the per-
solution entries of the run_locality.sh-style table.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=20)
    ap.add_argument("--edge-factor", type=int, default=6)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument(
        "--impl",
        default="routed",
        choices=["routed", "window", "dia", "bsr"],
    )
    ap.add_argument(
        "--matrix", default=None, choices=[None, "rmat", "banded"]
    )
    ap.add_argument(
        "--rhs", type=int, default=128,
        help="dense RHS columns for --impl bsr (SpMM)",
    )
    args = ap.parse_args()

    from cvr_tpu.utils import memarena

    memarena.warm()
    if args.matrix is None:
        args.matrix = "rmat" if args.impl == "routed" else "banded"
    rhs_k = args.rhs if args.impl == "bsr" else 0

    import jax
    import jax.numpy as jnp

    from cvr_tpu.bench.harness import HBM_BW, detect_chip
    from cvr_tpu.bench.synthetic import banded_matrix, rmat_matrix
    from cvr_tpu.formats.sell_routed import sell_pack_routed
    from cvr_tpu.ops import pallas_route as PR
    from cvr_tpu.ops.spmv_routed import spmv_routed, to_device_routed

    if args.matrix == "banded":
        coo = banded_matrix(1 << args.scale, bandwidth=27, seed=args.seed)
    else:
        coo = rmat_matrix(
            scale=args.scale, edge_factor=args.edge_factor, seed=args.seed
        )
    csr = coo.to_csr()
    print(f"matrix: {csr.shape[0]}x{csr.shape[1]}, {csr.nnz} nnz")

    if args.impl == "window":
        from cvr_tpu.formats.sell_window import sell_pack_window
        from cvr_tpu.ops.spmv_window import (
            _x_table,
            spmv_window,
            to_device_window,
        )

        t0 = time.perf_counter()
        sw = to_device_window(sell_pack_window(csr))
        print(f"pack: {time.perf_counter() - t0:.1f}s, W={sw.W}, "
              f"D={sw.D}, wrl={sw.wrl}, S_pad={sw.S_pad}")
        sd = sw
        prefixes_override = [
            ("x-table prep", lambda s, x: _x_table(
                s, x.astype(jnp.float32)
            ).reshape(-1)[:1]),
            ("+ fused window kernel = full",
             lambda s, x: spmv_window(s, x)),
        ]
    elif args.impl == "dia":
        from cvr_tpu.formats.dia import dia_pack
        from cvr_tpu.ops.pallas_dia import spmv_dia_pallas
        from cvr_tpu.ops.spmv_dia import spmv_dia_xla, to_device_dia

        t0 = time.perf_counter()
        sdd = to_device_dia(dia_pack(csr))
        print(f"pack: {time.perf_counter() - t0:.1f}s, nd={len(sdd.offsets)}")
        sd = sdd
        prefixes_override = [
            ("xla shifted-FMA", lambda s, x: spmv_dia_xla(s, x)),
            ("pallas roll kernel = full",
             lambda s, x: spmv_dia_pallas(s, x)),
        ]
    elif args.impl == "bsr":
        # the MXU SpMM path: per-brick [128,128]x[128,K] dot_generals.
        # Two alternatives profiled (not cumulative): the XLA
        # gather+segment-sum formulation vs the fused Pallas kernel with
        # scalar-prefetch X-block selection and revisited-output
        # accumulation (the default; ops/pallas_bsr.py).
        from cvr_tpu.formats.bsr import bsr_pack
        from cvr_tpu.ops.pallas_bsr import bsr_spmm_pallas
        from cvr_tpu.ops.spmm_bsr import spmm_bsr, to_device_bsr

        t0 = time.perf_counter()
        bm = bsr_pack(csr)
        sdb = to_device_bsr(bm)
        print(
            f"pack: {time.perf_counter() - t0:.1f}s, "
            f"bricks={bm.vals.shape[0]}, fill="
            f"{csr.nnz / max(bm.vals.size, 1):.3f}"
        )
        sd = sdb
        prefixes_override = [
            ("xla gather+segsum SpMM", lambda s, X: spmm_bsr(s, X)),
            ("pallas fused SpMM = full",
             lambda s, X: bsr_spmm_pallas(s, X)),
        ]
    else:
        prefixes_override = None
        t0 = time.perf_counter()
        sr = sell_pack_routed(csr)
        print(
            f"pack: {time.perf_counter() - t0:.1f}s, T={sr.T}, "
            f"S_pad={sr.S_pad}, fillers={sr.n_fillers}"
        )
        sd = to_device_routed(sr)
    ncols = sd.shape[1]

    def x2_of(x):
        return PR.expand_x_table(x, ncols, sd.segw, sd.n_segs)

    # Pass prefixes: each takes (device struct, x) — the struct must be
    # a jit ARGUMENT, not a closure, or the remote-compile payload
    # embeds the packed planes as constants (observed HTTP 413 at
    # 360 MB of window planes).
    def p_expand(s, x):
        if args.impl != "routed":
            return x
        return PR.expand(s.w8, s.gcls, s.seg_blk, s.li, x2_of(x), s.segw)

    def p_m1(s, x):
        g1 = p_expand(s, x)
        return PR._mid_fused_call(s.mid.Tk, "m1", PR.use_interpret())(
            g1, s.mid.m1
        )

    def p_csel(s, x):
        return PR.chunksel(p_m1(s, x), s.mid.csel, s.mid.Tk)

    def p_reduce(s, x):
        m = p_csel(s, x)
        parts = []
        for j, (r0, nr) in enumerate(s.ycall_rows):
            nsl = min(PR.YB, s.nslices - j * PR.YB)
            if nr == 0:
                parts.append(jnp.zeros((8, nsl, 128), jnp.float32))
                continue
            parts.append(
                PR.reduce_m3_slices(
                    s.emit[r0 : r0 + nr],
                    s.gemit[r0 // 8 : (r0 + nr) // 8],
                    m,
                    s.mid.m3,
                    s.vals_ss[:, r0 : r0 + nr],
                    s.p3[:, r0 : r0 + nr],
                    nsl,
                    ofs=r0 // PR.CH,
                )
            )
        return (
            parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
        )

    def p_full(s, x):
        return spmv_routed(s, x)

    prefixes = [
        ("expand (+stage1)", p_expand),
        ("+ middle M1", p_m1),
        ("+ chunk select", p_csel),
        ("+ reduce(M3,st3)", p_reduce),
        ("+ y-route = full", p_full),
    ]
    if prefixes_override is not None:
        prefixes = prefixes_override
    elif sd.mid.kind != "rec":
        prefixes = [prefixes[0], prefixes[-1]]

    def slope(fn):
        """Honest per-call seconds for fn over fresh PRNG x each iter."""

        def run(s_in, seed, iters):
            key = jax.random.PRNGKey(seed)

            def body(i, carry):
                acc, k = carry
                shp = (ncols, rhs_k) if rhs_k else (ncols,)
                x = jax.random.normal(k, shp, jnp.float32)
                out = fn(s_in, x)
                s2 = jnp.sum(out)
                # data-dependent fold: never true at runtime, opaque to
                # XLA -> the pass cannot be hoisted out of the loop
                k2 = jax.random.fold_in(
                    k, 1 + (s2 > 1e30).astype(jnp.int32)
                )
                return acc + s2, k2

            acc, _ = jax.lax.fori_loop(
                0, iters, body, (jnp.float32(0), key)
            )
            return acc

        runj = jax.jit(run, static_argnums=())
        _ = np.asarray(runj(sd, jnp.int32(0), jnp.int32(1)))  # compile

        def timed(L, seed):
            t0 = time.perf_counter()
            _ = np.asarray(runj(sd, jnp.int32(seed), jnp.int32(L)))
            return time.perf_counter() - t0

        L1 = 4
        w = timed(L1, 1)
        while w < 0.4 and L1 < (1 << 18):
            L1 *= 4
            w = timed(L1, 1)
        L2 = 5 * L1
        t1 = min(timed(L1, 10 + i) for i in range(args.repeats))
        t2 = min(timed(L2, 100 + i) for i in range(args.repeats))
        return max(t2 - t1, 1e-12) / (L2 - L1)

    # The PRNG + sum overhead itself (empty prefix).
    base = slope(lambda s, x: x)
    bw = HBM_BW[detect_chip()]
    times = []
    for name, fn in prefixes:
        t = slope(fn) - base
        times.append((name, t))
        print(f"  measured {name}: {t * 1e3:.3f} ms cumulative")

    stream_mb = (
        sd.T * 1024 * 4 / 1e6 if args.impl == "routed" else 0
    )
    print(f"\nchip: {detect_chip()}  stream: {stream_mb:.0f} MB/pass")
    print(f"{'pass':^36s} {'ms':>8s} {'GB/s':>8s}  traffic model")
    prev = 0.0
    traffic = {
        # bytes moved per pass (stream reads/writes + index planes)
        "expand (+stage1)": sd.T * 1024 * (4 + 2),
        "+ middle M1": sd.T * 1024 * (4 + 4 + 2),
        "+ chunk select": sd.T * 1024 * (4 + 4 + 2),
        "+ reduce(M3,st3) + y-route = full": sd.S_pad
        * 1024
        * (4 + 4 + 2 + 2),
    } if args.impl == "routed" else {
        "+ fused window kernel = full": getattr(sd, "S_pad", 0)
        * 1024 * (4 + 2),
        "xla shifted-FMA": len(getattr(sd, "offsets", ())) * csr.shape[0] * 8,
        "pallas roll kernel = full": len(getattr(sd, "offsets", ()))
        * csr.shape[0] * 4,
        # bsr: brick values streamed once + the X block per brick
        "xla gather+segsum SpMM": (
            getattr(sd, "vals", np.zeros(0)).size * 4
            + (
                getattr(sd, "vals", np.zeros((0, 128))).shape[0]
                * 128 * rhs_k * 4 * 2
            )
            if args.impl == "bsr"
            else 0
        ),
        "pallas fused SpMM = full": (
            getattr(sd, "vals", np.zeros(0)).size * 4
            + getattr(sd, "vals", np.zeros((0, 128))).shape[0]
            * 128 * rhs_k * 4
            if args.impl == "bsr"
            else 0
        ),
    }
    # dia/bsr rows are ALTERNATIVE implementations, not pipeline stages
    cumulative = args.impl not in ("dia", "bsr")
    for name, t in times:
        dt = (t - prev) if cumulative else t
        prev = t
        gbps = traffic.get(name, 0) / max(dt, 1e-12) / 1e9
        print(f"{name:36s} {dt * 1e3:8.3f} {gbps:8.0f}")
    full = times[-1][1]
    if rhs_k:
        print(
            f"\nfull SpMM (K={rhs_k}): {full * 1e3:.3f} ms = "
            f"{2 * csr.nnz * rhs_k / full / 1e9:.1f} useful GFLOPS"
        )
    else:
        print(
            f"\nfull SpMV: {full * 1e3:.3f} ms = "
            f"{csr.nnz / full / 1e9:.2f} Gnnz/s = "
            f"{2 * csr.nnz / full / 1e9:.2f} GFLOPS(2nnz), "
            f"{100 * csr.nnz * 8 / full / bw:.1f}% of naive 8B/nnz roofline"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
