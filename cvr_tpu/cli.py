"""Command-line driver.

Reproduces the reference's UX — ``./spmv.cvr <file.mtx> <threads> <iters>``
(spmv.cpp:1693-1712, README.md:26-28) — as subcommands:

  python -m cvr_tpu.cli spmv <file.mtx> [--iters N]
      [--format auto|bell|dia|routed|window|sell|csr|bsr|lane|pmm]
      [--rhs K] [--c C]
      [--sigma S] [--no-verify]
      [--save-packed out.npz] [--load-packed in.npz]
  python -m cvr_tpu.cli compare <file.mtx> [--iters N] [--rhs K]
  python -m cvr_tpu.cli info <file.mtx>

``compare`` runs every implementation on the same matrix and prints the
greppable metric table, mirroring run_comparison.sh.  ``--threads`` is
accepted for reference CLI compatibility and ignored (parallelism on TPU
comes from the mesh, not a thread count).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _load(path: str, pattern_values: str):
    from cvr_tpu.io.mmio import read_matrix_market

    t0 = time.perf_counter()
    coo = read_matrix_market(path, pattern_values=pattern_values)
    print(
        f"[file: {path}] read {coo.shape[0]}x{coo.shape[1]}, "
        f"{coo.nnz} nnz in {time.perf_counter() - t0:.2f}s"
    )
    return coo


def cmd_spmv(args) -> int:
    from cvr_tpu.bench.harness import run_spmv_benchmark

    coo = _load(args.matrix, args.pattern_values)

    if args.rhs > 1:
        return _spmm(args, coo)

    if args.format == "bsr":
        print(
            "error: --format bsr is an SpMM format (dense 128x128 "
            "bricks on the MXU); use it with --rhs K > 1",
            file=sys.stderr,
        )
        return 2

    if args.load_packed:
        return _spmv_prepacked(args, coo)

    impl = {
        "auto": "auto",
        "bell": "bell",
        "dia": "dia",
        "routed": "sell-routed",
        "sell-routed": "sell-routed",
        "window": "sell-window",
        "sell-window": "sell-window",
        "sell": "sell-xla",
        "csr": "csr",
    }[args.format]
    r = run_spmv_benchmark(
        coo,
        name=args.matrix,
        impl=impl,
        iters=args.iters,
        C=args.c,
        sigma=args.sigma,
        verify_result=not args.no_verify,
    )
    r.print_report()
    if args.save_packed:
        if impl == "sell-routed":
            from cvr_tpu.formats.sell_routed import (
                save_routed,
                sell_pack_routed,
            )

            save_routed(sell_pack_routed(coo.to_csr()), args.save_packed)
        elif impl == "sell-window":
            from cvr_tpu.formats.sell_window import sell_pack_window

            sell_pack_window(coo.to_csr()).save(args.save_packed)
        elif impl == "dia":
            from cvr_tpu.formats.dia import dia_pack

            dia_pack(coo.to_csr()).save(args.save_packed)
        elif impl == "bell":
            from cvr_tpu.formats.bell import bell_pack, save_bell

            save_bell(bell_pack(coo.to_csr()), args.save_packed)
        elif impl == "auto":
            from cvr_tpu.formats import pack_auto
            from cvr_tpu.formats.sell_routed import SellRouted, save_routed

            packed = pack_auto(coo.to_csr())
            if isinstance(packed, SellRouted):
                save_routed(packed, args.save_packed)
            else:
                packed.save(args.save_packed)
        else:
            from cvr_tpu.formats.sell import sell_pack

            sell_pack(
                coo.to_csr(), C=args.c or 1024, sigma=args.sigma
            ).save(args.save_packed)
        print(f"packed artifact saved to {args.save_packed}")
    return 0 if r.verified in (True, None) else 1


def _spmv_prepacked(args, coo) -> int:
    """SpMV from a saved packed artifact — skips conversion entirely, the
    amortization workflow (reference analogue: VHCC's binary matrix cache
    behind -b, MatrixDataConverter.cpp:14-89)."""
    import jax.numpy as jnp
    import numpy as np

    from cvr_tpu.bench.harness import time_fn_iterated
    from cvr_tpu.formats.sell import SellMatrix
    from cvr_tpu.ops.spmv import sell_spmv_xla, to_device
    from cvr_tpu.ops.spmv_ref import spmv_golden_numpy, spmv_row_scale, verify

    fmt = args.format
    if fmt == "auto":
        # sniff the artifact kind from its keys
        z = np.load(args.load_packed)
        if "bell_meta" in z.files:
            fmt = "bell"
        elif "mid_kind" in z.files:
            fmt = "routed"
        elif "bands" in z.files:
            fmt = "dia"
        elif "w10" in z.files:
            fmt = "window"
        else:
            fmt = "sell"
    if fmt in ("routed", "sell-routed"):
        from cvr_tpu.formats.sell_routed import load_routed
        from cvr_tpu.ops.spmv_routed import spmv_routed, to_device_routed

        srt = load_routed(args.load_packed)
        if srt.shape != coo.shape:
            print("packed artifact shape mismatch")
            return 1
        sd = to_device_routed(srt)
        kernel = spmv_routed
    elif fmt == "bell":
        from cvr_tpu.formats.bell import load_bell
        from cvr_tpu.ops.spmv_bell import spmv_bell, to_device_bell

        bmx = load_bell(args.load_packed)
        if bmx.shape != coo.shape:
            print("packed artifact shape mismatch")
            return 1
        sd = to_device_bell(bmx)
        kernel = spmv_bell
    elif fmt == "dia":
        from cvr_tpu.formats.dia import DiaMatrix
        from cvr_tpu.ops.spmv_dia import spmv_dia, to_device_dia

        dmx = DiaMatrix.load(args.load_packed)
        if dmx.shape != coo.shape:
            print("packed artifact shape mismatch")
            return 1
        sd = to_device_dia(dmx)
        kernel = spmv_dia
    elif fmt in ("window", "sell-window"):
        from cvr_tpu.formats.sell_window import SellWindow
        from cvr_tpu.ops.spmv_window import spmv_window, to_device_window

        sww = SellWindow.load(args.load_packed)
        if sww.shape != coo.shape:
            print("packed artifact shape mismatch")
            return 1
        sd = to_device_window(sww)
        kernel = spmv_window
    else:
        sm = SellMatrix.load(args.load_packed)
        if sm.shape != coo.shape:
            print("packed artifact shape mismatch")
            return 1
        sd = to_device(sm)
        kernel = sell_spmv_xla
    x = np.ones(coo.shape[1], dtype=np.float32)
    t = time_fn_iterated(kernel, sd, jnp.asarray(x), iters=args.iters)
    print(
        f"[file: {args.matrix}] [packed: {args.load_packed}] "
        f"Pre-processing Time: 0.000 ms (loaded artifact)"
    )
    print(
        f"[file: {args.matrix}] SpMV Execution Time: {t * 1e3:.6f} ms"
    )
    print(
        f"[file: {args.matrix}] Throughput: "
        f"{2 * coo.nnz / t / 1e9:.3f} GFlops (2*nnz)"
    )
    if not args.no_verify:
        import jax

        csr = coo.to_csr()
        y = np.asarray(jax.jit(kernel)(sd, jnp.asarray(x)))
        ok, nbad, mx = verify(
            y,
            spmv_golden_numpy(csr, x),
            rtol=1e-6,
            row_scale=spmv_row_scale(csr, x),
        )
        print(
            f"[file: {args.matrix}] Verification: "
            + ("PASS" if ok else f"FAIL ({nbad} rows)")
        )
    return 0


def _spmm(args, coo) -> int:
    from cvr_tpu.bench.harness import time_fn_iterated

    csr = coo.to_csr()
    t0 = time.perf_counter()
    sd = kernel = None
    if args.format in ("auto", "bsr"):
        # The MXU dense-brick path is the fastest SpMM by an order of
        # magnitude when the matrix has block locality; auto falls back
        # to the gather formats when the brick-fill gate rejects it.
        from cvr_tpu.formats.bsr import BsrInfeasible, bsr_pack
        from cvr_tpu.ops.pallas_bsr import bsr_spmm_pallas
        from cvr_tpu.ops.spmm_bsr import to_device_bsr

        try:
            sd = to_device_bsr(bsr_pack(csr))
            kernel = bsr_spmm_pallas
        except BsrInfeasible as e:
            if args.format == "bsr":
                print(f"error: {e}", file=sys.stderr)
                return 2
    if sd is not None:
        pass
    elif args.format == "auto":
        from cvr_tpu.formats import pack_auto
        from cvr_tpu.formats.bell import BellMatrix
        from cvr_tpu.formats.dia import DiaMatrix
        from cvr_tpu.formats.sell_routed import SellRouted
        from cvr_tpu.ops.spmv_bell import spmm_bell, to_device_bell
        from cvr_tpu.ops.spmv_dia import spmm_dia, to_device_dia
        from cvr_tpu.ops.spmv_routed import spmm_routed, to_device_routed
        from cvr_tpu.ops.spmv_window import spmm_window, to_device_window

        packed = pack_auto(csr)
        if isinstance(packed, DiaMatrix):
            sd = to_device_dia(packed)
            kernel = spmm_dia
        elif isinstance(packed, BellMatrix):
            sd = to_device_bell(packed)
            kernel = spmm_bell
        elif isinstance(packed, SellRouted):
            # PMM gate first: on hub-concentrated column histograms
            # (fsm-class, sampled window fan-in C <~ 8) the exact MXU
            # perm-matmul path wins by ~5-7x at K=16-128 (70.6 useful
            # GFLOPS at K=32 on fsm-like; docs/DESIGN.md round 5)
            from cvr_tpu.ops.spmm_pmm import (
                NS_LANE_PER_ELEM,
                NS_ROUTED_PER_ELEM,
                pmm_estimate,
                pmm_plan,
                pmm_projected_ms,
                spmm_pmm,
                to_device_pmm,
            )

            est = pmm_estimate(coo.rows, coo.cols, coo.shape)
            pmm_ms = pmm_projected_ms(est, args.rhs)
            routed_ms = args.rhs * coo.nnz * NS_ROUTED_PER_ELEM / 1e6
            lane_ms = coo.nnz * NS_LANE_PER_ELEM / 1e6
            if pmm_ms < min(routed_ms, lane_ms):
                sd = to_device_pmm(
                    pmm_plan(coo.rows, coo.cols, coo.vals, coo.shape)
                )
                kernel = spmm_pmm
            elif args.rhs >= 96 and lane_ms < routed_ms:
                # power-law SpMM at wide K: the lane path beats the
                # vmapped route (15.3 vs 10.8 GFLOPS at K=128 on
                # web-scale; docs/DESIGN.md "SpMM round 3")
                from cvr_tpu.ops.spmm_lane import (
                    spmm_lane,
                    spmm_lane_pack,
                    to_device_lane,
                )

                sd = to_device_lane(spmm_lane_pack(csr))
                kernel = spmm_lane
            else:
                sd = to_device_routed(packed)
                kernel = spmm_routed
        else:
            sd = to_device_window(packed)
            kernel = spmm_window
    elif args.format == "lane":
        from cvr_tpu.ops.spmm_lane import (
            spmm_lane,
            spmm_lane_pack,
            to_device_lane,
        )

        sd = to_device_lane(spmm_lane_pack(csr))
        kernel = spmm_lane
    elif args.format == "pmm":
        from cvr_tpu.ops.spmm_pmm import pmm_plan, spmm_pmm, to_device_pmm

        sd = to_device_pmm(
            pmm_plan(coo.rows, coo.cols, coo.vals, coo.shape)
        )
        kernel = spmm_pmm
    elif args.format == "bell":
        from cvr_tpu.formats.bell import bell_pack
        from cvr_tpu.ops.spmv_bell import spmm_bell, to_device_bell

        sd = to_device_bell(bell_pack(csr))
        kernel = spmm_bell
    elif args.format in ("routed", "sell-routed"):
        from cvr_tpu.formats.sell_routed import sell_pack_routed
        from cvr_tpu.ops.spmv_routed import spmm_routed, to_device_routed

        sd = to_device_routed(sell_pack_routed(csr))
        kernel = spmm_routed
    elif args.format in ("window", "sell-window"):
        from cvr_tpu.formats.sell_window import sell_pack_window
        from cvr_tpu.ops.spmv_window import spmm_window, to_device_window

        sd = to_device_window(sell_pack_window(csr))
        kernel = spmm_window
    elif args.format == "dia":
        from cvr_tpu.formats.dia import dia_pack
        from cvr_tpu.ops.spmv_dia import spmm_dia, to_device_dia

        sd = to_device_dia(dia_pack(csr))
        kernel = spmm_dia
    else:
        from cvr_tpu.formats.sell import sell_pack
        from cvr_tpu.ops.spmv import sell_spmm_xla, to_device

        sd = to_device(sell_pack(csr, C=args.c or 1024, sigma=args.sigma))
        kernel = sell_spmm_xla
    preproc = time.perf_counter() - t0
    X = np.ones((coo.shape[1], args.rhs), dtype=np.float32)
    import jax.numpy as jnp

    Xd = jnp.asarray(X)
    t = time_fn_iterated(kernel, sd, Xd, iters=args.iters)
    gflops = 2.0 * csr.nnz * args.rhs / t / 1e9
    print(
        f"[file: {args.matrix}] [rhs: {args.rhs}] "
        f"Pre-processing Time: {preproc * 1e3:.3f} ms"
    )
    print(
        f"[file: {args.matrix}] [rhs: {args.rhs}] "
        f"SpMM Execution Time: {t * 1e3:.6f} ms"
    )
    print(
        f"[file: {args.matrix}] [rhs: {args.rhs}] "
        f"Throughput: {gflops:.3f} GFlops (2*nnz*K)"
    )
    # row-scaled verification vs the float64 golden (same contract as
    # the SpMV path; capped: the host-side f64 golden is O(nnz*K))
    if not args.no_verify and csr.nnz * args.rhs <= 2_000_000_000:
        Y = np.asarray(kernel(sd, Xd))
        A64 = csr.to_scipy().astype(np.float64)
        gold = A64 @ X.astype(np.float64)
        scale = np.abs(A64) @ np.abs(X.astype(np.float64)) + 1e-30
        maxrel = float((np.abs(Y - gold) / scale).max())
        ok = "PASS" if maxrel < 1e-6 else "FAIL"
        print(
            f"[file: {args.matrix}] Verification: {ok} "
            f"(max rel err {maxrel:.2e})"
        )
        if ok == "FAIL":
            return 1
    return 0


def cmd_compare(args) -> int:
    """Run EVERY implementation on one matrix in one table — the
    run_comparison.sh analogue (reference runs 6 solutions per matrix,
    run_comparison.sh:20-45).  With --rhs K > 1 the SpMM formats (bsr /
    routed / window / sell) are compared instead."""
    coo = _load(args.matrix, args.pattern_values)

    if args.rhs > 1:
        import argparse as _ap

        for fmt in ("bsr", "dia", "bell", "lane", "pmm", "routed",
                    "window", "sell"):
            sub = _ap.Namespace(**{**vars(args), "format": fmt})
            try:
                _spmm(sub, coo)
            except Exception as e:  # noqa: BLE001 — keep comparing
                print(f"[{fmt}] failed: {type(e).__name__}: {e}")
        return 0

    from cvr_tpu.bench.harness import run_spmv_benchmark

    results = []
    for impl in ("csr", "sell-xla", "sell-routed", "sell-window", "dia", "bell"):
        try:
            r = run_spmv_benchmark(
                coo, name=args.matrix, impl=impl, iters=args.iters
            )
            r.print_report(threads_label=impl)
            results.append(r)
        except Exception as e:  # noqa: BLE001 — keep comparing
            print(f"[{impl}] failed: {type(e).__name__}: {e}")
    if results:
        best = max(results, key=lambda r: r.gflops_2nnz)
        print(
            f"Best: {best.impl} at {best.gflops_2nnz:.3f} GFlops (2*nnz)"
        )
    return 0


def cmd_info(args) -> int:
    coo = _load(args.matrix, args.pattern_values)
    csr = coo.to_csr()
    lens = csr.row_lengths
    print(f"rows: {coo.shape[0]}  cols: {coo.shape[1]}  nnz: {coo.nnz}")
    print(
        f"row nnz: min {lens.min()}  mean {lens.mean():.2f}  "
        f"max {lens.max()}  empty {(lens == 0).sum()}"
    )
    from cvr_tpu.formats.sell import sell_pack

    sm = sell_pack(csr)
    print(
        f"sell-pack: C={sm.C} slices={sm.nslices} slots={sm.n_slots} "
        f"fill={sm.fill_ratio:.3f} splits={sm.n_splits} "
        f"convert={sm.convert_time * 1e3:.1f} ms"
    )
    # hub-column capture verdict (formats/hot.py): would the routed
    # pack serve the hottest columns from a VMEM-resident table?
    from cvr_tpu.formats.hot import plan_hot

    plan = plan_hot(csr)
    if plan is not None:
        print(
            f"hot-column capture: ON at NH={plan[0]} "
            f"(predicted {plan[1] / 1e3:.0f} us/SpMV saving)"
        )
    else:
        counts_top = int(
            np.sort(np.bincount(csr.cols, minlength=csr.shape[1]))[::-1][
                :1024
            ].sum()
        )
        print(
            "hot-column capture: off (top-1024 columns cover "
            f"{counts_top / max(csr.nnz, 1):.1%} of nnz; the gate's "
            "calibrated model predicts no net win)"
        )
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="cvr_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("matrix", help=".mtx file (optionally .gz)")
        p.add_argument("--iters", type=int, default=100)
        p.add_argument(
            "--threads",
            type=int,
            default=None,
            help="ignored; reference-CLI compatibility",
        )
        p.add_argument(
            "--pattern-values", default="mod13", choices=["mod13", "ones"]
        )

    p = sub.add_parser("spmv", help="convert + SpMV benchmark + verify")
    common(p)
    p.add_argument(
        "--format",
        default="auto",
        choices=[
            "auto", "bell", "bsr", "dia", "lane", "pmm", "routed",
            "sell-routed", "window", "sell-window", "sell", "csr",
        ],
    )
    p.add_argument("--rhs", type=int, default=1, help="K for SpMM")
    p.add_argument("--c", type=int, default=None, help="SELL lane count")
    p.add_argument("--sigma", type=int, default=0, help="sort window")
    p.add_argument("--no-verify", action="store_true")
    p.add_argument("--save-packed", default=None)
    p.add_argument("--load-packed", default=None)
    p.set_defaults(fn=cmd_spmv)

    p = sub.add_parser("compare", help="all impls on one matrix")
    common(p)
    p.add_argument(
        "--rhs", type=int, default=1,
        help="K > 1 compares the SpMM formats instead",
    )
    p.add_argument("--c", type=int, default=None)
    p.add_argument("--sigma", type=int, default=0)
    p.add_argument("--no-verify", action="store_true")
    p.set_defaults(fn=cmd_compare)

    p = sub.add_parser("info", help="matrix + packing statistics")
    common(p)
    p.set_defaults(fn=cmd_info)
    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from cvr_tpu.utils import memarena

    # warm only where first-touch is slow (lazily-backed VMs) — an
    # ordinary host would pay a pointless 1.5 GB memset sweep
    memarena.warm_if_lazy()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
