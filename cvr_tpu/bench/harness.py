"""Benchmark harness: preproc time, SpMV time, GFLOPS, nnz/s, roofline.

Reproduces the reference's benchmark protocol — N timed iterations of
y = A @ x, mean time, throughput (spmv.cpp:1024,1656-1664) — with its
machine-greppable stdout contract: lines tagged ``Pre-processing``,
``SpMV Execution`` and ``Throughput`` (README.md:47-49,
run_comparison.sh:47-49).

GFLOPS conventions: the reference is inconsistent (CVR/VHCC print 1
flop/nnz over *padded* nnz, spmv.cpp:1664, while CSR5's results.csv uses
2*nnz, csr5/detail/utils.h:16-20).  This harness reports BOTH, computed
over true (unpadded) nnz, and labels them — SURVEY.md §5 "unit trap".

The roofline: SpMV from the SELL planes streams ~8 bytes/nnz (4B value +
4B column id) plus the x-gather and y traffic, so speed-of-light is
``HBM_BW / 8`` nnz/s; ``roofline_frac`` reports the achieved fraction
(BASELINE.json target: >= 0.8 on web-Google per chip).
"""

from __future__ import annotations

import dataclasses
import json
import time
from dataclasses import dataclass

import jax
import numpy as np

# Per-chip HBM bandwidth (bytes/s) for roofline accounting.
HBM_BW = {
    "v5e": 819e9,  # TPU v5 lite: 819 GB/s
    "v5p": 2765e9,
    "v4": 1228e9,
    "v6e": 1640e9,
    "cpu": 50e9,  # nominal, for smoke runs only
}


def detect_chip() -> str:
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "").lower()
    for key in ("v5 lite", "v5e"):
        if key in kind:
            return "v5e"
    for key in ("v5p", "v5"):
        if key in kind:
            return "v5p"
    if "v4" in kind:
        return "v4"
    if "v6" in kind:
        return "v6e"
    return "cpu"


@dataclass
class BenchResult:
    name: str
    impl: str
    nnz: int
    padded_nnz: int
    preproc_s: float
    spmv_s: float  # mean per-iteration
    iters: int
    gflops_2nnz: float  # 2*nnz / t / 1e9  (CSR5 convention)
    gnnz_per_s: float  # nnz / t / 1e9    (CVR prints this as "GFLOPS")
    roofline_frac: float
    amortize_iters: float  # preproc_s / spmv_s (CVR: ~2.14, paper Table 1)
    verified: bool | None = None
    max_rel_err: float | None = None

    def print_report(self, threads_label: str = "1chip") -> None:
        # Greppable contract mirroring README.md:47-49.
        print(
            f"[file: {self.name}] [threads: {threads_label}] "
            f"Pre-processing Time: {self.preproc_s * 1e3:.3f} ms"
        )
        print(
            f"[file: {self.name}] [threads: {threads_label}] "
            f"SpMV Execution Time: {self.spmv_s * 1e3:.6f} ms"
        )
        print(
            f"[file: {self.name}] [threads: {threads_label}] "
            f"Throughput: {self.gflops_2nnz:.3f} GFlops (2*nnz), "
            f"{self.gnnz_per_s:.3f} Gnnz/s, "
            f"{100 * self.roofline_frac:.1f}% of HBM roofline"
        )
        if self.verified is not None:
            print(
                f"[file: {self.name}] Verification: "
                + ("PASS" if self.verified else "FAIL")
                + (
                    f" (max rel err {self.max_rel_err:.2e})"
                    if self.max_rel_err is not None
                    else ""
                )
            )

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))


def time_fn(fn, *args, iters: int = 100, warmup: int = 3) -> float:
    """Mean wall-clock seconds per call, after warmup, with device sync."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def run_spmv_benchmark(
    coo,
    name: str = "matrix",
    impl: str = "sell-xla",
    iters: int = 100,
    C: int | None = None,
    sigma: int = 0,
    verify_result: bool = True,
    chip: str | None = None,
    x: np.ndarray | None = None,
) -> BenchResult:
    """End-to-end: convert (timed) -> SpMV iterations (timed) -> verify.

    Mirrors the reference driver's sequence read -> convert -> compute ->
    verify -> report (spmv.cpp:1675-1948).
    """
    import jax.numpy as jnp

    from cvr_tpu.formats.sell import DEFAULT_C, sell_pack
    from cvr_tpu.ops.spmv import spmv, to_device
    from cvr_tpu.ops.spmv_ref import spmv_csr_jnp, spmv_golden_numpy, verify

    chip = chip or detect_chip()
    csr = coo.to_csr()
    nnz = csr.nnz
    if x is None:
        # Reference fixture: constant x = 1.0 (spmv.cpp:556-563).
        x = np.ones(csr.shape[1], dtype=csr.vals.dtype)

    if impl.startswith("sell"):
        t0 = time.perf_counter()
        sm = sell_pack(csr, C=C or DEFAULT_C, sigma=sigma)
        preproc = time.perf_counter() - t0
        padded = sm.padded_nnz
        sd = to_device(sm)
        xd = jnp.asarray(x)
        pallas = impl == "sell-pallas"
        fn = jax.jit(
            lambda s, v: spmv(s, v, impl="pallas" if pallas else "xla")
        )
        spmv_s = time_fn(fn, sd, xd, iters=iters)
        y = np.asarray(fn(sd, xd))
    elif impl == "csr":
        t0 = time.perf_counter()
        rowptr = jnp.asarray(csr.rowptr)
        colsd = jnp.asarray(csr.cols)
        valsd = jnp.asarray(csr.vals)
        preproc = time.perf_counter() - t0
        padded = nnz
        xd = jnp.asarray(x)
        nrows = csr.shape[0]
        fn = jax.jit(
            lambda rp, cc, vv, v: spmv_csr_jnp(rp, cc, vv, v, nrows)
        )
        spmv_s = time_fn(fn, rowptr, colsd, valsd, xd, iters=iters)
        y = np.asarray(fn(rowptr, colsd, valsd, xd))
    else:
        raise ValueError(f"unknown impl {impl!r}")

    ok = None
    max_rel = None
    if verify_result:
        y_ref = spmv_golden_numpy(csr, x)
        ok, _nbad, max_rel = verify(y, y_ref, rtol=1e-4)

    bw = HBM_BW[chip]
    gnnz = nnz / spmv_s / 1e9
    return BenchResult(
        name=name,
        impl=impl,
        nnz=nnz,
        padded_nnz=padded,
        preproc_s=preproc,
        spmv_s=spmv_s,
        iters=iters,
        gflops_2nnz=2 * nnz / spmv_s / 1e9,
        gnnz_per_s=gnnz,
        roofline_frac=(nnz * 8.0 / spmv_s) / bw,
        amortize_iters=preproc / spmv_s if spmv_s > 0 else float("inf"),
        verified=ok,
        max_rel_err=max_rel,
    )
