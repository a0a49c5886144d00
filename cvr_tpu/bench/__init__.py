from cvr_tpu.bench.synthetic import rmat_matrix, web_google_like
from cvr_tpu.bench.harness import BenchResult, run_spmv_benchmark

__all__ = [
    "rmat_matrix",
    "web_google_like",
    "BenchResult",
    "run_spmv_benchmark",
]
