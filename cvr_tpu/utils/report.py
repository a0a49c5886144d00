"""Result logging: the results.csv appender.

The reference's CSR5 driver appends ``filename,gflops`` to results.csv
after every run (csr5/main.cpp:153-158) and run_comparison.sh greps the
stdout contract into tables.  This module writes a richer, append-only CSV
plus JSONL so sweeps are machine-consumable.
"""

from __future__ import annotations

import csv
import json
import os
from dataclasses import asdict
from pathlib import Path

FIELDS = [
    "name",
    "impl",
    "nnz",
    "padded_nnz",
    "preproc_s",
    "spmv_s",
    "iters",
    "gflops_2nnz",
    "gnnz_per_s",
    "roofline_frac",
    "amortize_iters",
    "verified",
    "max_rel_err",
    "nrows",
    "ncols",
]


def append_result(result, csv_path: str | os.PathLike = "results.csv"):
    """Append a BenchResult row (creates the file with a header)."""
    path = Path(csv_path)
    d = asdict(result)
    new = not path.exists()
    with open(path, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=FIELDS, extrasaction="ignore")
        if new:
            w.writeheader()
        w.writerow(d)


def append_jsonl(result, path: str | os.PathLike = "results.jsonl"):
    with open(path, "a") as f:
        f.write(json.dumps(asdict(result)) + "\n")
