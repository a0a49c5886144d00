"""Deterministic synthetic matrices for benchmarking.

The reference benchmarks on SuiteSparse/SNAP downloads (run_sample.sh:5-8).
This environment has no network egress, so the harness ships a deterministic
R-MAT generator whose outputs match the *statistics* the CVR paper's
scale-free suite stresses (power-law row degrees, ~5 nnz/row, web-scale row
counts — web-Google is 916K x 916K with 5.10M nnz, paper Table 2).  Real
.mtx files are used instead whenever present in the cache.
"""

from __future__ import annotations

import numpy as np

from cvr_tpu.formats.coo import COOMatrix


def rmat_matrix(
    scale: int,
    edge_factor: int = 6,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 42,
    dtype=np.float32,
) -> COOMatrix:
    """R-MAT power-law graph: 2**scale vertices, edge_factor * 2**scale edges.

    Kronecker quadrant probabilities (a, b, c, 1-a-b-c) follow the Graph500
    convention; duplicates are coalesced, so the final nnz is slightly below
    the nominal edge count (like real web crawls).
    """
    n = 1 << scale
    nnz = edge_factor * n
    rng = np.random.default_rng(seed)
    d = 1.0 - a - b - c
    rows = np.zeros(nnz, dtype=np.int64)
    cols = np.zeros(nnz, dtype=np.int64)
    for _level in range(scale):
        q = rng.choice(4, size=nnz, p=[a, b, c, d])
        rows = (rows << 1) | (q >> 1)
        cols = (cols << 1) | (q & 1)
    vals = rng.standard_normal(nnz).astype(dtype)
    coo = COOMatrix(
        rows=rows.astype(np.int32),
        cols=cols.astype(np.int32),
        vals=vals,
        shape=(n, n),
    )
    return coo.sum_duplicates()


def web_google_like(seed: int = 42) -> COOMatrix:
    """A deterministic stand-in for web-Google (916K x 916K, 5.10M nnz,
    power-law degrees — paper Table 2): R-MAT scale 20, edge factor 6,
    coalesced to ~5M nnz."""
    return rmat_matrix(scale=20, edge_factor=6, seed=seed)


def banded_matrix(
    n: int, bandwidth: int = 27, seed: int = 0, dtype=np.float32
) -> COOMatrix:
    """A regular HPC-style banded matrix (the CVR paper's non-scale-free
    suite is dominated by such stencils, paper Table 2)."""
    rng = np.random.default_rng(seed)
    offsets = np.arange(-(bandwidth // 2), bandwidth // 2 + 1)
    rows_list, cols_list = [], []
    for off in offsets:
        r = np.arange(max(0, -off), min(n, n - off), dtype=np.int32)
        rows_list.append(r)
        cols_list.append(r + off)
    rows = np.concatenate(rows_list)
    cols = np.concatenate(cols_list).astype(np.int32)
    vals = rng.standard_normal(rows.shape[0]).astype(dtype)
    return COOMatrix(rows=rows, cols=cols, vals=vals, shape=(n, n))
