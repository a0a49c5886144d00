"""Distributed PMM SpMM (round-5): row-sharded perm-matmul plans on the
8-device virtual CPU mesh, verified at the 1e-6 row-scaled contract."""

import numpy as np
import pytest

import jax

from tests.conftest import make_powerlaw_coo
from cvr_tpu.bench.synthetic import fsm_like
from cvr_tpu.parallel.dist import make_mesh
from cvr_tpu.parallel.dist_pmm import dist_pmm_pack, dist_spmm_pmm


def _check(csr, X, Y):
    m64 = csr.to_scipy().astype(np.float64)
    gold = m64 @ X.astype(np.float64)
    scale = abs(m64) @ np.abs(X.astype(np.float64)) + 1e-30
    maxrel = float((np.abs(Y - gold) / scale).max())
    assert maxrel < 1e-6, maxrel


@pytest.mark.parametrize("x_sharded", [False, True])
def test_dist_pmm_hub_concentrated(x_sharded):
    # fsm-like structure is PMM's home turf (fan-in C ~ 2)
    coo = fsm_like(n=6000, seed=9)
    csr = coo.to_csr()
    mesh = make_mesh(8)
    dm = dist_pmm_pack(csr, mesh)
    assert dm.n_shards == 8
    K = 32
    X = (
        np.random.default_rng(0)
        .standard_normal((coo.shape[1], K))
        .astype(np.float32)
    )
    xin = (
        np.pad(X, ((0, (-coo.shape[1]) % 8), (0, 0))) if x_sharded else X
    )
    Y = np.asarray(
        jax.jit(lambda V: dist_spmm_pmm(dm, V, x_sharded=x_sharded))(xin)
    )
    _check(csr, X, Y)


def test_dist_pmm_powerlaw_small_k():
    # power-law shards exercise uneven pair streams / segment padding
    coo = make_powerlaw_coo(7000, 7000, avg_nnz=7, seed=6)
    csr = coo.to_csr()
    mesh = make_mesh(8)
    dm = dist_pmm_pack(csr, mesh)
    assert dm.c_mean > 0
    K = 8
    X = (
        np.random.default_rng(2)
        .standard_normal((coo.shape[1], K))
        .astype(np.float32)
    )
    Y = np.asarray(jax.jit(lambda V: dist_spmm_pmm(dm, V))(X))
    _check(csr, X, Y)


def test_dist_pmm_empty_shard_rows():
    # a matrix with trailing empty rows: the last shard gets all-pad
    # chunks; result must still be exact zeros there
    rng = np.random.default_rng(5)
    n = 4000
    rows = rng.integers(0, n // 2, size=6 * n).astype(np.int32)
    cols = rng.integers(0, n, size=6 * n).astype(np.int32)
    vals = rng.standard_normal(6 * n).astype(np.float32)
    from cvr_tpu.formats.coo import COOMatrix

    coo = COOMatrix(rows, cols, vals, (n, n)).sum_duplicates()
    csr = coo.to_csr()
    mesh = make_mesh(8)
    dm = dist_pmm_pack(csr, mesh)
    K = 16
    X = rng.standard_normal((n, K)).astype(np.float32)
    Y = np.asarray(jax.jit(lambda V: dist_spmm_pmm(dm, V))(X))
    _check(csr, X, Y)
    assert np.all(Y[n // 2 :] == 0.0)
