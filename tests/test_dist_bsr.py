"""Distributed BSR-128 SpMM on the virtual 8-device CPU mesh: brick
balance across shards, correctness vs the float64 golden with X
replicated and row-sharded, and jit-closure reuse."""

import numpy as np
import pytest

from cvr_tpu.bench.synthetic import banded_matrix
from cvr_tpu.parallel.dist_bsr import (
    dist_bsr_pack,
    dist_spmm_bsr,
    dist_spmm_bsr_jit,
    make_mesh,
)

from conftest import make_random_coo


def _golden(coo, X):
    m = coo.to_scipy().astype(np.float64)
    gold = m @ X.astype(np.float64)
    scale = abs(m) @ np.abs(X.astype(np.float64)) + 1e-30
    return gold, scale


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(8)


def _check(coo, mesh, K=5, x_sharded=False, **kw):
    csr = coo.to_csr()
    dm = dist_bsr_pack(csr, mesh, **kw)
    X = (
        np.random.default_rng(11)
        .standard_normal((coo.shape[1], K))
        .astype(np.float32)
    )
    Y = np.asarray(dist_spmm_bsr(dm, X, x_sharded=x_sharded))
    gold, scale = _golden(coo, X)
    maxrel = (np.abs(Y - gold) / scale).max()
    assert maxrel < 1e-6, maxrel
    return dm


def test_dist_bsr_banded(mesh8):
    dm = _check(banded_matrix(n=4000, bandwidth=9, seed=0), mesh8)
    assert dm.n_shards == 8
    # every shard ends at a row-block boundary
    assert dm.rb_bounds[0] == 0 and dm.rb_bounds[-1] == -(-4000 // 128)


def test_dist_bsr_x_sharded(mesh8):
    _check(
        banded_matrix(n=4096, bandwidth=13, seed=1), mesh8,
        K=3, x_sharded=True,
    )


def test_dist_bsr_rect(mesh8):
    _check(
        make_random_coo(2000, 1500, density=0.02, seed=3), mesh8,
        min_fill=0.0,
    )


def test_dist_bsr_jit_closure(mesh8):
    coo = banded_matrix(n=3000, bandwidth=7, seed=2)
    dm = dist_bsr_pack(coo.to_csr(), mesh8)
    f = dist_spmm_bsr_jit(dm)
    X = (
        np.random.default_rng(5)
        .standard_normal((coo.shape[1], 4))
        .astype(np.float32)
    )
    Y1 = np.asarray(f(X))
    Y2 = np.asarray(f(X * 2.0))
    gold, scale = _golden(coo, X)
    assert (np.abs(Y1 - gold) / scale).max() < 1e-6
    assert np.allclose(Y2, 2.0 * Y1, rtol=1e-6, atol=1e-8)
