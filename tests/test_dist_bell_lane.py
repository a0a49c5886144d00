"""Distributed BELL SpMV and lane SpMM (round-4 additions).

Closes the round-3 gap: the road domain's winning format and the
power-law SpMM path both scale out now (8-device virtual CPU mesh).
"""

import numpy as np
import pytest

import jax

from tests.conftest import make_powerlaw_coo
from cvr_tpu.bench.synthetic import road_usa_like
from cvr_tpu.ops.spmv_ref import spmv_golden_numpy, spmv_row_scale, verify
from cvr_tpu.parallel.dist import make_mesh
from cvr_tpu.parallel.dist_bell import dist_bell_pack, dist_spmv_bell
from cvr_tpu.parallel.dist_lane import dist_lane_pack, dist_spmm_lane


@pytest.mark.parametrize("x_sharded", [False, True])
def test_dist_bell_road(x_sharded):
    coo = road_usa_like(n=1 << 14, deg=2.5, reach=64, seed=17)
    csr = coo.to_csr()
    mesh = make_mesh(8)
    dm = dist_bell_pack(csr, mesh)
    assert dm.spill is not None  # this fixture spills
    assert (np.diff(dm.bounds) % 1024 == 0).sum() >= 7  # aligned cuts
    x = (
        np.random.default_rng(0)
        .standard_normal(coo.shape[1])
        .astype(np.float32)
    )
    xin = np.pad(x, (0, (-len(x)) % 8)) if x_sharded else x
    y = np.asarray(
        jax.jit(lambda v: dist_spmv_bell(dm, v, x_sharded=x_sharded))(xin)
    )
    ok, nbad, maxrel = verify(
        y, spmv_golden_numpy(csr, x), rtol=1e-6,
        row_scale=spmv_row_scale(csr, x),
    )
    assert ok, f"{nbad} bad rows, max rel {maxrel}"


def test_dist_lane_powerlaw():
    coo = make_powerlaw_coo(9000, 9000, avg_nnz=7, seed=4)
    csr = coo.to_csr()
    mesh = make_mesh(8)
    dm = dist_lane_pack(csr, mesh)
    K = 8
    X = (
        np.random.default_rng(0)
        .standard_normal((coo.shape[1], K))
        .astype(np.float32)
    )
    Y = np.asarray(
        jax.jit(lambda V: dist_spmm_lane(dm, V, x_sharded=True))(
            np.pad(X, ((0, (-coo.shape[1]) % 8), (0, 0)))
        )
    )
    m64 = csr.to_scipy().astype(np.float64)
    gold = m64 @ X.astype(np.float64)
    scale = abs(m64) @ np.abs(X.astype(np.float64)) + 1e-30
    maxrel = float((np.abs(Y - gold) / scale).max())
    assert maxrel < 1e-6, maxrel


def test_dist_lane_wide_k():
    # K > 128 exercises the KL chunking under shard_map
    coo = make_powerlaw_coo(4000, 4000, avg_nnz=6, seed=3)
    csr = coo.to_csr()
    mesh = make_mesh(8)
    dm = dist_lane_pack(csr, mesh)
    K = 160
    X = (
        np.random.default_rng(1)
        .standard_normal((coo.shape[1], K))
        .astype(np.float32)
    )
    Y = np.asarray(jax.jit(lambda V: dist_spmm_lane(dm, V))(X))
    m64 = csr.to_scipy().astype(np.float64)
    gold = m64 @ X.astype(np.float64)
    scale = abs(m64) @ np.abs(X.astype(np.float64)) + 1e-30
    assert float((np.abs(Y - gold) / scale).max()) < 1e-6
