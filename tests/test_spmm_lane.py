"""Lane SpMM (K in lanes, no route): gather + slice reduce + y combine.

Reference context: BASELINE.json config 4 (SpMM to engage wide units);
the vmapped routed SpMM this path replaces on power-law matrices is
tested in test_spmv_routed.py.
"""

import numpy as np
import pytest

from tests.conftest import make_powerlaw_coo, make_random_coo

from cvr_tpu.ops.spmm_lane import (
    spmm_lane,
    spmm_lane_pack,
    to_device_lane,
)


def _gold(csr, X):
    return csr.to_scipy().astype(np.float64) @ X.astype(np.float64)


def _check(coo, K, seed=0):
    csr = coo.to_csr()
    lp = spmm_lane_pack(csr)
    sd = to_device_lane(lp)
    X = (
        np.random.default_rng(seed)
        .standard_normal((coo.shape[1], K))
        .astype(np.float32)
    )
    Y = np.asarray(spmm_lane(sd, X))
    gold = _gold(csr, X)
    scale = np.abs(csr.to_scipy()).astype(np.float64) @ np.abs(
        X.astype(np.float64)
    ) + 1e-30
    maxrel = float((np.abs(Y - gold) / scale).max())
    assert maxrel < 1e-5, maxrel
    return lp


def test_lane_powerlaw_k128():
    lp = _check(make_powerlaw_coo(4000, 4000, avg_nnz=8, seed=1), 128)
    assert lp.nslices >= 1


def test_lane_small_k():
    _check(make_powerlaw_coo(2000, 2000, avg_nnz=6, seed=2), 7)


def test_lane_k_above_lane_width():
    # K > 128 runs in two 128-lane chunks
    _check(make_random_coo(900, 1200, density=0.01, seed=3), 130)


def test_lane_rect_and_splits():
    # long hub rows force split segments -> the extra scatter-add path
    coo = make_powerlaw_coo(3000, 1500, avg_nnz=10, seed=5)
    lp = _check(coo, 32)
    # hub rows exist in this generator; extras exercised when present
    assert lp.extra_pos.shape[0] >= 0


def test_lane_dispatcher():
    from cvr_tpu.ops.spmv import spmm

    coo = make_powerlaw_coo(1500, 1500, avg_nnz=5, seed=7)
    csr = coo.to_csr()
    lp = spmm_lane_pack(csr)
    X = (
        np.random.default_rng(1)
        .standard_normal((1500, 16))
        .astype(np.float32)
    )
    Y = np.asarray(spmm(lp, X))
    gold = _gold(csr, X)
    assert np.abs(Y - gold).max() <= 1e-4 * max(np.abs(gold).max(), 1.0)


def test_lane_save_load(tmp_path):
    from cvr_tpu.ops.spmm_lane import (
        _jitted_spmm_lane,
        load_lane,
        save_lane,
        spmm_lane_pack,
        to_device_lane,
    )

    coo = make_powerlaw_coo(2048, 2048, seed=6)
    lp = spmm_lane_pack(coo.to_csr())
    p = tmp_path / "lane.npz"
    save_lane(lp, p)
    lp2 = load_lane(p)
    X = (
        np.random.default_rng(2)
        .standard_normal((coo.shape[1], 8))
        .astype(np.float32)
    )
    Y1 = np.asarray(_jitted_spmm_lane()(to_device_lane(lp), X))
    Y2 = np.asarray(_jitted_spmm_lane()(to_device_lane(lp2), X))
    np.testing.assert_array_equal(Y1, Y2)
