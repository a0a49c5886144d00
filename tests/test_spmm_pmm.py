"""PMM SpMM: exact MXU perm-matmul gather + matmul reduce.

Exactness matters more than usual here: the kernel's whole numerics
story is the 3x-bf16 split (experiments/probe_pmm_precision.py), so
these tests check the row-scaled error against a float64 golden on
hub-structured, random, rectangular, and empty-row inputs, plus the
plan invariants the kernel relies on (chunks never span row-tiles,
windows nondecreasing per chunk, sentinel pads, every row-tile
visited).  Reference context: BASELINE.json config 4 ("8-64 RHS").
"""

import numpy as np
import pytest

from tests.conftest import make_powerlaw_coo, make_random_coo

from cvr_tpu.formats.coo import COOMatrix
from cvr_tpu.ops.spmm_pmm import (
    LC_SENTINEL,
    load_pmm,
    pmm_plan,
    pmm_projected_ms,
    save_pmm,
    spmm_pmm,
    to_device_pmm,
)


def make_fsm_coo(n=2048, deg=6, hubs=96, seed=0) -> COOMatrix:
    """Tiny fsm-like: hub columns + short forward edges (C ~ 2)."""
    rng = np.random.default_rng(seed)
    nnz = n * deg
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    fail = rng.random(nnz) < 0.5
    hub = np.minimum(
        rng.geometric(p=8.0 / hubs, size=nnz) - 1, hubs - 1
    )
    fwd = np.minimum(rows + rng.integers(1, 33, size=nnz), n - 1)
    cols = np.where(fail, hub, fwd)
    vals = rng.standard_normal(nnz).astype(np.float32)
    return COOMatrix(
        rows=rows.astype(np.int32),
        cols=cols.astype(np.int32),
        vals=vals,
        shape=(n, n),
    ).sum_duplicates()


def _check(coo, K, seed=0):
    plan = pmm_plan(coo.rows, coo.cols, coo.vals, coo.shape)
    dev = to_device_pmm(plan)
    X = (
        np.random.default_rng(seed)
        .standard_normal((coo.shape[1], K))
        .astype(np.float32)
    )
    Y = np.asarray(spmm_pmm(dev, X))
    csr = coo.to_csr()
    gold = csr.to_scipy().astype(np.float64) @ X.astype(np.float64)
    scale = np.abs(csr.to_scipy()).astype(np.float64) @ np.abs(
        X.astype(np.float64)
    ) + 1e-30
    maxrel = float((np.abs(Y - gold) / scale).max())
    assert maxrel < 1e-6, maxrel
    return plan


def test_pmm_fsm_k32():
    plan = _check(make_fsm_coo(seed=1), 32, seed=1)
    # hub-concentrated: the fan-in that makes PMM viable
    assert plan.c_mean < 8.0


def test_pmm_k_values():
    coo = make_fsm_coo(n=1024, deg=5, seed=2)
    for K in (1, 8, 16, 33, 64):
        _check(coo, K, seed=K)


def test_pmm_k_above_lane_width():
    _check(make_fsm_coo(n=512, deg=4, seed=3), 130, seed=3)


def test_pmm_random_and_rect():
    # random rectangular: correctness must not depend on hub structure
    _check(make_random_coo(700, 900, density=0.01, seed=4), 24, seed=4)
    _check(make_powerlaw_coo(800, 500, avg_nnz=5, seed=5), 16, seed=5)


def test_pmm_empty_rows_and_tiles():
    # rows 0..127 and a whole trailing row-tile empty
    rng = np.random.default_rng(6)
    nnz = 3000
    rows = rng.integers(128, 640, size=nnz)
    cols = rng.integers(0, 1000, size=nnz)
    vals = rng.standard_normal(nnz).astype(np.float32)
    coo = COOMatrix(
        rows=rows, cols=cols, vals=vals, shape=(900, 1000)
    ).sum_duplicates()
    plan = _check(coo, 8, seed=6)
    # every row-tile gets at least one chunk (output blocks all visited)
    assert set(plan.rt.tolist()) == set(range(plan.nrt))


def test_pmm_plan_invariants():
    coo = make_fsm_coo(n=1024, deg=5, seed=7)
    plan = pmm_plan(coo.rows, coo.cols, coo.vals, coo.shape)
    # chunk ids nondecreasing; one chunk belongs to one row-tile
    assert (np.diff(plan.ch) >= 0).all()
    assert (np.diff(plan.rt) >= 0).all()
    # each chunk's pairs carry disjoint element slots; union of real
    # slots matches val != 0 pattern
    for chunk in range(0, plan.nchunks, 37):
        pairs = np.flatnonzero(plan.ch == chunk)
        slots = plan.lc[pairs] != LC_SENTINEL
        assert (slots.sum(axis=0) <= 1).all()
    # vals on pad slots are zero
    nsl = plan.nchunks * 128
    assert plan.val.size == nsl
    # projected-ms model is monotone in K
    assert pmm_projected_ms(plan, 64) > pmm_projected_ms(plan, 16)


def test_pmm_multi_segment(monkeypatch):
    # SMEM limits pairs per pallas call; force several segments and
    # exercise the chunk-boundary cut + boundary-row-tile overlap-add
    import cvr_tpu.ops.spmm_pmm as mod

    monkeypatch.setattr(mod, "SEG", 64)
    coo = make_fsm_coo(n=4096, deg=8, hubs=64, seed=9)
    plan = pmm_plan(coo.rows, coo.cols, coo.vals, coo.shape)
    assert plan.npairs > 3 * 64  # really multi-segment
    dev = to_device_pmm(plan)
    assert len(dev.segs) >= 3
    X = np.random.default_rng(9).standard_normal(
        (coo.shape[1], 16)
    ).astype(np.float32)
    Y = np.asarray(spmm_pmm(dev, X))
    csr = coo.to_csr()
    gold = csr.to_scipy().astype(np.float64) @ X.astype(np.float64)
    scale = np.abs(csr.to_scipy()).astype(np.float64) @ np.abs(
        X.astype(np.float64)
    ) + 1e-30
    assert float((np.abs(Y - gold) / scale).max()) < 1e-6


def test_pmm_save_load_roundtrip(tmp_path):
    coo = make_fsm_coo(n=512, deg=4, seed=8)
    plan = pmm_plan(coo.rows, coo.cols, coo.vals, coo.shape)
    p = tmp_path / "pmm.npz"
    save_pmm(plan, p)
    plan2 = load_pmm(p)
    dev = to_device_pmm(plan2)
    X = np.random.default_rng(8).standard_normal(
        (coo.shape[1], 16)
    ).astype(np.float32)
    Y = np.asarray(spmm_pmm(dev, X))
    gold = coo.to_csr().to_scipy().astype(np.float64) @ X.astype(
        np.float64
    )
    scale = np.abs(coo.to_csr().to_scipy()).astype(np.float64) @ np.abs(
        X.astype(np.float64)
    ) + 1e-30
    assert float((np.abs(Y - gold) / scale).max()) < 1e-6
