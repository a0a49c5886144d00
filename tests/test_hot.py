"""Hub-column hybrid (cvr_tpu/formats/hot.py): capture invariants and
end-to-end verification against the float64 golden.

The hybrid serves elements of the hottest columns from a VMEM-resident
hot table (no route) and adds their per-slice sums into the routed y
stream — reference motivation: the scale-free hub structure CVR's steal
machinery targets (spmv.cpp:869-943) and VHCC's column blocking
(vhcc_matrix.h:300-375).
"""

import numpy as np
import pytest

import jax

from tests.conftest import make_powerlaw_coo
from cvr_tpu.formats.hot import HCAP, capture_split, plan_hot
from cvr_tpu.formats.sell_routed import (
    load_routed,
    save_routed,
    sell_pack_routed,
)
from cvr_tpu.ops.spmv_routed import spmv_routed, to_device_routed
from cvr_tpu.ops.spmv_ref import spmv_golden_numpy, spmv_row_scale, verify


def _check(coo, sr):
    csr = coo.to_csr()
    sd = to_device_routed(sr)
    x = np.random.default_rng(0).standard_normal(coo.shape[1]).astype(
        np.float32
    )
    y = np.asarray(jax.jit(spmv_routed)(sd, x))
    ok, nbad, maxrel = verify(
        y, spmv_golden_numpy(csr, x), rtol=1e-6,
        row_scale=spmv_row_scale(csr, x),
    )
    assert ok, f"{nbad} bad rows, max rel {maxrel}"
    return sd


def test_capture_split_invariants():
    coo = make_powerlaw_coo(5000, 5000, avg_nnz=8, seed=7)
    csr = coo.to_csr()
    rest, hi = capture_split(csr, NH=256)
    # every element is in exactly one of (rest, hot)
    assert rest.nnz + int(hi.hot_ptr[-1]) == csr.nnz
    # captured rows keep at least one rest element and at most HCAP hot
    h = np.diff(hi.hot_ptr)
    n_rest = rest.row_lengths
    assert (h <= HCAP).all()
    assert (n_rest[h > 0] >= 1).all()
    # captured columns really are hot-set members, rank-ascending per row
    assert hi.hot_rank.min() >= 0 and hi.hot_rank.max() < 256
    for r in np.flatnonzero(h > 0)[:50]:
        rr = hi.hot_rank[hi.hot_ptr[r] : hi.hot_ptr[r + 1]]
        assert (np.diff(rr.astype(np.int32)) >= 0).all()
    # golden: rest + hot reassemble the matrix product
    x = np.random.default_rng(1).standard_normal(5000)
    y_rest = spmv_golden_numpy(rest, x)
    y_hot = np.zeros(5000)
    rows = np.repeat(np.arange(5000), h)
    np.add.at(
        y_hot, rows,
        hi.hot_val.astype(np.float64)
        * x[hi.hot_ids[hi.hot_rank.astype(np.int64)]],
    )
    y_full = spmv_golden_numpy(csr, x)
    np.testing.assert_allclose(y_rest + y_hot, y_full, rtol=1e-9)


def test_hot_hybrid_powerlaw(monkeypatch):
    monkeypatch.setenv("CVR_HOT", "1")
    coo = make_powerlaw_coo(3000, 3000, avg_nnz=6, seed=2)
    sr = sell_pack_routed(coo.to_csr(), hot="auto")
    assert sr.hot is not None
    assert sr.nnz == coo.to_csr().nnz  # full-matrix bookkeeping
    _check(coo, sr)


def test_hot_hybrid_nh512_classes_and_roundtrip(monkeypatch, tmp_path):
    monkeypatch.setenv("CVR_HOT", "1")
    monkeypatch.setenv("CVR_HOT_NH", "512")
    coo = make_powerlaw_coo(40000, 40000, avg_nnz=8, seed=5)
    sr = sell_pack_routed(coo.to_csr(), hot="auto")
    hp = sr.hot
    assert hp.NH == 512 and hp.ncand == 4
    assert (np.bincount(hp.hgcls, minlength=9)[[2, 4]] > 0).any()
    _check(coo, sr)
    p = tmp_path / "hot_art.npz"
    save_routed(sr, p)
    sr2 = load_routed(p)
    assert sr2.hot is not None and sr2.hot.NH == 512
    assert sr2.nnz == sr.nnz
    _check(coo, sr2)


def test_hot_hybrid_regions(monkeypatch):
    """Uniform-degree hub matrix (fsm-class): constant quantized hot
    widths form regular regions; the region kernel path must agree with
    the golden."""
    monkeypatch.setenv("CVR_HOT", "1")
    from cvr_tpu.formats.coo import COOMatrix

    rng = np.random.default_rng(3)
    n, deg = 150_000, 6
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    nnz = n * deg
    fail = rng.random(nnz) < 0.5
    hub = np.minimum(rng.geometric(p=8.0 / 128, size=nnz) - 1, 127)
    fwd = np.minimum(rows + rng.integers(1, 20000, size=nnz), n - 1)
    cols = np.where(fail, hub, fwd)
    coo = COOMatrix(
        rows=rows.astype(np.int32),
        cols=cols.astype(np.int32),
        vals=rng.standard_normal(nnz).astype(np.float32),
        shape=(n, n),
    ).sum_duplicates()
    sr = sell_pack_routed(coo.to_csr(), hot="auto")
    assert sr.hot is not None and sr.hot.regions.shape[0] > 0
    _check(coo, sr)


def test_plan_hot_rejects_structureless():
    # near-uniform columns: capture cannot pay, the model must say no
    rng = np.random.default_rng(9)
    from cvr_tpu.formats.coo import COOMatrix

    n = 20000
    coo = COOMatrix(
        rows=rng.integers(0, n, 100_000).astype(np.int32),
        cols=rng.integers(0, n, 100_000).astype(np.int32),
        vals=np.ones(100_000, np.float32),
        shape=(n, n),
    ).sum_duplicates()
    assert plan_hot(coo.to_csr()) is None
