"""SELL-W window-gather SpMV: correctness on the CPU interpreter.

The window path is the locality fast path (cvr_tpu/formats/sell_window.py,
cvr_tpu/ops/pallas_window.py): one fused kernel, feasible only when every
packed plane row's columns fit a 2048-wide aligned window.  Tests verify
against the NumPy golden SpMV — the reference's in-binary check
(spmv.cpp:1916-1938) — plus the feasibility dispatch and artifact
save/load round-trip.
"""

import numpy as np
import pytest

from cvr_tpu.bench.synthetic import banded_matrix, rmat_matrix
from cvr_tpu.formats import pack_auto
from cvr_tpu.formats.coo import COOMatrix
from cvr_tpu.formats.sell_routed import SellRouted
from cvr_tpu.formats.sell_window import (
    SellWindow,
    WindowInfeasible,
    sell_pack_window,
)
from cvr_tpu.ops.spmv import spmm, spmv
from cvr_tpu.ops.spmv_ref import spmv_golden_numpy, spmv_row_scale, verify


def _check(coo, rtol=1e-4, **kw):
    csr = coo.to_csr()
    sw = sell_pack_window(csr, **kw)
    x = (
        np.random.default_rng(7)
        .standard_normal(coo.shape[1])
        .astype(np.float32)
    )
    y = np.asarray(spmv(sw, x))
    ok, nbad, maxrel = verify(
        y,
        spmv_golden_numpy(csr, x),
        rtol=rtol,
        row_scale=spmv_row_scale(csr, x),
    )
    assert ok, f"{nbad} bad rows, max rel {maxrel}"
    return sw


def test_window_banded():
    sw = _check(banded_matrix(n=3000, bandwidth=9, seed=0))
    assert sw.W in (1024, 2048)


def test_window_banded_wide_band():
    _check(banded_matrix(n=4000, bandwidth=61, seed=2))


def test_window_multi_slice_varying_width():
    # rows of very different lengths across slices (widths vary per slice)
    rng = np.random.default_rng(5)
    n = 4096
    rows, cols, vals = [], [], []
    for r in range(n):
        deg = 1 + (r % 7) + (10 if (r // 1024) == 2 else 0)
        c = np.clip(r + rng.integers(-40, 41, deg), 0, n - 1)
        rows.append(np.full(deg, r, dtype=np.int64))
        cols.append(c.astype(np.int64))
        vals.append(rng.standard_normal(deg).astype(np.float32))
    coo = COOMatrix(
        rows=np.concatenate(rows),
        cols=np.concatenate(cols),
        vals=np.concatenate(vals),
        shape=(n, n),
    ).sum_duplicates()
    _check(coo)


def test_window_empty_rows():
    # empty rows leave zero entries in y; empty slices emit nothing
    rng = np.random.default_rng(3)
    n = 3000
    m = 900
    rows = rng.integers(0, m, 5000).astype(np.int64)  # only rows < m used
    cols = np.clip(
        rows + rng.integers(-30, 31, 5000), 0, n - 1
    ).astype(np.int64)
    vals = rng.standard_normal(5000).astype(np.float32)
    coo = COOMatrix(
        rows=rows, cols=cols, vals=vals, shape=(n, n)
    ).sum_duplicates()
    _check(coo)


def test_window_rectangular():
    rng = np.random.default_rng(11)
    nr, nc = 2000, 1500
    rows = rng.integers(0, nr, 6000).astype(np.int64)
    cols = np.clip(
        (rows * nc // nr) + rng.integers(-25, 26, 6000), 0, nc - 1
    ).astype(np.int64)
    vals = rng.standard_normal(6000).astype(np.float32)
    coo = COOMatrix(
        rows=rows, cols=cols, vals=vals, shape=(nr, nc)
    ).sum_duplicates()
    csr = coo.to_csr()
    sw = sell_pack_window(csr)
    x = rng.standard_normal(nc).astype(np.float32)
    y = np.asarray(spmv(sw, x))
    ok, nbad, maxrel = verify(
        y, spmv_golden_numpy(csr, x), rtol=1e-4,
        row_scale=spmv_row_scale(csr, x),
    )
    assert ok, f"{nbad} bad rows, max rel {maxrel}"


def test_window_multi_segment():
    # ncols > segw*1024 forces multiple x-table segments
    _check(banded_matrix(n=5000, bandwidth=7, seed=4), segw=2)


def test_window_small_powerlaw_feasible():
    # a matrix whose WHOLE column range (2048) fits the window reach is
    # feasible regardless of structure — and must still be correct
    sw = _check(rmat_matrix(scale=11, edge_factor=8, seed=2))
    assert sw.W == 2048


def test_window_infeasible_powerlaw():
    # 16K columns with power-law structure: no window locality
    coo = rmat_matrix(scale=14, edge_factor=8, seed=2)
    with pytest.raises(WindowInfeasible):
        sell_pack_window(coo.to_csr())


def test_pack_auto_dispatch():
    from cvr_tpu.formats.dia import DiaMatrix

    # strictly banded -> DIA (pure streaming beats every gather format)
    assert isinstance(
        pack_auto(banded_matrix(n=20000, bandwidth=5, seed=1).to_csr()),
        DiaMatrix,
    )
    # local but not diagonal (random offsets in a band, within the BELL
    # reach cap) -> BELL (natural-order planes, no route; rgg-like runs
    # 78 vs 20 GFLOPS on the round-2 window path, results_r3.csv)
    from cvr_tpu.bench.synthetic import rgg_like
    from cvr_tpu.formats.bell import BellMatrix

    assert isinstance(
        pack_auto(rgg_like(n=20000, reach=48, seed=3).to_csr()),
        BellMatrix,
    )
    # power-law -> routed
    assert isinstance(
        pack_auto(rmat_matrix(scale=14, edge_factor=8, seed=2).to_csr()),
        SellRouted,
    )


def test_window_spmm():
    coo = banded_matrix(n=2500, bandwidth=11, seed=6)
    csr = coo.to_csr()
    sw = sell_pack_window(csr)
    rng = np.random.default_rng(8)
    X = rng.standard_normal((coo.shape[1], 4)).astype(np.float32)
    Y = np.asarray(spmm(sw, X))
    for k in range(4):
        ok, nbad, maxrel = verify(
            Y[:, k],
            spmv_golden_numpy(csr, X[:, k]),
            rtol=1e-4,
            row_scale=spmv_row_scale(csr, X[:, k]),
        )
        assert ok, f"rhs {k}: {nbad} bad rows, max rel {maxrel}"


def test_window_save_load(tmp_path):
    coo = banded_matrix(n=2000, bandwidth=9, seed=9)
    csr = coo.to_csr()
    sw = sell_pack_window(csr)
    p = tmp_path / "win.npz"
    sw.save(p)
    sw2 = SellWindow.load(p)
    x = np.random.default_rng(1).standard_normal(csr.shape[1]).astype(
        np.float32
    )
    y1 = np.asarray(spmv(sw, x))
    y2 = np.asarray(spmv(sw2, x))
    np.testing.assert_array_equal(y1, y2)


def test_window_numpy_vs_native_fill():
    # the NumPy fallback and the native fill must build identical planes
    from cvr_tpu import _native

    if not _native.available():
        pytest.skip("native library unavailable")
    coo = banded_matrix(n=3000, bandwidth=13, seed=12)
    csr = coo.to_csr()
    a = sell_pack_window(csr, use_native=True)
    b = sell_pack_window(csr, use_native=False)
    np.testing.assert_array_equal(a.vals_ss, b.vals_ss)
    np.testing.assert_array_equal(a.li, b.li)
    np.testing.assert_array_equal(a.w10, b.w10)
    np.testing.assert_array_equal(a.emit, b.emit)
    assert a.W == b.W


def test_pack_auto_fill_ratio_dispatch():
    # road-network class within BELL's 448-column reach -> BELL (the
    # round-3 road win: natural-order planes beat both window padding
    # and the routed op floor at 2.5 nnz/row)
    from cvr_tpu.bench.synthetic import road_usa_like
    from cvr_tpu.formats.bell import BellMatrix

    csr48 = road_usa_like(n=1 << 17, deg=2.5, reach=48, seed=3).to_csr()
    assert isinstance(pack_auto(csr48), BellMatrix)
    # beyond the BELL reach cap the class is window-feasible but badly
    # padded (slice width = max row length over natural-order rows with
    # Poisson degrees) — pack_auto falls through to the routed format on
    # throughput grounds, unless the caller raises max_window_fill.
    csr = road_usa_like(n=1 << 17, deg=2.5, reach=600, seed=3).to_csr()
    assert isinstance(pack_auto(csr), SellRouted)
    assert isinstance(
        pack_auto(csr, max_window_fill=float("inf")), SellWindow
    )
