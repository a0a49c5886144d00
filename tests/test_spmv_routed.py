"""Routed-gather SpMV (v3): end-to-end correctness on the CPU interpreter.

The routed path compiles the x-gather into windowed Pallas passes plus a
static Clos route (cvr_tpu/formats/sell_routed.py, cvr_tpu/ops/spmv_routed.py);
these tests run the full pipeline in Pallas interpret mode and verify
against the NumPy golden SpMV, mirroring the reference's in-binary check
(spmv.cpp:1916-1938).
"""

import numpy as np
import pytest

import cvr_tpu
from cvr_tpu.bench.synthetic import banded_matrix, rmat_matrix
from cvr_tpu.formats.coo import COOMatrix
from cvr_tpu.formats.sell import sell_pack
from cvr_tpu.formats.sell_routed import pack_routed, sell_pack_routed
from cvr_tpu.ops.spmv import spmv
from cvr_tpu.ops.spmv_ref import spmv_golden_numpy, spmv_row_scale, verify


def _check(coo, split_len=None, rtol=1e-4):
    csr = coo.to_csr()
    sr = sell_pack_routed(csr, split_len=split_len)
    x = (
        np.random.default_rng(7)
        .standard_normal(coo.shape[1])
        .astype(np.float32)
    )
    y = np.asarray(spmv(sr, x))
    ok, nbad, maxrel = verify(
        y,
        spmv_golden_numpy(csr, x),
        rtol=rtol,
        row_scale=spmv_row_scale(csr, x),
    )
    assert ok, f"{nbad} bad rows, max rel {maxrel}"
    return sr


def test_routed_rmat_power_law():
    _check(rmat_matrix(scale=11, edge_factor=8, seed=2))


def test_routed_banded():
    _check(banded_matrix(n=3000, bandwidth=9, seed=0))


def test_routed_with_splits():
    # tiny split_len forces the extra-segment scatter-add combine
    sr = _check(rmat_matrix(scale=10, edge_factor=12, seed=5), split_len=16)
    assert sr.extra_src.shape[0] > 0


def test_routed_multi_group(monkeypatch):
    # nslices > YB exercises the grouped reduce path — per-group pieces,
    # the optimization-barrier combine (the XLA TpuInstructionFusion
    # workaround, ops/spmv_routed.py), and the cross-group concatenate —
    # that full-scale power-law matrices hit on TPU (soc-LJ: 8 groups).
    # Shrink YB so a CPU-sized matrix spans several groups; both the
    # pack and the op read YB from pallas_route at call time.
    import cvr_tpu.ops.pallas_route as pr

    monkeypatch.setattr(pr, "YB", 2)
    sr = _check(rmat_matrix(scale=12, edge_factor=8, seed=4))
    assert len(sr.ycall_rows) >= 2


def test_routed_empty_rows_and_cols():
    rng = np.random.default_rng(3)
    n = 2500
    rows = rng.integers(0, n // 3, 4000).astype(np.int64)  # rows 2n/3 empty
    cols = rng.integers(0, n, 4000).astype(np.int64)
    vals = rng.standard_normal(4000).astype(np.float32)
    coo = COOMatrix(rows=rows, cols=cols, vals=vals, shape=(n, n))
    csr = coo.to_csr()
    sr = sell_pack_routed(csr)
    x = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(spmv(sr, x))
    y_ref = spmv_golden_numpy(csr, x)
    ok, nbad, maxrel = verify(
        y, y_ref, rtol=1e-4, row_scale=spmv_row_scale(csr, x)
    )
    assert ok
    # empty rows must be exactly zero
    lengths = np.diff(csr.rowptr)
    assert np.all(y[lengths == 0] == 0.0)


def test_routed_requires_c1024():
    coo = rmat_matrix(scale=8, edge_factor=4, seed=0)
    sm = sell_pack(coo.to_csr(), C=8)
    with pytest.raises(ValueError):
        pack_routed(sm)


def test_expand_tiles_cover_plane():
    coo = rmat_matrix(scale=10, edge_factor=8, seed=1)
    sm = sell_pack(coo.to_csr(), C=1024)
    sr = pack_routed(sm)
    assert sr.T * 1024 >= sm.n_slots * 1024
    assert sr.w8.shape[0] == sr.T
    # every in-window offset must be a valid column offset
    assert sr.li.min() >= 0 and sr.li.max() < 1024


def test_routed_spmm_vmap():
    from cvr_tpu.ops.spmv import spmm

    coo = rmat_matrix(scale=9, edge_factor=6, seed=4)
    csr = coo.to_csr()
    sr = sell_pack_routed(csr)
    X = (
        np.random.default_rng(1)
        .standard_normal((coo.shape[1], 4))
        .astype(np.float32)
    )
    Y = np.asarray(spmm(sr, X))
    for k in range(4):
        ok, nbad, maxrel = verify(
            Y[:, k],
            spmv_golden_numpy(csr, X[:, k]),
            rtol=1e-4,
            row_scale=spmv_row_scale(csr, X[:, k]),
        )
        assert ok, (k, nbad, maxrel)


def test_routed_save_load(tmp_path):
    from cvr_tpu.formats.sell_routed import load_routed, save_routed

    coo = rmat_matrix(scale=9, edge_factor=6, seed=6)
    csr = coo.to_csr()
    sr = sell_pack_routed(csr)
    p = tmp_path / "routed.npz"
    save_routed(sr, p)
    sr2 = load_routed(p)
    x = (
        np.random.default_rng(2)
        .standard_normal(coo.shape[1])
        .astype(np.float32)
    )
    y1 = np.asarray(spmv(sr, x))
    y2 = np.asarray(spmv(sr2, x))
    np.testing.assert_array_equal(y1, y2)


def test_routed_multisegment_x_table():
    """ncols large enough that x streams through multiple VMEM segments."""
    rng = np.random.default_rng(9)
    nrows, ncols = 4000, 1_300_000  # ~1.24M cols -> 2 x-table segments
    nnz = 40_000
    rows = rng.integers(0, nrows, nnz).astype(np.int64)
    cols = rng.integers(0, ncols, nnz).astype(np.int64)
    vals = rng.standard_normal(nnz).astype(np.float32)
    coo = COOMatrix(rows=rows, cols=cols, vals=vals, shape=(nrows, ncols))
    csr = coo.to_csr()
    sr = sell_pack_routed(csr)
    assert sr.n_segs >= 2, sr.n_segs
    x = rng.standard_normal(ncols).astype(np.float32)
    y = np.asarray(spmv(sr, x))
    ok, nbad, maxrel = verify(
        y,
        spmv_golden_numpy(csr, x),
        rtol=1e-4,
        row_scale=spmv_row_scale(csr, x),
    )
    assert ok, (nbad, maxrel)


def test_routed_mostly_empty_rows_flat_yroute():
    """Matrices where most rows are empty (61% on web-Google-like) now
    pack with the EFFECTIVE slice count: trailing zero-width slices are
    dropped, the y-route shrinks (flat when Ty fits 1024), and rows
    routed from arbitrary positions are zeroed by the fused row mask."""
    import numpy as np

    from cvr_tpu.formats.coo import COOMatrix
    from cvr_tpu.formats.sell_routed import sell_pack_routed
    from cvr_tpu.ops.spmv_ref import spmv_golden_numpy, spmv_row_scale, verify
    from cvr_tpu.ops.spmv_routed import spmv_routed, to_device_routed

    rng = np.random.default_rng(7)
    n = 5000
    nonempty = rng.choice(n, size=n // 5, replace=False)
    rows = np.repeat(nonempty, 4).astype(np.int32)
    cols = rng.integers(0, n, size=rows.shape[0]).astype(np.int32)
    vals = rng.standard_normal(rows.shape[0]).astype(np.float32)
    coo = COOMatrix(rows=rows, cols=cols, vals=vals, shape=(n, n))
    coo = coo.sum_duplicates()
    csr = coo.to_csr()
    sr = sell_pack_routed(csr)
    assert sr.ymask.shape[0] in (0, n)
    x = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(spmv_routed(to_device_routed(sr), x))
    ok, nbad, mx = verify(
        y, spmv_golden_numpy(csr, x),
        rtol=1e-6, row_scale=spmv_row_scale(csr, x),
    )
    assert ok, (nbad, mx)
    # empty rows must be exactly zero
    empty = np.setdiff1d(np.arange(n), nonempty)
    assert (y[empty] == 0).all()


def test_w16_region_kernel():
    """Uniform ~121-128 nnz rows give zone lambda-widths of 16: the pack
    must plan a w=16 regular region (round 4 widened the allowed set)
    and the region kernel must agree with the golden."""
    import collections

    import jax
    import numpy as np

    from cvr_tpu.formats.coo import COOMatrix
    from cvr_tpu.formats.sell_routed import sell_pack_routed
    from cvr_tpu.ops.spmv_routed import spmv_routed, to_device_routed
    from cvr_tpu.ops.spmv_ref import (
        spmv_golden_numpy,
        spmv_row_scale,
        verify,
    )

    rng = np.random.default_rng(8)
    n = 4096
    deg = rng.integers(121, 129, n)
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    cols = rng.integers(0, n, rows.shape[0]).astype(np.int32)
    coo = COOMatrix(
        rows=rows.astype(np.int32),
        cols=cols,
        vals=rng.standard_normal(rows.shape[0]).astype(np.float32),
        shape=(n, n),
    ).sum_duplicates()
    sr = sell_pack_routed(coo.to_csr(), hot="off")
    widths = collections.Counter(int(r[3]) for r in np.asarray(sr.regions))
    assert widths.get(16, 0) >= 1, widths
    x = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(jax.jit(spmv_routed)(to_device_routed(sr), x))
    ok, nbad, maxrel = verify(
        y, spmv_golden_numpy(coo.to_csr(), x), rtol=1e-6,
        row_scale=spmv_row_scale(coo.to_csr(), x),
    )
    assert ok, f"{nbad} bad rows, max rel {maxrel}"


def test_two_emission_groups(monkeypatch):
    """Uniform ~23-25 nnz rows give zone lambda-widths of 3 — not a
    regular-region width — so the reduce sweep sees 8-row groups with
    exactly two emissions at consecutive dests: the EMIT2 code
    (pallas_route.group_emit_encode, round 5).  The fast two-reduction
    branch must agree with the golden AND with the 8-iteration walk
    (CVR_EMIT2=0)."""
    import jax

    from cvr_tpu.ops.pallas_route import _EMIT2_BIT, group_emit_encode
    from cvr_tpu.ops.spmv_routed import spmv_routed, to_device_routed

    rng = np.random.default_rng(11)
    n = 4096
    deg = rng.integers(23, 26, n)
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    cols = rng.integers(0, n, rows.shape[0]).astype(np.int32)
    coo = COOMatrix(
        rows=rows.astype(np.int32),
        cols=cols,
        vals=rng.standard_normal(rows.shape[0]).astype(np.float32),
        shape=(n, n),
    ).sum_duplicates()
    csr = coo.to_csr()
    sr = sell_pack_routed(csr, hot="off")
    codes = group_emit_encode(np.asarray(sr.emit))
    n_two = int((codes >= _EMIT2_BIT).sum())
    assert n_two >= 8, f"fixture grew no two-emission groups: {n_two}"
    x = rng.standard_normal(n).astype(np.float32)
    gold = spmv_golden_numpy(csr, x)
    scale = spmv_row_scale(csr, x)
    y_fast = np.asarray(jax.jit(spmv_routed)(to_device_routed(sr), x))
    ok, nbad, maxrel = verify(y_fast, gold, rtol=1e-6, row_scale=scale)
    assert ok, f"EMIT2 branch: {nbad} bad rows, max rel {maxrel}"
    monkeypatch.setenv("CVR_EMIT2", "0")
    codes0 = group_emit_encode(np.asarray(sr.emit))
    assert int((codes0 >= _EMIT2_BIT).sum()) == 0
    y_walk = np.asarray(jax.jit(spmv_routed)(to_device_routed(sr), x))
    np.testing.assert_allclose(y_fast, y_walk, rtol=2e-5, atol=1e-6)
