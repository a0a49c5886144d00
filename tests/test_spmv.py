"""Kernel correctness: every SpMV/SpMM implementation vs the float64 golden
reference — the framework-level version of the reference's in-binary check
(spmv.cpp:1916-1938)."""

import numpy as np
import pytest

import cvr_tpu
from cvr_tpu.formats.sell import sell_pack
from cvr_tpu.ops.spmv import sell_spmm_xla, sell_spmv_xla, spmm, spmv, to_device
from cvr_tpu.ops.spmv_ref import spmv_coo_jnp, spmv_golden_numpy, verify

from conftest import make_powerlaw_coo, make_random_coo

import jax.numpy as jnp


RTOL = 2e-5  # f32 accumulation vs f64 golden


def golden(coo, x):
    return spmv_golden_numpy(coo.to_csr(), x)


@pytest.fixture
def x_random(random_coo):
    rng = np.random.default_rng(7)
    return rng.standard_normal(random_coo.shape[1]).astype(np.float32)


class TestCSRJnp:
    def test_matches_golden(self, random_coo, x_random):
        csr = random_coo.to_csr()
        y = np.asarray(spmv(csr, x_random))
        ok, nbad, maxrel = verify(y, golden(random_coo, x_random), rtol=RTOL)
        assert ok, f"{nbad} bad rows, max rel err {maxrel}"

    def test_constant_x_fixture(self, random_coo):
        # The reference's deterministic fixture: x = 1.0 (spmv.cpp:556-563).
        x = np.ones(random_coo.shape[1], dtype=np.float32)
        y = np.asarray(spmv(random_coo.to_csr(), x))
        ref = np.asarray(random_coo.to_scipy().sum(axis=1)).ravel()
        np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)


class TestCOOJnp:
    def test_matches_golden(self, random_coo, x_random):
        y = np.asarray(
            spmv_coo_jnp(
                jnp.asarray(random_coo.rows),
                jnp.asarray(random_coo.cols),
                jnp.asarray(random_coo.vals),
                jnp.asarray(x_random),
                random_coo.shape[0],
            )
        )
        ok, nbad, maxrel = verify(y, golden(random_coo, x_random), rtol=RTOL)
        assert ok, f"{nbad} bad rows, max rel err {maxrel}"


class TestSellXLA:
    @pytest.mark.parametrize("C", [8, 128, 1024])
    def test_matches_golden_random(self, random_coo, x_random, C):
        sm = sell_pack(random_coo.to_csr(), C=C)
        y = np.asarray(sell_spmv_xla(to_device(sm), jnp.asarray(x_random)))
        ok, nbad, maxrel = verify(y, golden(random_coo, x_random), rtol=RTOL)
        assert ok, f"C={C}: {nbad} bad rows, max rel err {maxrel}"

    @pytest.mark.parametrize("sigma", [0, 256])
    def test_matches_golden_powerlaw(self, powerlaw_coo, sigma):
        rng = np.random.default_rng(3)
        x = rng.standard_normal(powerlaw_coo.shape[1]).astype(np.float32)
        sm = sell_pack(powerlaw_coo.to_csr(), C=128, sigma=sigma)
        y = np.asarray(sell_spmv_xla(to_device(sm), jnp.asarray(x)))
        ok, nbad, maxrel = verify(y, golden(powerlaw_coo, x), rtol=RTOL)
        assert ok, f"{nbad} bad rows, max rel err {maxrel}"

    def test_empty_rows_give_zero(self):
        from cvr_tpu.formats.coo import COOMatrix

        coo = COOMatrix(
            rows=np.array([1]),
            cols=np.array([1]),
            vals=np.array([3.0], dtype=np.float32),
            shape=(4, 2),
        )
        sm = sell_pack(coo.to_csr(), C=8)
        y = np.asarray(spmv(sm, np.array([5.0, 2.0], dtype=np.float32)))
        np.testing.assert_allclose(y, [0.0, 6.0, 0.0, 0.0])

    def test_split_long_rows(self):
        """Mega-row forces segment splitting (the AOT 'steal'): SpMV must
        still match golden, via the scatter-add combine path."""
        from cvr_tpu.formats.coo import COOMatrix

        rng = np.random.default_rng(5)
        n = 500
        rows = np.concatenate(
            [
                np.zeros(n, dtype=np.int32),  # one row with 500 nnz
                rng.integers(1, 50, size=300).astype(np.int32),
            ]
        )
        cols = rng.integers(0, n, size=rows.shape[0]).astype(np.int32)
        vals = rng.standard_normal(rows.shape[0]).astype(np.float32)
        coo = COOMatrix(rows, cols, vals, shape=(50, n)).sum_duplicates()
        x = rng.standard_normal(n).astype(np.float32)
        sm = sell_pack(coo.to_csr(), C=8, split_len=32)
        assert sm.n_splits > 0
        y = np.asarray(spmv(sm, x))
        ok, nbad, maxrel = verify(y, golden(coo, x), rtol=RTOL)
        assert ok, f"{nbad} bad rows, max rel err {maxrel}"

    def test_rectangular(self):
        coo = make_random_coo(64, 200, density=0.1, seed=9)
        x = np.random.default_rng(0).standard_normal(200).astype(np.float32)
        sm = sell_pack(coo.to_csr(), C=8)
        y = np.asarray(spmv(sm, x))
        ok, nbad, maxrel = verify(y, golden(coo, x), rtol=RTOL)
        assert ok


class TestSpMM:
    @pytest.mark.parametrize("K", [1, 8, 64])
    def test_matches_golden(self, random_coo, K):
        rng = np.random.default_rng(11)
        X = rng.standard_normal((random_coo.shape[1], K)).astype(np.float32)
        sm = sell_pack(random_coo.to_csr(), C=128)
        Y = np.asarray(spmm(sm, X))
        ref = random_coo.to_scipy().astype(np.float64) @ X.astype(np.float64)
        np.testing.assert_allclose(Y, ref, rtol=1e-4, atol=1e-5)

    def test_csr_spmm(self, random_coo):
        rng = np.random.default_rng(12)
        X = rng.standard_normal((random_coo.shape[1], 4)).astype(np.float32)
        Y = np.asarray(spmm(random_coo.to_csr(), X))
        ref = random_coo.to_scipy().astype(np.float64) @ X.astype(np.float64)
        np.testing.assert_allclose(Y, ref, rtol=1e-4, atol=1e-5)


class TestVerify:
    def test_detects_bad_rows(self):
        y = np.array([1.0, 2.0, 3.0])
        ref = np.array([1.0, 2.5, 3.0])
        ok, nbad, _ = verify(y, ref)
        assert not ok and nbad == 1

    def test_passes_identical(self):
        y = np.array([1.0, -2.0, 0.0])
        ok, nbad, maxrel = verify(y, y.copy())
        assert ok and nbad == 0 and maxrel == 0.0
