"""2D (row x col) mesh distributed SpMV (cvr_tpu/parallel/dist2d.py).

Runs on the virtual 8-device CPU mesh (tests/conftest.py).  The 2D path
is the comm model's prescription past the 1D ring's weak-scaling knee
(docs/PARITY.md): x sharded over the column axis, all-gathered over
rows only, y reduce-scattered over columns.
"""

import numpy as np
import pytest

import jax

from tests.conftest import make_powerlaw_coo, make_random_coo
from cvr_tpu.bench.synthetic import banded_matrix
from cvr_tpu.ops.spmv_ref import spmv_golden_numpy, spmv_row_scale, verify
from cvr_tpu.parallel.dist2d import (
    dist_routed_pack_2d,
    dist_spmv_routed_2d,
    make_mesh2d,
)


def _run(coo, R, C, seed=0):
    csr = coo.to_csr()
    mesh = make_mesh2d(R, C)
    dm = dist_routed_pack_2d(csr, mesh)
    x = (
        np.random.default_rng(seed)
        .standard_normal(coo.shape[1])
        .astype(np.float32)
    )
    y = np.asarray(jax.jit(lambda v: dist_spmv_routed_2d(dm, v))(x))
    ok, nbad, maxrel = verify(
        y, spmv_golden_numpy(csr, x), rtol=1e-6,
        row_scale=spmv_row_scale(csr, x),
    )
    assert ok, f"{nbad} bad rows, max rel {maxrel}"
    return dm


@pytest.mark.parametrize("shape", [(4, 2), (2, 4)])
def test_2d_powerlaw(shape):
    coo = make_powerlaw_coo(9000, 9000, avg_nnz=7, seed=4)
    _run(coo, *shape)


def test_2d_banded_balance():
    """Near-diagonal matrix: cyclic column windows must keep the
    (i, j) blocks balanced (contiguous column ranges would put all nnz
    in the diagonal blocks)."""
    coo = banded_matrix(n=6000, bandwidth=9, seed=2)
    dm = _run(coo, 4, 2)
    # per-block nnz balance: every (i, j) block within 3x of the mean
    csr = coo.to_csr()
    w = (csr.cols >> 10).astype(np.int64)
    rows = csr.row_ids()
    per = np.zeros((4, 2), dtype=np.int64)
    for i in range(4):
        lo, hi = dm.bounds[i], dm.bounds[i + 1]
        sel = (rows >= lo) & (rows < hi)
        for j in range(2):
            per[i, j] = int(((w[sel] % 2) == j).sum())
    assert per.max() <= 3 * max(per.mean(), 1)


def test_2d_rect_and_odd_cols():
    # rectangular matrix with ncols not a multiple of 1024 * C
    coo = make_random_coo(3000, 5000, density=0.004, seed=6)
    _run(coo, 2, 2)
