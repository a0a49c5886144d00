"""MatrixMarket reader/writer tests, incl. the header semantics the
reference implements (spmv.cpp:344-371) and the 1-based-index fix."""

import gzip

import numpy as np
import pytest

from cvr_tpu.io.mmio import (
    MatrixMarketError,
    read_matrix_market,
    write_matrix_market,
)
from cvr_tpu.formats.coo import COOMatrix


def write(tmp_path, text, name="m.mtx"):
    p = tmp_path / name
    p.write_text(text)
    return p


BASIC = """%%MatrixMarket matrix coordinate real general
% a comment
3 4 4
1 1 1.5
2 3 -2.0
3 4 0.25
3 1 7
"""


def test_basic_real_general(tmp_path):
    coo = read_matrix_market(write(tmp_path, BASIC))
    assert coo.shape == (3, 4)
    assert coo.nnz == 4
    dense = coo.to_dense()
    # 0-based: entry "1 1 1.5" must land at [0, 0] (the reference leaves
    # it at [1, 1], spmv.cpp:436-438 — that bug is NOT reproduced).
    assert dense[0, 0] == 1.5
    assert dense[1, 2] == -2.0
    assert dense[2, 3] == 0.25
    assert dense[2, 0] == 7.0


def test_gzip(tmp_path):
    p = tmp_path / "m.mtx.gz"
    with gzip.open(p, "wt") as f:
        f.write(BASIC)
    coo = read_matrix_market(p)
    assert coo.nnz == 4


def test_pattern_mod13(tmp_path):
    text = "%%MatrixMarket matrix coordinate pattern general\n3 3 3\n1 1\n2 2\n3 3\n"
    coo = read_matrix_market(write(tmp_path, text), pattern_values="mod13")
    # Reference convention: val = entry_index % 13 (spmv.cpp:413-422).
    np.testing.assert_array_equal(coo.vals, [0.0, 1.0, 2.0])
    coo1 = read_matrix_market(write(tmp_path, text), pattern_values="ones")
    np.testing.assert_array_equal(coo1.vals, [1.0, 1.0, 1.0])


def test_symmetric_mirror(tmp_path):
    text = (
        "%%MatrixMarket matrix coordinate real symmetric\n"
        "3 3 3\n1 1 2.0\n2 1 3.0\n3 2 4.0\n"
    )
    coo = read_matrix_market(write(tmp_path, text))
    dense = coo.to_dense()
    assert dense[0, 0] == 2.0
    assert dense[1, 0] == 3.0 and dense[0, 1] == 3.0  # mirrored
    assert dense[2, 1] == 4.0 and dense[1, 2] == 4.0
    assert coo.nnz == 5  # diagonal not duplicated


def test_skew_symmetric(tmp_path):
    text = (
        "%%MatrixMarket matrix coordinate real skew-symmetric\n"
        "2 2 1\n2 1 5.0\n"
    )
    dense = read_matrix_market(write(tmp_path, text)).to_dense()
    assert dense[1, 0] == 5.0 and dense[0, 1] == -5.0


def test_complex_keeps_real_part(tmp_path):
    text = (
        "%%MatrixMarket matrix coordinate complex general\n"
        "2 2 2\n1 1 1.5 9.0\n2 2 -2.5 3.0\n"
    )
    coo = read_matrix_market(write(tmp_path, text))
    np.testing.assert_allclose(coo.vals, [1.5, -2.5])


def test_integer_field(tmp_path):
    text = "%%MatrixMarket matrix coordinate integer general\n2 2 2\n1 2 3\n2 1 -4\n"
    coo = read_matrix_market(write(tmp_path, text))
    np.testing.assert_allclose(sorted(coo.vals), [-4.0, 3.0])


def test_array_format(tmp_path):
    text = "%%MatrixMarket matrix array real general\n2 2\n1.0\n2.0\n3.0\n4.0\n"
    dense = read_matrix_market(write(tmp_path, text)).to_dense()
    # array format is column-major
    np.testing.assert_allclose(dense, [[1.0, 3.0], [2.0, 4.0]])


def test_array_symmetric(tmp_path):
    text = "%%MatrixMarket matrix array real symmetric\n2 2\n1.0\n2.0\n3.0\n"
    dense = read_matrix_market(write(tmp_path, text)).to_dense()
    np.testing.assert_allclose(dense, [[1.0, 2.0], [2.0, 3.0]])


def test_bad_banner(tmp_path):
    with pytest.raises(MatrixMarketError):
        read_matrix_market(write(tmp_path, "%%NotMM matrix\n1 1 0\n"))


def test_truncated(tmp_path):
    text = "%%MatrixMarket matrix coordinate real general\n3 3 5\n1 1 1.0\n"
    with pytest.raises(MatrixMarketError):
        read_matrix_market(write(tmp_path, text))


def test_write_read_roundtrip(tmp_path, random_coo):
    p = tmp_path / "rt.mtx"
    write_matrix_market(p, random_coo)
    back = read_matrix_market(p)
    np.testing.assert_allclose(
        back.to_dense(), random_coo.to_dense(), rtol=1e-6
    )


def test_out_of_range_indices_rejected(tmp_path):
    """Out-of-range entries in an untrusted file must die as a parse
    error in BOTH parsers — unchecked they flow into the native pack
    passes' histogram writes (heap corruption class)."""
    import pytest

    from cvr_tpu.io.mmio import MatrixMarketError, read_matrix_market

    for body in ("2 0 2.0", "2 9 2.0", "0 1 2.0", "9 1 2.0"):
        p = tmp_path / "bad.mtx"
        p.write_text(
            "%%MatrixMarket matrix coordinate real general\n"
            f"3 3 2\n1 1 1.0\n{body}\n"
        )
        with pytest.raises(MatrixMarketError):
            read_matrix_market(p)
