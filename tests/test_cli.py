"""CLI tests (CPU backend), driving the reference-style driver UX."""

import numpy as np
import pytest

from cvr_tpu.cli import main
from cvr_tpu.io.mmio import write_matrix_market

from conftest import make_random_coo


@pytest.fixture
def mtx(tmp_path):
    coo = make_random_coo(300, 300, density=0.03, seed=21)
    p = tmp_path / "m.mtx"
    write_matrix_market(p, coo)
    return str(p)


def test_info(mtx, capsys):
    assert main(["info", mtx]) == 0
    out = capsys.readouterr().out
    assert "rows: 300" in out and "sell-pack:" in out


def test_spmv(mtx, capsys):
    assert main(["spmv", mtx, "--iters", "3", "--c", "128"]) == 0
    out = capsys.readouterr().out
    assert "Pre-processing Time" in out
    assert "SpMV Execution Time" in out
    assert "Verification: PASS" in out


def test_spmv_csr(mtx, capsys):
    assert main(["spmv", mtx, "--iters", "2", "--format", "csr"]) == 0
    assert "Throughput" in capsys.readouterr().out


def test_spmm(mtx, capsys):
    assert main(["spmv", mtx, "--iters", "2", "--rhs", "8", "--c", "128"]) == 0
    out = capsys.readouterr().out
    assert "SpMM Execution Time" in out


def test_save_load_packed(mtx, tmp_path, capsys):
    packed = str(tmp_path / "m.packed.npz")
    assert (
        main(
            ["spmv", mtx, "--iters", "2", "--c", "128",
             "--save-packed", packed]
        )
        == 0
    )
    capsys.readouterr()
    assert (
        main(["spmv", mtx, "--iters", "2", "--load-packed", packed]) == 0
    )
    out = capsys.readouterr().out
    assert "loaded artifact" in out and "Verification: PASS" in out


def test_compare(mtx, capsys):
    assert main(["compare", mtx, "--iters", "2"]) == 0
    out = capsys.readouterr().out
    assert "Best:" in out


def test_threads_flag_accepted(mtx):
    # Reference CLI compatibility: --threads parses and is ignored.
    assert main(["info", mtx, "--threads", "68"]) == 0
