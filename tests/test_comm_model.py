"""Comm-volume model sanity (hardware-free weak-scaling projection)."""

import numpy as np

from cvr_tpu.parallel.comm_model import (
    comm_table,
    knee_devices,
    routed_stream_bytes,
    weak_scaling,
)


def test_weak_scaling_monotone_and_overlap_dominates():
    t_comp, ncols = 1.1e-3, 916_428
    prev_b = prev_o = 1.1
    for d in (2, 4, 8, 16, 64, 256):
        _, e_b, e_o = weak_scaling(t_comp, ncols, d)
        assert 0 < e_b <= prev_b + 1e-12
        assert 0 < e_o <= prev_o + 1e-12
        # overlap can only help (hides comm behind the expand pass)
        assert e_o >= e_b - 1e-12
        prev_b, prev_o = e_b, e_o


def test_single_device_is_free():
    t_comm, e_b, e_o = weak_scaling(1e-3, 10**6, 1)
    assert t_comm == 0.0
    assert e_b == 1.0 and e_o == 1.0


def test_knee_is_past_eight_for_bench_domains():
    # the measured single-chip domains all keep E>=70% on an 8-ring
    kb, ko = knee_devices(1.1e-3, 916_428)
    assert kb >= 8 and ko >= kb


def test_comm_table_skips_shapeless_rows():
    rows = [
        {"name": "old", "nnz": 10, "padded_nnz": 12, "spmv_s": 1e-3},
        {
            "name": "new",
            "ncols": 1000,
            "nnz": 10,
            "padded_nnz": 12,
            "spmv_s": 1e-3,
        },
    ]
    out = comm_table(rows, D=8)
    assert [c.name for c in out] == ["new"]
    c = out[0]
    assert c.gather_bytes == 7 * 1000 * 4
    assert c.stream_bytes == routed_stream_bytes(12)
    assert np.isfinite(c.eff_blocking) and c.eff_overlap >= c.eff_blocking
