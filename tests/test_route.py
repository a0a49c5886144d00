"""Tests for the static routing engine (cvr_tpu.ops.route).

The route is the TPU answer to the reference's hardware vector gather
(`_mm512_i32logather_pd`, spmv.cpp:1227): arbitrary static permutations
compiled into Clos stages a TPU executes at vector rate.
"""

import numpy as np
import pytest

from cvr_tpu.ops.route import (
    TILE,
    apply_route_numpy,
    euler_color_py,
    plan_route,
)


@pytest.mark.parametrize("n", [1024, 2048, 5000, 40_000])
def test_route_random_permutation(n):
    rng = np.random.default_rng(n)
    perm = rng.permutation(n)
    plan = plan_route(perm)
    v = rng.standard_normal(n).astype(np.float32)
    out = apply_route_numpy(plan, v)
    np.testing.assert_array_equal(out, v[perm])


def test_route_identity_and_reverse():
    n = 4096
    v = np.arange(n, dtype=np.float32)
    np.testing.assert_array_equal(
        apply_route_numpy(plan_route(np.arange(n)), v), v
    )
    np.testing.assert_array_equal(
        apply_route_numpy(plan_route(np.arange(n)[::-1].copy()), v), v[::-1]
    )


def test_route_non_multiple_of_tile():
    # n not a multiple of 1024: tail is identity-padded internally.
    n = 3000
    rng = np.random.default_rng(0)
    perm = rng.permutation(n)
    v = rng.standard_normal(n).astype(np.float32)
    np.testing.assert_array_equal(
        apply_route_numpy(plan_route(perm), v), v[perm]
    )


def test_euler_coloring_is_proper():
    """No two edges sharing a source or dest tile may share a color."""
    rng = np.random.default_rng(7)
    n = 8 * TILE
    perm = rng.permutation(n)
    src = (perm // TILE).astype(np.int32)
    dst = (np.arange(n) // TILE).astype(np.int32)
    colors = euler_color_py(src, dst, n // TILE, TILE)
    for side in (src, dst):
        # (tile, color) pairs must be unique
        key = side.astype(np.int64) * TILE + colors
        assert np.unique(key).shape[0] == n


def test_euler_coloring_native_matches_properness():
    from cvr_tpu import _native

    if not _native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(8)
    n = 16 * TILE
    perm = rng.permutation(n)
    src = (perm // TILE).astype(np.int32)
    dst = (np.arange(n) // TILE).astype(np.int32)
    colors = _native.euler_color_native(src, dst, n // TILE, TILE)
    assert colors.min() >= 0 and colors.max() < TILE
    for side in (src, dst):
        key = side.astype(np.int64) * TILE + colors
        assert np.unique(key).shape[0] == n


def test_route_plan_planes_are_gather_form():
    rng = np.random.default_rng(3)
    n = 4096
    plan = plan_route(rng.permutation(n))
    T = plan.n_tiles
    assert plan.s1.shape == (T, TILE)
    assert plan.mid.shape == (TILE, T)
    assert plan.s3.shape == (T, TILE)
    # each stage's rows must each be a permutation of their index range
    for row in plan.s1:
        assert np.unique(row).shape[0] == TILE
    for row in plan.mid:
        assert np.unique(row).shape[0] == T
    for row in plan.s3:
        assert np.unique(row).shape[0] == TILE
