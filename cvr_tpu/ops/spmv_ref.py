"""Reference (golden) SpMV implementations and the verifier.

The reference checks every optimized kernel in-binary against a scalar CSR
loop (spmv.cpp:1843-1850) with an absolute tolerance (spmv.cpp:1916-1938).
Here the golden path is float64 NumPy (bit-independent of JAX/XLA), and the
verifier uses a *relative* tolerance as CSR5 does (csr5/main.cpp:417-436) —
more meaningful across matrices with wildly different row norms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cvr_tpu.formats.coo import COOMatrix
from cvr_tpu.formats.csr import CSRMatrix


def spmv_golden_numpy(csr: CSRMatrix, x: np.ndarray) -> np.ndarray:
    """Float64 golden y = A @ x on host.  The trivially-correct baseline
    every kernel is verified against (ref: spmv.cpp:1843-1850)."""
    vals = csr.vals.astype(np.float64)
    xg = x.astype(np.float64)[csr.cols]
    prod = vals * xg
    y = np.zeros(csr.shape[0], dtype=np.float64)
    np.add.at(y, csr.row_ids(), prod)
    return y


def spmv_csr_jnp(
    rowptr: jax.Array, cols: jax.Array, vals: jax.Array, x: jax.Array, nrows: int
) -> jax.Array:
    """Pure-jnp CSR SpMV via gather + segment_sum.

    This is the XLA-native "CSR baseline" configuration of the benchmark
    (BASELINE.json config #1).  rowptr is used as segment boundaries through
    an expanded row-id array computed with searchsorted (static shapes).
    """
    nnz = cols.shape[0]
    row_ids = jnp.searchsorted(
        rowptr, jnp.arange(nnz, dtype=rowptr.dtype), side="right"
    ) - 1
    prod = vals * x[cols]
    return jax.ops.segment_sum(
        prod, row_ids, num_segments=nrows, indices_are_sorted=True
    )


def spmv_coo_jnp(
    rows: jax.Array, cols: jax.Array, vals: jax.Array, x: jax.Array, nrows: int
) -> jax.Array:
    """Pure-jnp COO SpMV (unsorted-safe segment_sum)."""
    return jax.ops.segment_sum(vals * x[cols], rows, num_segments=nrows)


def spmv_row_scale(csr: CSRMatrix, x: np.ndarray) -> np.ndarray:
    """Per-row magnitude scale s_r = sum_j |a_rj| |x_j| (float64).

    The numerically meaningful error bound for a reordered f32 summation is
    |y_r - y_ref_r| <= c * eps * s_r; raw relative error |dy|/|y| blows up
    on rows whose true sum cancels to ~0 even though every kernel involved
    is correct."""
    vals = np.abs(csr.vals.astype(np.float64))
    xg = np.abs(x.astype(np.float64))[csr.cols]
    s = np.zeros(csr.shape[0], dtype=np.float64)
    np.add.at(s, csr.row_ids(), vals * xg)
    return s


def verify(
    y: np.ndarray,
    y_ref: np.ndarray,
    rtol: float = 1e-6,
    atol: float = 1e-6,
    row_scale: np.ndarray | None = None,
) -> tuple[bool, int, float]:
    """Compare a kernel result against the golden result.

    Returns (ok, n_bad_rows, max_scaled_err).  Mirrors the reference's
    in-binary check that counts wrong rows (spmv.cpp:1916-1938).  Criterion:
    |y - y_ref| <= atol + rtol * scale, where scale is |y_ref| by default
    or the backward-error row scale sum|a||x| when ``row_scale`` is given
    (use spmv_row_scale; required for signed data where row sums cancel).
    """
    y = np.asarray(y, dtype=np.float64)
    y_ref = np.asarray(y_ref, dtype=np.float64)
    err = np.abs(y - y_ref)
    scale = np.abs(y_ref) if row_scale is None else np.asarray(row_scale)
    bad = err > atol + rtol * scale
    denom = np.maximum(scale, atol)
    max_rel = float((err / denom).max()) if err.size else 0.0
    return (not bool(bad.any()), int(bad.sum()), max_rel)
