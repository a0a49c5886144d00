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


def verify(
    y: np.ndarray,
    y_ref: np.ndarray,
    rtol: float = 1e-6,
    atol: float = 1e-6,
) -> tuple[bool, int, float]:
    """Compare a kernel result against the golden result.

    Returns (ok, n_bad_rows, max_rel_err).  Mirrors the reference's
    in-binary check that counts wrong rows (spmv.cpp:1916-1938) but with a
    mixed relative/absolute criterion: |y - y_ref| <= atol + rtol * |y_ref|.
    """
    y = np.asarray(y, dtype=np.float64)
    y_ref = np.asarray(y_ref, dtype=np.float64)
    err = np.abs(y - y_ref)
    bound = atol + rtol * np.abs(y_ref)
    bad = err > bound
    denom = np.maximum(np.abs(y_ref), atol)
    max_rel = float((err / denom).max()) if err.size else 0.0
    return (not bool(bad.any()), int(bad.sum()), max_rel)
