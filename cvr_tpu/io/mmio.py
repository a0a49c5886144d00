"""MatrixMarket (.mtx) reader / writer.

Reproduces the ingest capability of the reference (readMatrix,
spmv.cpp:311-535 and the vendored mmio.{h,cpp} in csr5/vhcc) with the same
header semantics — object/format/field/symmetry (ref: spmv.cpp:344-371) —
but with two deliberate fixes over the reference:

  * 1-based MatrixMarket indices ARE converted to 0-based.  The reference
    skips this (commented out at spmv.cpp:436-438), leaving row 0 empty and
    shifting all columns; we do it correctly.
  * values are parsed at float64 precision (the reference parses into a
    float field even though compute is double, spmv.cpp:62-66,432-433).

Pattern matrices get deterministic synthetic values; ``pattern_values`` picks
between the reference's convention (``"mod13"``: val = entry_index % 13,
ref: spmv.cpp:413-422) and all-ones (CSR5's convention,
csr5/main.cpp:366-371).  Symmetric / skew-symmetric / hermitian matrices are
expanded by mirroring off-diagonal entries (ref: spmv.cpp:443-449).
"""

from __future__ import annotations

import gzip
import io as _io
from pathlib import Path

import numpy as np

from cvr_tpu.formats.coo import COOMatrix

_VALID_FIELDS = ("real", "integer", "pattern", "complex")
_VALID_SYMMETRIES = ("general", "symmetric", "skew-symmetric", "hermitian")


class MatrixMarketError(ValueError):
    pass


def _open_text(path: str | Path):
    path = Path(path)
    if path.suffix == ".gz":
        return gzip.open(path, "rt")
    return open(path, "rt")


def _parse_header(line: str) -> tuple[str, str, str, str]:
    parts = line.strip().split()
    if len(parts) != 5 or parts[0] != "%%MatrixMarket":
        raise MatrixMarketError(f"bad MatrixMarket banner: {line!r}")
    _, obj, fmt, field, symmetry = (p.lower() for p in parts)
    if obj != "matrix":
        raise MatrixMarketError(f"unsupported object {obj!r}")
    if fmt not in ("coordinate", "array"):
        raise MatrixMarketError(f"unsupported format {fmt!r}")
    if field not in _VALID_FIELDS:
        raise MatrixMarketError(f"unsupported field {field!r}")
    if symmetry not in _VALID_SYMMETRIES:
        raise MatrixMarketError(f"unsupported symmetry {symmetry!r}")
    return obj, fmt, field, symmetry


def read_matrix_market(
    path: str | Path,
    *,
    pattern_values: str = "mod13",
    dtype=np.float32,
    index_dtype=np.int32,
    use_native: bool | None = None,
) -> COOMatrix:
    """Read a MatrixMarket file into a COOMatrix (0-based, unsorted).

    pattern_values: "mod13" (reference convention, spmv.cpp:417) or "ones"
    (CSR5 convention).  Complex matrices keep the real part.

    The native mmap/parallel parser (native/cvr_native.cpp) is used for
    plain coordinate files when available; gzip, 'array' format and
    non-f32 dtypes take the Python path.
    """
    path = Path(path)
    if use_native is None:
        use_native = (
            path.suffix != ".gz"
            and dtype == np.float32
            and index_dtype == np.int32
            and pattern_values in ("mod13", "ones")
        )
    if use_native:
        try:
            return _read_native(path, pattern_values, dtype, index_dtype)
        except Exception:
            pass  # fall through to the Python parser

    with _open_text(path) as f:
        header = f.readline()
        _, fmt, field, symmetry = _parse_header(header)
        # Skip comments / blank lines to the size line.
        line = f.readline()
        while line and (line.startswith("%") or not line.strip()):
            line = f.readline()
        if not line:
            raise MatrixMarketError("missing size line")
        size = line.split()

        if fmt == "array":
            return _read_array(f, size, field, symmetry, dtype, index_dtype)

        if len(size) != 3:
            raise MatrixMarketError(f"bad coordinate size line: {line!r}")
        nrows, ncols, nnz = (int(s) for s in size)

        ncols_per_line = {"pattern": 2, "real": 3, "integer": 3, "complex": 4}[field]
        # np.loadtxt (C tokenizer in numpy>=1.23) is the fast pure-Python
        # path; the native C++ parser (cvr_tpu.io.native) is faster still.
        data = np.loadtxt(
            f, dtype=np.float64, comments="%", max_rows=nnz, ndmin=2
        )
        if data.shape[0] != nnz:
            raise MatrixMarketError(
                f"expected {nnz} entries, file has {data.shape[0]}"
            )
        if data.size and data.shape[1] < ncols_per_line:
            raise MatrixMarketError(
                f"field {field!r} needs {ncols_per_line} columns per entry, "
                f"file has {data.shape[1]}"
            )

    # 1-based -> 0-based (the reference skips this, spmv.cpp:436-438; we fix).
    rows = data[:, 0].astype(index_dtype) - 1
    cols = data[:, 1].astype(index_dtype) - 1
    # Range-validate against the header: out-of-range indices from an
    # untrusted file must die here, not as out-of-bounds writes in the
    # native pack passes (the native parser applies the same gate).
    if data.size and (
        rows.min() < 0
        or cols.min() < 0
        or rows.max() >= nrows
        or cols.max() >= ncols
    ):
        raise MatrixMarketError(
            "entry index out of the header's range "
            f"(nrows={nrows}, ncols={ncols})"
        )
    if field == "pattern":
        if pattern_values == "mod13":
            # Deterministic values, reference convention spmv.cpp:413-422.
            vals = (np.arange(nnz, dtype=np.int64) % 13).astype(np.float64)
        elif pattern_values == "ones":
            vals = np.ones(nnz, dtype=np.float64)
        else:
            raise ValueError(f"unknown pattern_values {pattern_values!r}")
    else:
        vals = data[:, 2].astype(np.float64)  # complex: keep real part

    if symmetry != "general":
        # Mirror off-diagonal entries (ref: spmv.cpp:443-449).
        off = rows != cols
        sign = -1.0 if symmetry == "skew-symmetric" else 1.0
        rows = np.concatenate([rows, cols[off]])
        cols_m = np.concatenate([cols, data[off, 0].astype(index_dtype) - 1])
        vals = np.concatenate([vals, sign * vals[off]])
        cols = cols_m

    return COOMatrix(
        rows=rows,
        cols=cols,
        vals=vals.astype(dtype),
        shape=(nrows, ncols),
    )


def _read_native(path, pattern_values, dtype, index_dtype) -> COOMatrix:
    """Native-parser path: raw triples from C++, symmetry expansion here."""
    from cvr_tpu import _native

    rows, cols, vals, nrows, ncols, field, symmetry = _native.mtx_read_native(
        path, pattern_mode=0 if pattern_values == "mod13" else 1
    )
    if symmetry != "general":
        off = rows != cols
        sign = np.float32(-1.0 if symmetry == "skew-symmetric" else 1.0)
        rows, cols = (
            np.concatenate([rows, cols[off]]),
            np.concatenate([cols, rows[off]]),
        )
        vals = np.concatenate([vals, sign * vals[off]])
    return COOMatrix(rows=rows, cols=cols, vals=vals, shape=(nrows, ncols))


def _read_array(f, size, field, symmetry, dtype, index_dtype) -> COOMatrix:
    """Dense 'array' format: column-major list of values -> COO of nonzeros."""
    if len(size) != 2:
        raise MatrixMarketError("bad array size line")
    nrows, ncols = (int(s) for s in size)
    if field == "pattern":
        raise MatrixMarketError("array + pattern is not a valid combination")
    vals = np.loadtxt(f, dtype=np.float64, comments="%", ndmin=2)
    vals = vals[:, 0]  # complex: keep real part
    if symmetry == "general":
        if vals.size != nrows * ncols:
            raise MatrixMarketError("array entry count mismatch")
        dense = vals.reshape((ncols, nrows)).T  # column-major on disk
    else:
        # Lower triangle stored column-by-column.
        dense = np.zeros((nrows, ncols), dtype=np.float64)
        k = 0
        sign = -1.0 if symmetry == "skew-symmetric" else 1.0
        for j in range(ncols):
            n_in_col = nrows - j
            col = vals[k : k + n_in_col]
            dense[j:, j] = col
            dense[j, j:] = sign * col
            if symmetry == "skew-symmetric":
                dense[j, j] = 0.0
            k += n_in_col
    rr, cc = np.nonzero(dense)
    return COOMatrix(
        rows=rr.astype(index_dtype),
        cols=cc.astype(index_dtype),
        vals=dense[rr, cc].astype(dtype),
        shape=(nrows, ncols),
    )


def write_matrix_market(path: str | Path, coo: COOMatrix) -> None:
    """Write a COOMatrix as a general real coordinate MatrixMarket file."""
    path = Path(path)
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write(f"{coo.shape[0]} {coo.shape[1]} {coo.nnz}\n")
        buf = _io.StringIO()
        np.savetxt(
            buf,
            np.column_stack(
                [coo.rows + 1, coo.cols + 1, coo.vals.astype(np.float64)]
            ),
            fmt="%d %d %.17g",
        )
        f.write(buf.getvalue())
