"""BSR-128: dense-brick format for MXU SpMM on locality-structured matrices.

SpMV on TPU is gather-bound (docs/DESIGN.md) — but SpMM with a wide
dense RHS changes the economics completely.  For every occupied
128x128 column brick of A, the contribution ``Y[rb] += A_brick @
X[cb]`` is a dense [128,128] x [128,K] matmul: exactly the shape the
MXU's systolic array runs at peak.  On a locality-structured matrix
(the reference's road / routing / FEM / engineering domains, CVR paper
Table 2) the brick fill ratio is 5-15%, so even paying the 1/fill FLOP
blowup of densification the MXU's ~200 Tflop/s turns into hundreds of
*useful* GFLOPS — 10-30x over running the gather-based SpMV kernel K
times (the reference has no SpMM at all; its closest analogue is the
dense-block 2D cache blocking of VHCC, vhcc_matrix.h:300-375, which
also trades padding for streaming regularity).

Precision: bricks and X are split into three bf16 planes (hi/mid/lo
covering the full f32 mantissa); the six significant cross terms are
accumulated in f32 on the MXU, giving ~2e-7 relative error vs a float64
golden — the same verification contract as the SpMV paths
(spmv.cpp:1916-1938 analogue in cvr_tpu/ops/spmv_ref.py).

``bsr_pack`` raises :class:`BsrInfeasible` when densification would
explode memory (power-law matrices — fill below ``min_fill``); callers
fall back to the vmapped routed SpMM.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from cvr_tpu.formats.csr import CSRMatrix
from cvr_tpu.utils.timing import PhaseTimer

B = 128  # brick edge: one MXU tile


class BsrInfeasible(ValueError):
    """Brick fill too low — densification would waste memory/FLOPs."""


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclass
class BsrMatrix:
    """Host-side BSR-128 artifact (dense f32 bricks, sorted by row block)."""

    vals: np.ndarray  # (nbricks, B, B) f32 dense bricks
    brick_row: np.ndarray  # (nbricks,) int32, non-decreasing
    brick_col: np.ndarray  # (nbricks,) int32
    shape: tuple[int, int]
    nnz: int
    convert_time: float = 0.0
    convert_phases: dict = field(default_factory=dict)

    @property
    def nbricks(self) -> int:
        return int(self.vals.shape[0])

    @property
    def fill(self) -> float:
        return self.nnz / max(1, self.nbricks * B * B)

    @property
    def padded_nnz(self) -> int:
        return self.nbricks * B * B

    def save(self, path: str | Path) -> None:
        np.savez_compressed(
            path,
            vals=self.vals, brick_row=self.brick_row,
            brick_col=self.brick_col,
            shape=np.asarray(self.shape, dtype=np.int64),
            nnz=np.int64(self.nnz),
        )

    @staticmethod
    def load(path: str | Path) -> "BsrMatrix":
        z = np.load(path)
        return BsrMatrix(
            vals=z["vals"], brick_row=z["brick_row"],
            brick_col=z["brick_col"],
            shape=tuple(int(v) for v in z["shape"]),
            nnz=int(z["nnz"]),
        )


def bsr_pack(
    csr: CSRMatrix,
    min_fill: float = 0.005,
    max_bytes: int = 6 << 30,
) -> BsrMatrix:
    """CSR -> BSR-128 densification (O(nnz log nnz); a reported metric).

    min_fill / max_bytes gate the densification cost: a power-law matrix
    scatters nnz across bricks so thinly that dense bricks are pure
    waste — those raise BsrInfeasible (use spmm's vmapped routed path).
    """
    from cvr_tpu import _native

    pt = PhaseTimer()
    nrows, ncols = csr.shape
    nnz = csr.nnz
    ncb = max(1, _round_up(ncols, B) // B)
    native_ok = _native.available()

    with pt.phase("bricks"):
        if native_ok:
            nb = _native.bsr_count_native(nrows, ncb, csr.rowptr, csr.cols)
        else:
            lengths = np.diff(csr.rowptr)
            r = np.repeat(np.arange(nrows, dtype=np.int64), lengths)
            c = csr.cols.astype(np.int64)
            key = (r >> 7) * ncb + (c >> 7)
            bricks, inv = np.unique(key, return_inverse=True)
            nb = int(bricks.shape[0])
        if nb * B * B * 4 > max_bytes:
            raise BsrInfeasible(
                f"{nb} bricks = {nb * B * B * 4 / 1e9:.1f} GB dense "
                f"(max {max_bytes / 1e9:.1f} GB)"
            )
        fill = nnz / max(1, nb * B * B)
        if fill < min_fill:
            raise BsrInfeasible(
                f"brick fill {fill:.4f} < {min_fill} — no block locality; "
                "use the routed SpMM"
            )

    with pt.phase("fill"):
        if native_ok:
            brick_row, brick_col, vals = _native.bsr_fill_native(
                nrows, ncb, csr.rowptr, csr.cols,
                csr.vals.astype(np.float32), nb,
            )
        else:
            brick_row = (bricks // ncb).astype(np.int32)
            brick_col = (bricks % ncb).astype(np.int32)
            vals = np.zeros((nb, B, B), dtype=np.float32)
            dest = (inv << 14) + ((r & 127) << 7) + (c & 127)
            # CSR has unique (row, col) pairs so plain scatter is exact.
            vals.reshape(-1)[dest] = csr.vals.astype(np.float32)
        # The fused Pallas kernel (ops/pallas_bsr.py) zeroes an output
        # block only when a brick visits it; a row block with no bricks
        # (128 consecutive empty rows) would leave its Y rows as
        # uninitialized HBM.  Guarantee every row block is visited by
        # emitting one all-zero brick per empty row block.
        nrb = max(1, _round_up(nrows, B) // B)
        missing = np.setdiff1d(
            np.arange(nrb, dtype=np.int32), brick_row, assume_unique=False
        )
        if missing.shape[0]:
            vals = np.concatenate(
                [vals, np.zeros((missing.shape[0], B, B), np.float32)]
            )
            brick_row = np.concatenate([brick_row, missing])
            brick_col = np.concatenate(
                [brick_col, np.zeros(missing.shape[0], np.int32)]
            )
            order = np.argsort(brick_row, kind="stable")
            vals, brick_row, brick_col = (
                vals[order], brick_row[order], brick_col[order]
            )

    return BsrMatrix(
        vals=vals,
        brick_row=brick_row,
        brick_col=brick_col,
        shape=csr.shape,
        nnz=nnz,
        convert_time=pt.total,
        convert_phases=dict(pt.phases),
    )
