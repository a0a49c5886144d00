#!/usr/bin/env python
"""Measure the window fan-in C for the PMM (perm-matmul) SpMM design.

Design under test (round 5): a row-tile-bucketed stream — elements
grouped by row-tile (row >> 7), column-sorted inside each bucket,
padded per bucket to a multiple of 128 — where each 128-element chunk
gathers its X rows via ONE (K,128) @ (128,128) MXU perm-matmul per
DISTINCT aligned 128-column window it touches, then reduces into the
row-tile's Y block with one more perm-matmul (R = one-hot(row_local)
scaled by vals; 0/1-weighted f32 matmuls are exact).

Per-chunk cost = (C + 1) matmuls at the probed m32 rate (~31 ns, see
experiments/probe_permmm.py) + 16 KB of X-window DMA per distinct
window.  Everything hinges on C = mean distinct windows per chunk;
this script measures it (plus the padded stream size) on the bench
fixtures, and prints the projected ms / useful GFLOPS at K=32/64.

The same fan-in idea at the reference level: CVR's steal machinery
packs lanes so each SIMD step reads one x cacheline-neighbourhood
(reference spmv.cpp:1197-1233); VHCC column-blocks for the same reason
(vhcc_matrix.h:300-375).  Here the 128-lane window is the TPU MXU's
natural "cacheline".
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

NS_MM = 31.0  # m32 probe: ns per (32,128)@(128,128) build-P + dot
HBM = 819e9


def analyze(name: str, rows, cols, nrows, ncols, nnz_true):
    order = np.lexsort((cols, rows >> 7))
    r = rows[order]
    c = cols[order]
    rt = r >> 7
    # pad each row-tile bucket to a multiple of 128
    _, counts = np.unique(rt, return_counts=True)
    padded = int(np.sum((counts + 127) // 128 * 128))
    n_chunks = padded // 128

    # windows per chunk: walk buckets, chunk by 128, count distinct col>>7
    w = c >> 7
    # build padded window array: fill pad slots with the bucket's last window
    out = np.empty(padded, dtype=w.dtype)
    pos = 0
    src = 0
    for cnt in counts:
        k = int(cnt)
        pk = (k + 127) // 128 * 128
        out[pos : pos + k] = w[src : src + k]
        out[pos + k : pos + pk] = w[src + k - 1]
        pos += pk
        src += k
    chunks = out.reshape(n_chunks, 128)
    # distinct per chunk: sorted within bucket, so within a chunk windows
    # are nondecreasing except at bucket boundaries; count boundaries
    diff = np.diff(chunks, axis=1) != 0
    C = 1 + diff.sum(axis=1)
    meanC = float(C.mean())

    for K, ns in ((32, 31.0), (64, 62.0), (8, 14.7), (16, 22.0)):
        ops_ms = n_chunks * (meanC + 1) * ns / 1e6
        dma_ms = n_chunks * meanC * 128 * K * 4 / HBM * 1e3
        est_ms = max(ops_ms, dma_ms) + 0.3
        gf = 2 * nnz_true * K / (est_ms / 1e3) / 1e9
        print(
            f"  K={K:3d}: ops {ops_ms:6.2f} ms, win-DMA {dma_ms:6.2f} ms"
            f" -> est {est_ms:6.2f} ms = {gf:6.1f} useful GFLOPS"
        )
    print(
        f"  [{name}] nnz={nnz_true} padded={padded}"
        f" (+{100 * (padded / nnz_true - 1):.1f}%) chunks={n_chunks}"
        f" C(mean)={meanC:.2f} C(p50/p90/p99)="
        f"{np.percentile(C, 50):.0f}/{np.percentile(C, 90):.0f}/"
        f"{np.percentile(C, 99):.0f}"
    )


def main():
    from cvr_tpu.bench import synthetic as syn

    fixtures = [
        ("web-Google-like", syn.web_google_like),
        ("web-rmat-b", syn.web_google_like_b),
        ("wiki-Talk-like", syn.wiki_talk_like),
        ("citation-like", syn.citation_like),
        ("fsm-like", syn.fsm_like),
    ]
    if "--soc" in sys.argv:
        fixtures.append(("soc-LJ-like", syn.soc_livejournal_like))
    for name, fn in fixtures:
        coo = fn()
        rows, cols = np.asarray(coo.rows), np.asarray(coo.cols)
        analyze(name, rows, cols, coo.shape[0], coo.shape[1], len(rows))


if __name__ == "__main__":
    main()
