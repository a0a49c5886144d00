#!/usr/bin/env python
"""Measure PMM window fan-in C under a HOT-FRONT column relabel.

Round-5 follow-up to experiments/pmm_fanin.py, which refuted PMM for
web-class matrices at natural column order (C~36-44 distinct aligned
128-column windows per 128-element chunk).  The one untried structural
lever is the round-4 hot-capture idea applied to the PMM window space:

  * take the top-k most-referenced columns and gather them ONCE per
    SpMM call into a front table Xh = X[hot_ids]  (k rows; at the
    measured 110 Mrows/s take rate, k=4096 costs ~40 us — negligible);
  * hot elements address windows 0..k/128-1 of Xh by HUB RANK, so the
    densest columns share windows;
  * cold elements keep their ORIGINAL aligned window (offset k/128) —
    X itself is never permuted, so the natural column locality that
    gives web its C~40 (instead of ~128) is preserved.

This script measures C (and the projected time at K=8..64, same
measured constants as ops/spmm_pmm.py) for k in {0, 1024, 4096, 16384}
on the bench fixtures, against the vmapped-routed rival slope.  It is
the cheap-measurement-first step the round-4 hot-capture gate followed
(DESIGN.md round 4): no kernel is built unless a fixture's projection
beats its routed rival.

Reference context: CVR's steal machinery exists for hub structure
(reference spmv.cpp:869-943); VHCC column-blocks the x-gather
(vhcc_matrix.h:300-375).
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from cvr_tpu.ops.spmm_pmm import NS_PAIR, NS_CHUNK_EXTRA, FIXED_US

NS_ROUTED_PER_ELEM = 0.149  # vmapped routed, ns per (padded elem, col)


def chunk_fanin(rt_sorted: np.ndarray, win_sorted: np.ndarray):
    """(npairs, nchunks) for a (row-tile, window)-lexsorted stream,
    padding each row-tile bucket to a 128 multiple (pads repeat the
    bucket's last window, adding no pair) — the pmm_plan walk."""
    _, counts = np.unique(rt_sorted, return_counts=True)
    pk = (counts + 127) // 128 * 128
    padded = int(pk.sum())
    nchunks = padded // 128
    out = np.empty(padded, dtype=win_sorted.dtype)
    pos = np.arange(padded, dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(pk)])[:-1]
    starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    within = np.arange(rt_sorted.shape[0], dtype=np.int64) - np.repeat(
        starts, counts
    )
    dst = np.repeat(offs, counts) + within
    lastw = win_sorted[starts + counts - 1]
    out[:] = np.repeat(lastw, pk)
    out[dst] = win_sorted
    bnd = np.empty(padded, dtype=bool)
    bnd[0] = True
    bnd[1:] = out[1:] != out[:-1]
    bnd |= (pos & 127) == 0
    return int(bnd.sum()), nchunks


def project_ms(npairs: int, nchunks: int, K: int) -> float:
    kp = min((k for k in NS_PAIR if k >= max(min(K, 128), 16)),
             default=128)
    nk = -(-K // 128)
    return (
        nk * (npairs * NS_PAIR[kp] + nchunks * NS_CHUNK_EXTRA[kp]) / 1e6
        + FIXED_US / 1e3
    )


def analyze(name: str, rows, cols, nnz: int, padded_nnz: int):
    deg = np.bincount(cols)
    order_deg = np.argsort(-deg, kind="stable")
    rt = (rows >> 7).astype(np.int64)
    print(f"[{name}] nnz={nnz}")
    for k in (0, 1024, 4096, 16384):
        if k == 0:
            key = cols.astype(np.int64)
            cap = 0.0
        else:
            rank = np.full(deg.shape[0], -1, dtype=np.int64)
            rank[order_deg[:k]] = np.arange(k)
            rk = rank[cols]
            hot = rk >= 0
            cap = float(hot.mean())
            key = np.where(hot, rk, k + cols)
        o = np.lexsort((key, rt))
        npairs, nchunks = chunk_fanin(rt[o], (key[o] >> 7).astype(np.int32))
        c = npairs / nchunks
        line = f"  k={k:6d} cap={cap:5.1%} C={c:6.2f}"
        for K in (32, 64):
            ms = project_ms(npairs, nchunks, K)
            rival = NS_ROUTED_PER_ELEM * padded_nnz * K / 1e6
            gf = 2 * nnz * K / (ms / 1e3) / 1e9
            verdict = "WIN " if ms < rival else "lose"
            line += (
                f" | K={K}: {ms:6.2f} ms ({gf:5.1f} GF) vs routed"
                f" {rival:6.2f} ms {verdict}"
            )
        print(line, flush=True)


def main():
    from cvr_tpu.bench import synthetic as syn

    fixtures = [
        ("web-Google-like", syn.web_google_like),
        ("wiki-Talk-like", syn.wiki_talk_like),
        ("citation-like", syn.citation_like),
        ("fsm-like", syn.fsm_like),
    ]
    for name, fn in fixtures:
        coo = fn()
        rows = np.asarray(coo.rows)
        cols = np.asarray(coo.cols)
        # routed rival uses PADDED nnz (the measured slope's x-axis)
        padded = -(-len(rows) // 1024) * 1024
        analyze(name, rows, cols, len(rows), padded)


if __name__ == "__main__":
    main()
