"""Hub-column capture study (round 4).

The routed pipeline pays ~44 gather/select VPU op-passes per element
(expand ~4 + M1 16 + csel ~7 + M3 16 + stage-3 1, docs/DESIGN.md round-3
floor table) because every element crosses the full Clos route.  A v5e
can gather directly from a 1024-wide VMEM window at 8 gather+select
pairs = 16 op-passes per element (experiments/probe_gather.py) — so any
element whose column lies in a 1024-column "hot slab" could skip the
route entirely for ~16/44 of the cost.  The reference's steal machinery
exists for exactly this scale-free hub structure (spmv.cpp:869-943),
and VHCC's column blocking attacks the same x-gather
(vhcc_matrix.h:300-375).

This study measures, per benchmark stand-in, the capture fraction
f(k) = (nnz whose column is among the k most-referenced columns) / nnz
— the curve that decides whether a hot-column hybrid format pays.

Predicted SpMV saving at capture fraction f (1024-wide slab):
    route passes scale to (1-f); hot kernel costs ~16/44 of the routed
    per-element op budget -> t_new ~ t_old * (1 - f * (1 - 16/44))
measured against the round-3 web number (1.093 ms, 11.27 GFLOPS).

Usage: python experiments/hot_capture.py [web soc wiki fsm citation]
"""

from __future__ import annotations

import sys

import numpy as np


def capture_curve(coo, ks=(128, 256, 512, 1024, 2048, 4096, 8192, 16384)):
    cnt = np.bincount(coo.cols, minlength=coo.shape[1]).astype(np.int64)
    order = np.argsort(-cnt, kind="stable")
    csum = np.cumsum(cnt[order])
    nnz = coo.nnz
    return {k: csum[min(k, len(csum)) - 1] / nnz for k in ks}, cnt, order


def rowcap(coo, order, NH, khs=(1, 2, 3, 4, 6, 8)):
    """Per-row capped capture: for the hot-plane architecture, each row
    contributes at most k_h captured elements (one per hot plane), so the
    real capture is sum_r min(h_r, k_h) where h_r counts the row's
    elements whose column is among the top-NH.  Returns
    {k_h: (captured_nnz, nonempty_rows, rows_with_hot)}."""
    hot = np.zeros(coo.shape[1], dtype=bool)
    hot[order[:NH]] = True
    is_hot = hot[coo.cols]
    h = np.bincount(coo.rows[is_hot], minlength=coo.shape[0])
    n = np.bincount(coo.rows, minlength=coo.shape[0])
    nonempty = int((n > 0).sum())
    out = {}
    for k in khs:
        out[k] = (int(np.minimum(h, k).sum()), nonempty, int((h > 0).sum()))
    return out


def main():
    from cvr_tpu.bench import synthetic as syn

    names = sys.argv[1:] or ["web", "wiki", "soc", "fsm", "citation"]
    gens = {
        "web": syn.web_google_like,
        "wiki": syn.wiki_talk_like,
        "soc": syn.soc_livejournal_like,
        "fsm": syn.fsm_like,
        "citation": syn.citation_like,
    }
    ks = (128, 256, 512, 1024, 2048, 4096, 8192, 16384)
    print("matrix  nnz(M)  " + "  ".join(f"f@{k}" for k in ks))
    for name in names:
        coo = gens[name]()
        f, cnt, order = capture_curve(coo, ks)
        row = "  ".join(f"{f[k]:.3f}" for k in ks)
        print(f"{name:8s} {coo.nnz/1e6:6.2f}  {row}")
        # predicted web-pipeline saving at the 1024-col slab
        f1k = f[1024]
        pred = 1.0 - f1k * (1 - 16 / 44)
        print(
            f"         top-1024 capture {f1k:.3f} -> predicted routed "
            f"SpMV time x{pred:.3f} (op-pass model)"
        )
        # capped per-row capture for the hot-plane architecture:
        # hot slots = nonempty_rows * k_h at c_h(NH) = 2*NH/128 + 1
        # op-passes/slot vs the routed ~44; fraction removed from the
        # routed stream = captured / nnz.
        for NH in (128, 256, 512, 1024):
            rc = rowcap(coo, order, NH)
            parts = []
            for k, (cap, nonempty, rows_hot) in rc.items():
                ch = 2 * NH // 128 + 1
                net = (cap / coo.nnz) * 44 - (nonempty * k / coo.nnz) * ch
                parts.append(f"k{k}:{cap/coo.nnz:.3f}({net:+.2f})")
            print(
                f"         NH={NH:5d} rows_hot={rc[1][2]/1e3:.0f}K "
                + " ".join(parts)
            )
        # SELL-sliced hot planes: segments ordered by REST length (the
        # rest pack's sort), hot width per 1024-segment slice = max h;
        # capture capped at HCAP per row.  slots = sum_slices max
        # min(h,cap); net op-pass gain = capture*44 - slots*c_h(NH).
        hot = np.zeros(coo.shape[1], dtype=bool)
        for NH in (128, 256, 512, 1024):
            hot[:] = False
            hot[order[:NH]] = True
            is_hot = hot[coo.cols]
            h = np.bincount(coo.rows[is_hot], minlength=coo.shape[0])
            n = np.bincount(coo.rows, minlength=coo.shape[0])
            ch = 2 * NH // 128 + 1
            parts = []
            for cap in (8, 16, 32, 64):
                hc = np.minimum(h, cap)
                rest = n - hc
                o = np.argsort(-(rest.astype(np.int64) * 1024) - (hc > 0),
                               kind="stable")
                hs = hc[o]
                pad = (-len(hs)) % 1024
                if pad:
                    hs = np.concatenate([hs, np.zeros(pad, hs.dtype)])
                slots = int(hs.reshape(-1, 1024).max(axis=1).sum()) * 1024
                capn = int(hc.sum())
                net = (capn / coo.nnz) * 44 - (slots / coo.nnz) * ch
                parts.append(
                    f"cap{cap}:{capn/coo.nnz:.3f}/x{slots/max(capn,1):.1f}"
                    f"({net:+.2f})"
                )
            print(f"         SLICED NH={NH:5d} " + " ".join(parts))


if __name__ == "__main__":
    main()
