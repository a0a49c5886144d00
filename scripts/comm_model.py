"""Print the comm-volume / weak-scaling table from a results JSONL.

Usage: python scripts/comm_model.py [results_r3.jsonl] [--fexp 0.35]

Emits, per domain (latest row per name with shape info): HBM bytes
streamed per shard per iteration, ICI bytes gathered per shard, the
modeled comm time on a v5e ring, and the projected weak-scaling
efficiency at D = 8 / 64 / 256 for the blocking all-gather path vs the
ppermute-ring overlap path, plus the largest D that keeps E >= 70%
(BASELINE.md target).  See cvr_tpu/parallel/comm_model.py for the model.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cvr_tpu.parallel.comm_model import (
    best_mesh_2d,
    comm_table,
    knee_devices,
    weak_scaling,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("jsonl", nargs="?", default="results_r3.jsonl")
    ap.add_argument("--fexp", type=float, default=0.35)
    args = ap.parse_args()

    latest: dict[str, dict] = {}
    with open(args.jsonl) as f:
        for line in f:
            r = json.loads(line)
            if r.get("ncols"):
                latest[r["name"]] = r
    rows = list(latest.values())
    if not rows:
        print(f"no rows with shape info in {args.jsonl}", file=sys.stderr)
        return 1

    hdr = (
        f"{'domain':<18} {'HBM MB/it':>10} {'ICI MB/it@8':>12} "
        f"{'t_comp ms':>10} {'t_comm ms@8':>12} "
        f"{'E8 blk/ovl':>12} {'E64':>10} {'E256':>10} {'D@70% blk/ovl':>14} "
        f"{'2D E8 (RxC)':>12} {'2D E64':>8}"
    )
    print(hdr)
    print("-" * len(hdr))
    for cr in comm_table(rows, D=8, f_exp=args.fexp):
        r = latest[cr.name]
        e64 = weak_scaling(cr.t_comp_s, int(r["ncols"]), 64, args.fexp)
        e256 = weak_scaling(cr.t_comp_s, int(r["ncols"]), 256, args.fexp)
        kb, ko = knee_devices(cr.t_comp_s, int(r["ncols"]), args.fexp)
        nrows = int(r.get("nrows") or r["ncols"])
        R8, C8, e2b8, _ = best_mesh_2d(
            cr.t_comp_s, int(r["ncols"]), nrows, 8, args.fexp
        )
        _, _, e2b64, _ = best_mesh_2d(
            cr.t_comp_s, int(r["ncols"]), nrows, 64, args.fexp
        )
        print(
            f"{cr.name:<18} {cr.stream_bytes / 1e6:>10.1f} "
            f"{cr.gather_bytes / 1e6:>12.2f} {cr.t_comp_s * 1e3:>10.3f} "
            f"{cr.t_comm_s * 1e3:>12.4f} "
            f"{cr.eff_blocking:>5.2f}/{cr.eff_overlap:<5.2f}"
            f" {e64[1]:>4.2f}/{e64[2]:<4.2f} {e256[1]:>4.2f}/{e256[2]:<4.2f}"
            f" {kb:>6d}/{ko:<6d}"
            f" {e2b8:>5.2f} ({R8}x{C8}) {e2b64:>7.2f}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
