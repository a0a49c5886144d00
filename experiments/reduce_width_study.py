"""Where do web's reduce plane rows go — regions, cheap sweep groups, or
the slow multi-emission walk?

The round-3 floor table measured the emission sweep at -47 us and the
round-4 verdict left it as "the remaining reduce-side slack".  Regular
regions (reduce_m3_regular) already absorb runs of width w in
{1, 2, 4, 8, 16}; this study counts, per fixture, how many plane rows
sit in regions vs the three sweep group codes (-2 none / >=0 single /
-1 multi), and the width histogram of the non-region rows — the facts
that decide whether a general-width (w = 3, 5, 6, 7) region kernel has
anything to harvest.

Counting only (no device, no timing).  Run on CPU:
    PYTHONPATH=/root/repo python experiments/reduce_width_study.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def study(name, coo):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from cvr_tpu.formats.sell_routed import sell_pack_routed
    from cvr_tpu.ops.pallas_route import group_emit_encode

    sr = sell_pack_routed(coo.to_csr())
    regions = np.asarray(sr.regions)
    ycall_rows = np.asarray(sr.ycall_rows)

    S_padded = int(ycall_rows[:, 1].sum())
    region_rows = int(regions[:, 2].sum()) if len(regions) else 0
    emit = np.asarray(sr.emit)
    gemit = group_emit_encode(emit)

    # mark region rows
    in_region = np.zeros(emit.shape[0], dtype=bool)
    for _g, r0, nr, _w, _s in regions:
        in_region[r0 : r0 + nr] = True

    g_region = in_region.reshape(-1, 8).all(axis=1)
    codes = np.asarray(gemit)
    none_g = int(((codes == -2) & ~g_region).sum())
    single_g = int(((codes >= 0) & ~g_region).sum())
    multi_g = int(((codes == -1) & ~g_region).sum())

    # widths of the slices the multi-emission groups belong to
    emits_per_multi = [
        int((emit[i * 8 : i * 8 + 8] >= 0).sum())
        for i in np.flatnonzero((codes == -1) & ~g_region)
    ]
    hist = np.bincount(emits_per_multi) if emits_per_multi else np.zeros(1)

    print(f"== {name}")
    print(
        f"  plane rows {S_padded}  region rows {region_rows}"
        f" ({region_rows / max(S_padded, 1):.1%})"
        f"  n_regions {len(regions)}"
        f"  region widths {sorted(set(int(r[3]) for r in regions))}"
    )
    print(
        f"  non-region 8-row groups: none {none_g}  single {single_g}"
        f"  multi {multi_g}"
        f"  (multi = the row-walk path, {multi_g * 8} rows)"
    )
    if emits_per_multi:
        print(
            "  emissions per multi group:"
            f" {dict(enumerate(hist.tolist()))}"
        )
    # upper bound on the general-w harvest: rows in multi groups whose
    # slices have a single width w and long runs
    return S_padded, region_rows, multi_g


if __name__ == "__main__":
    from cvr_tpu.bench.synthetic import web_google_like, wiki_talk_like

    study("web-Google-like", web_google_like())
    study("wiki-Talk-like", wiki_talk_like())
