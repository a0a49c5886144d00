"""Multi-threaded native converter determinism.

The native converter's OpenMP regions (parallel parse, counting sort,
stream build, Euler route compile — native/cvr_native.cpp) have only
ever executed single-threaded on this 1-core host.  The reference's
converter is parallel by design (spmv.cpp:577); these tests oversubscribe
the core with OMP_NUM_THREADS = 1 / 2 / 8 in subprocesses (libgomp reads
the env at startup) and assert BIT-IDENTICAL pack artifacts: every
parallel region must partition its writes disjointly and use only
order-independent reductions.
"""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_SCRIPT = r"""
import hashlib
import numpy as np
from cvr_tpu.bench.synthetic import rmat_matrix
from cvr_tpu.io.mmio import write_matrix_market
import cvr_tpu

coo0 = rmat_matrix(scale=13, edge_factor=8, seed=3, cache=False)
write_matrix_market("/tmp/omp_det.mtx", coo0)
coo = cvr_tpu.read_matrix_market("/tmp/omp_det.mtx")  # native parser
h = hashlib.sha256()
h.update(np.ascontiguousarray(coo.rows).tobytes())
h.update(np.ascontiguousarray(coo.cols).tobytes())
h.update(np.ascontiguousarray(coo.vals).tobytes())

from cvr_tpu.formats.sell_routed import sell_pack_routed

sr = sell_pack_routed(coo.to_csr(), hot="off")
for a in (
    sr.w8, sr.li, sr.gcls, sr.seg_blk, sr.vals_ss, sr.p3, sr.emit,
    sr.ycall_rows, sr.regions, sr.extra_src, sr.extra_row, sr.ymask,
):
    h.update(np.ascontiguousarray(a).tobytes())
for k in ("mid", "m1", "csel", "m3"):
    if k in sr.mid:
        h.update(np.ascontiguousarray(sr.mid[k]).tobytes())
for k in ("s1", "s3"):
    h.update(np.ascontiguousarray(sr.y_ra[k]).tobytes())

from cvr_tpu.formats.bell import BellInfeasible, bell_pack
from cvr_tpu.bench.synthetic import road_usa_like

bm = bell_pack(road_usa_like(n=1 << 13, deg=2.5, reach=48, seed=5).to_csr())
h.update(np.ascontiguousarray(bm.li).tobytes())
h.update(np.ascontiguousarray(bm.vals).tobytes())
print("HASH", h.hexdigest())
"""


def _run(threads: int) -> str:
    env = dict(
        os.environ,
        OMP_NUM_THREADS=str(threads),
        JAX_PLATFORMS="cpu",
        CVR_TPU_CACHE="/tmp/omp_det_cache",
    )
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    for line in out.stdout.splitlines():
        if line.startswith("HASH "):
            return line.split()[1]
    raise AssertionError(f"no hash in output: {out.stdout[-500:]}")


def test_converter_thread_determinism():
    hashes = {t: _run(t) for t in (1, 2, 8)}
    assert len(set(hashes.values())) == 1, hashes
