"""SuiteSparse collection loader with a local cache.

The reference auto-downloads datasets with wget (run_sample.sh:5-8,
run_comparison.sh:9-15).  This environment has no network egress, so the
loader resolves matrices from a local cache directory first and only then
attempts a download (which will raise a clear error offline).
"""

from __future__ import annotations

import os
import tarfile
import urllib.request
from pathlib import Path

from cvr_tpu.formats.coo import COOMatrix
from cvr_tpu.io.mmio import read_matrix_market

_SS_URL = "https://suitesparse-collection-website.herokuapp.com/MM/{group}/{name}.tar.gz"

DEFAULT_CACHE = Path(
    os.environ.get("CVR_TPU_CACHE", Path.home() / ".cache" / "cvr_tpu")
)


def load_suitesparse(
    name: str,
    group: str = "SNAP",
    cache_dir: str | Path | None = None,
    **read_kwargs,
) -> COOMatrix:
    """Load ``group/name`` from the SuiteSparse collection.

    Resolution order: ``<cache>/<name>.mtx``, ``<cache>/<name>/<name>.mtx``,
    then download ``{group}/{name}.tar.gz`` (requires network).
    """
    cache = Path(cache_dir) if cache_dir else DEFAULT_CACHE
    for candidate in (cache / f"{name}.mtx", cache / name / f"{name}.mtx"):
        if candidate.exists():
            return read_matrix_market(candidate, **read_kwargs)

    cache.mkdir(parents=True, exist_ok=True)
    tgz = cache / f"{name}.tar.gz"
    try:
        urllib.request.urlretrieve(_SS_URL.format(group=group, name=name), tgz)
    except Exception as e:  # offline environment
        raise FileNotFoundError(
            f"{name}.mtx not found in cache {cache} and download failed "
            f"({e}). Place the .mtx file in the cache directory."
        ) from e
    with tarfile.open(tgz) as tf:
        tf.extractall(cache, filter="data")
    return read_matrix_market(cache / name / f"{name}.mtx", **read_kwargs)
