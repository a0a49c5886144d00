"""Test configuration.

Tests run on a virtual 8-device CPU mesh so the distributed (shard_map)
code paths are exercised without TPU hardware — the multi-chip answer to
the reference's single-machine OpenMP testing (SURVEY.md §4).  Env vars
must be set before jax is imported by any test module.
"""

import os

# Force CPU: the session env presets JAX_PLATFORMS=axon (the real TPU
# tunnel) and the axon plugin re-forces "axon,cpu" at import time, so the
# env var alone is not enough — override the config after import too.
# Tests must run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's cost is dominated by XLA CPU
# compiles of the multi-pass Pallas pipelines (~20-30 s each first call);
# caching them across test processes/runs cuts full-suite wall clock
# several-fold on the single-core host.
from cvr_tpu.utils.compilecache import enable as _enable_cache

_enable_cache()

import numpy as np
import pytest
import scipy.sparse as sp

from cvr_tpu.formats.coo import COOMatrix


def make_random_coo(
    nrows, ncols, density=0.05, seed=0, dtype=np.float32
) -> COOMatrix:
    rng = np.random.default_rng(seed)
    m = sp.random(
        nrows,
        ncols,
        density=density,
        format="coo",
        random_state=rng,
        data_rvs=lambda n: rng.standard_normal(n),
    )
    return COOMatrix(
        rows=m.row.astype(np.int32),
        cols=m.col.astype(np.int32),
        vals=m.data.astype(dtype),
        shape=(nrows, ncols),
    )


def make_powerlaw_coo(nrows, ncols, avg_nnz=6, alpha=1.8, seed=0) -> COOMatrix:
    """Power-law row-degree matrix — the load-imbalance stressor the CVR
    format exists for (scale-free graphs, paper Table 2)."""
    rng = np.random.default_rng(seed)
    deg = np.minimum(
        rng.zipf(alpha, size=nrows), ncols
    )  # heavy-tailed degrees
    scale = avg_nnz / max(deg.mean(), 1.0)
    deg = np.maximum((deg * scale).astype(np.int64), 0)
    deg = np.minimum(deg, ncols)
    rows = np.repeat(np.arange(nrows, dtype=np.int32), deg)
    cols = rng.integers(0, ncols, size=rows.shape[0]).astype(np.int32)
    vals = rng.standard_normal(rows.shape[0]).astype(np.float32)
    return COOMatrix(rows=rows, cols=cols, vals=vals, shape=(nrows, ncols)).sum_duplicates()


@pytest.fixture
def random_coo():
    return make_random_coo(200, 180, density=0.05, seed=1)


@pytest.fixture
def powerlaw_coo():
    return make_powerlaw_coo(3000, 3000, avg_nnz=6, seed=2)
