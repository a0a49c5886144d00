from cvr_tpu.ops.spmv import spmv, spmm, sell_spmv_xla, sell_spmm_xla
from cvr_tpu.ops.spmv_ref import (
    spmv_csr_jnp,
    spmv_coo_jnp,
    spmv_golden_numpy,
    verify,
)

__all__ = [
    "spmv",
    "spmm",
    "sell_spmv_xla",
    "sell_spmm_xla",
    "spmv_csr_jnp",
    "spmv_coo_jnp",
    "spmv_golden_numpy",
    "verify",
]
