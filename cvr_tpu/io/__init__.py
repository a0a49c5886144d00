from cvr_tpu.io.mmio import read_matrix_market, write_matrix_market
from cvr_tpu.io.suitesparse import load_suitesparse

__all__ = ["read_matrix_market", "write_matrix_market", "load_suitesparse"]
