from cvr_tpu.formats.coo import COOMatrix
from cvr_tpu.formats.csr import CSRMatrix
from cvr_tpu.formats.sell import SellMatrix, sell_pack, sell_unpack

__all__ = ["COOMatrix", "CSRMatrix", "SellMatrix", "sell_pack", "sell_unpack"]
