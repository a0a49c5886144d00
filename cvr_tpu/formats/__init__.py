from cvr_tpu.formats.coo import COOMatrix
from cvr_tpu.formats.csr import CSRMatrix
from cvr_tpu.formats.sell import SellMatrix, sell_pack, sell_unpack
from cvr_tpu.formats.sell_window import (
    SellWindow,
    WindowInfeasible,
    sell_pack_window,
)

__all__ = [
    "COOMatrix",
    "CSRMatrix",
    "SellMatrix",
    "SellWindow",
    "WindowInfeasible",
    "sell_pack",
    "sell_pack_window",
    "sell_unpack",
    "pack_auto",
]


def pack_auto(csr: CSRMatrix):
    """Pick the fastest packed format for this matrix.

    Tries SELL-W (the window/locality path — single fused kernel, O(nnz)
    pack) first; matrices without column locality (power-law graphs)
    raise WindowInfeasible and get the routed path (any structure, route
    compiled at pack time).  This mirrors the reference's positioning of
    CVR as the one format that handles both regular and scale-free
    matrices (paper Table 3) — here the dispatch is explicit and the
    artifact records which path it took.
    """
    from cvr_tpu.formats.sell_routed import sell_pack_routed

    try:
        return sell_pack_window(csr)
    except WindowInfeasible:
        return sell_pack_routed(csr)
