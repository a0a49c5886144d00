from cvr_tpu.parallel.partition import partition_rows_by_nnz
from cvr_tpu.parallel.dist import (
    DistSellMatrix,
    dist_sell_pack,
    dist_spmv,
    make_mesh,
)
from cvr_tpu.parallel.dist_routed import (
    DistRoutedMatrix,
    dist_routed_pack,
    dist_spmv_routed,
)

__all__ = [
    "partition_rows_by_nnz",
    "DistSellMatrix",
    "dist_sell_pack",
    "dist_spmv",
    "make_mesh",
    "DistRoutedMatrix",
    "dist_routed_pack",
    "dist_spmv_routed",
]
