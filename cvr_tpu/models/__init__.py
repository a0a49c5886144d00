from cvr_tpu.models.pagerank import pagerank
from cvr_tpu.models.gnn import (
    gcn_forward,
    gcn_layer,
    gcn_normalize,
    graphsage_layer,
)
from cvr_tpu.models.solvers import (
    bicgstab,
    conjugate_gradient,
    jacobi,
    lanczos,
    power_iteration,
    subspace_iteration,
)

__all__ = [
    "pagerank",
    "bicgstab",
    "conjugate_gradient",
    "gcn_forward",
    "gcn_layer",
    "gcn_normalize",
    "graphsage_layer",
    "jacobi",
    "lanczos",
    "power_iteration",
    "subspace_iteration",
]
