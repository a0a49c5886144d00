from cvr_tpu.models.pagerank import pagerank
from cvr_tpu.models.solvers import (
    bicgstab,
    conjugate_gradient,
    jacobi,
    power_iteration,
    subspace_iteration,
)

__all__ = [
    "pagerank",
    "bicgstab",
    "conjugate_gradient",
    "jacobi",
    "power_iteration",
    "subspace_iteration",
]
