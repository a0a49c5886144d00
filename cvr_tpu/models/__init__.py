from cvr_tpu.models.pagerank import pagerank
from cvr_tpu.models.solvers import conjugate_gradient, power_iteration

__all__ = ["pagerank", "conjugate_gradient", "power_iteration"]
