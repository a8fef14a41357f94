from nngp_tpu.parallel.mesh import make_mesh
from nngp_tpu.parallel.sharded import (
    DistributedPosterior,
    distributed_fit,
    sharded_gram,
    sharded_fit,
    sharded_predict_mean_std,
)
from nngp_tpu.parallel.cholesky import (
    cyclic_storage_order,
    distributed_cholesky,
    distributed_tri_solve_lower,
    distributed_tri_solve_lower_t,
    distributed_cho_solve,
)

__all__ = [
    "make_mesh",
    "DistributedPosterior",
    "distributed_fit",
    "sharded_gram",
    "sharded_fit",
    "sharded_predict_mean_std",
    "cyclic_storage_order",
    "distributed_cholesky",
    "distributed_tri_solve_lower",
    "distributed_tri_solve_lower_t",
    "distributed_cho_solve",
]
