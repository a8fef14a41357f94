from nngp_tpu.parallel.mesh import make_mesh
from nngp_tpu.parallel.sharded import (
    sharded_gram,
    sharded_fit,
    sharded_predict_mean_std,
)
from nngp_tpu.parallel.cholesky import (
    distributed_cholesky,
    distributed_tri_solve_lower,
    distributed_cho_solve,
)

__all__ = [
    "make_mesh",
    "sharded_gram",
    "sharded_fit",
    "sharded_predict_mean_std",
    "distributed_cholesky",
    "distributed_tri_solve_lower",
    "distributed_cho_solve",
]
