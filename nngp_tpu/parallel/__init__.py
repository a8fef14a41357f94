from nngp_tpu.parallel.mesh import make_mesh
from nngp_tpu.parallel.sharded import (
    sharded_gram,
    sharded_fit,
    sharded_predict_mean_std,
)

__all__ = ["make_mesh", "sharded_gram", "sharded_fit", "sharded_predict_mean_std"]
