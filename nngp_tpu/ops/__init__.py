from nngp_tpu.ops.dual_activations import (
    relu_nngp,
    relu_ntk_mult,
    relu_diag,
    erf_nngp,
    erf_ntk_mult,
    erf_diag,
)
from nngp_tpu.ops.gram import input_gram, input_diag
from nngp_tpu.ops.linalg import (
    BlockLowerTriangular,
    block_cholesky_append_rows,
    block_tri_solve_lower,
    block_tri_solve_lower_t,
    blocked_cholesky,
    cholesky_with_ridge,
    cho_solve,
    fused_panel_cholesky,
    tri_solve_lower,
    tri_solve_lower_t,
    cholesky_append_rows,
)

__all__ = [
    "BlockLowerTriangular",
    "block_cholesky_append_rows",
    "block_tri_solve_lower",
    "block_tri_solve_lower_t",
    "blocked_cholesky",
    "fused_panel_cholesky",
    "relu_nngp",
    "relu_ntk_mult",
    "relu_diag",
    "erf_nngp",
    "erf_ntk_mult",
    "erf_diag",
    "input_gram",
    "input_diag",
    "cholesky_with_ridge",
    "cho_solve",
    "tri_solve_lower",
    "tri_solve_lower_t",
    "cholesky_append_rows",
]
