"""Mesh-sharded Gram assembly and GP fit/predict.

Sharding layout (the TPU-native replacement for `nt.batch`'s host-blocked
Gram, `/root/reference/train.py:166-168`):

  X_train  (n, d)   row-sharded over the `data` axis — d is tiny (tens), so
                    an all-gather of X costs ~n*d*4 bytes over ICI, nothing.
  K        (n, n)   row-block sharded: each device computes its
                    (n/p, n) block = matmul on the MXU + fused recursion.
                    The O(n^2) object never needs to be replicated.
  Cholesky          XLA's SPMD partitioner handles K + rI -> L (it gathers
                    for the factorization itself today; a Pallas distributed
                    right-looking factorization is the planned upgrade).
  predict           test rows sharded over `data` — embarrassingly parallel
                    batched serving; L and X_train replicated.

Everything is expressed with `shard_map` (Gram) and jit + NamedSharding
(fit/predict) so XLA inserts the collectives and overlaps them with compute.
"""

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from nngp_tpu.models.kernel_spec import KernelSpec, apply_recursion
from nngp_tpu.ops.gram import input_diag, input_gram
from nngp_tpu.ops.linalg import cholesky_with_ridge


def sharded_gram(spec: KernelSpec, x, mesh: Mesh, get="nngp",
                 axis_name: str = "data"):
    """Row-block-sharded symmetric Gram: returns K with rows sharded over
    `axis_name`. Each device computes K[rows_i, :] from its local X block
    against the all-gathered X."""

    def block(x_local):
        x_full = jax.lax.all_gather(x_local, axis_name, axis=0, tiled=True)
        k0 = input_gram(x_local, x_full)
        d1 = input_diag(x_local)[:, None]
        d2 = input_diag(x_full)[None, :]
        nngp, ntk = apply_recursion(k0, jnp.zeros_like(k0), d1, d2, spec.layers)
        return KernelSpec._select(nngp, ntk, get)

    out_specs = (tuple(P(axis_name, None) for _ in get)
                 if isinstance(get, (tuple, list)) else P(axis_name, None))
    fn = shard_map(
        block, mesh=mesh,
        in_specs=P(axis_name, None),
        out_specs=out_specs,
    )
    return fn(x)


def sharded_fit(spec: KernelSpec, x, y, mesh: Mesh, diag_reg: float = 1e-3,
                get: str = "nngp", axis_name: str = "data",
                distributed_solver: bool = False):
    """Full training step over the mesh: sharded Gram -> Cholesky -> alpha.
    Returns (l, alpha, reg) (+ k_tt for get='ntk'). jit-compatible: call under
    jit for one fused program.

    distributed_solver=True keeps the Gram row-sharded through the
    factorization and solves (parallel/cholesky.py) — required when the
    N x N Gram exceeds one chip's HBM; otherwise XLA's partitioner decides
    (it gathers for the factorization)."""
    if get == "ntk":
        # one Gram pass computes both kernels (the recursion produces the
        # pair anyway); two passes would double the O(n^2 d) work + ICI
        k_tt, theta = sharded_gram(spec, x, mesh, ("nngp", "ntk"), axis_name)
        solve_k = theta
    else:
        k_tt = sharded_gram(spec, x, mesh, "nngp", axis_name)
        solve_k = k_tt
    if distributed_solver:
        from nngp_tpu.parallel.cholesky import (
            distributed_cho_solve,
            distributed_cholesky,
        )
        n = solve_k.shape[0]
        reg = diag_reg * jnp.mean(jnp.diagonal(solve_k))
        l = distributed_cholesky(
            solve_k + reg * jnp.eye(n, dtype=solve_k.dtype), mesh, axis_name)
        alpha = distributed_cho_solve(l, y, mesh, axis_name)
    else:
        l, reg = cholesky_with_ridge(solve_k, diag_reg)
        alpha = jax.scipy.linalg.cho_solve((l, True), y)
    if get == "ntk":
        return l, alpha, reg, k_tt
    return l, alpha, reg


def sharded_predict_mean_std(spec: KernelSpec, x_test, x_train, l, alpha,
                             mesh: Mesh, axis_name: str = "data"):
    """Batched posterior (mean, std) with test rows sharded over the mesh —
    the serving fan-out. NNGP semantics."""

    def block(x_te_local, x_tr, l_rep, alpha_rep):
        k0 = input_gram(x_te_local, x_tr)
        d1 = input_diag(x_te_local)[:, None]
        d2 = input_diag(x_tr)[None, :]
        cross, _ = apply_recursion(k0, jnp.zeros_like(k0), d1, d2, spec.layers)
        mean = cross @ alpha_rep
        v = jax.lax.linalg.triangular_solve(
            l_rep, cross.T, left_side=True, lower=True
        )
        from nngp_tpu.models.kernel_spec import apply_diag_recursion
        diag_ss, _ = apply_diag_recursion(input_diag(x_te_local), spec.layers)
        var = jnp.maximum(diag_ss - jnp.sum(v * v, axis=0), 0.0)
        return mean, jnp.sqrt(var)

    fn = shard_map(
        block, mesh=mesh,
        in_specs=(P(axis_name, None), P(None, None), P(None, None), P(None, None)),
        out_specs=(P(axis_name, None), P(axis_name)),
    )
    return fn(x_test, x_train, l, alpha)
