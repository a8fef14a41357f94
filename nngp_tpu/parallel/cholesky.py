"""Distributed right-looking block Cholesky + triangular solve over a mesh.

Why: XLA's SPMD partitioner handles a sharded `cholesky` by gathering the
operand, so a replicated N x N Gram caps N at one chip's HBM (~60k fp32 rows
on a 16 GB v5e). This factorization keeps the Gram row-block sharded end to
end — the distributed-linear-algebra analog of tensor parallelism for this
workload (SURVEY.md section 2.3, TP row).

Layout: K is row-block sharded over the mesh's `data` axis — device d owns
rows [d*m, (d+1)*m), m = n/p — matching `parallel.sharded.sharded_gram`'s
output, so fit never re-lays-out the Gram.

Algorithm (panel width = m, one panel per device):
  for k in 0..p-1:
    all devices:   all_gather panel column A[:, k] diag block; every device
                   redundantly factors the tiny (m, m) diagonal block
                   (cheaper than a broadcast round-trip)
    device i > k:  L_ik = A_ik L_kk^{-T}            (local triangular solve)
    all devices:   all_gather the finished panel column, then locally update
                   their trailing blocks A_ij -= L_ik L_jk^T  (MXU matmuls)

Devices above the panel hold zeros in it, so their updates vanish — no
control flow divergence. Per-device comm is O(n m) per panel, O(n^2) total,
riding ICI. Compile unrolls p panels (fine for p <= ~32; block-cyclic
distribution is the planned upgrade for larger meshes).

The companion `distributed_tri_solve_lower` does blocked forward
substitution for alpha = L^{-1} b with the factor left sharded.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def _chol_local(a_loc, axis_name, p, m):
    d = jax.lax.axis_index(axis_name)
    for kb in range(p):
        col = slice(kb * m, (kb + 1) * m)
        a_panel = a_loc[:, col]                          # (m, m) my block
        # Every device re-derives L_kk from the gathered diagonal block.
        panel_blocks = jax.lax.all_gather(a_panel, axis_name)   # (p, m, m)
        lkk = jax.lax.linalg.cholesky(panel_blocks[kb])
        # My finished panel block.
        lik = jax.lax.linalg.triangular_solve(
            lkk, a_panel, left_side=False, lower=True, transpose_a=True)
        zeros = jnp.zeros_like(a_panel)
        my_panel = jnp.where(d == kb, lkk, jnp.where(d > kb, lik, zeros))
        a_loc = a_loc.at[:, col].set(my_panel)
        # Trailing update with the gathered finished panel.
        panel_all = jax.lax.all_gather(my_panel, axis_name)     # (p, m, m)
        for jb in range(kb + 1, p):
            colj = slice(jb * m, (jb + 1) * m)
            a_loc = a_loc.at[:, colj].add(
                -jax.lax.dot_general(
                    my_panel, panel_all[jb],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST))
    # Zero the strict upper block triangle so the result is a clean L.
    row_ids = jax.lax.broadcasted_iota(jnp.int32, a_loc.shape, 0) + \
        jax.lax.axis_index(axis_name) * m
    col_ids = jax.lax.broadcasted_iota(jnp.int32, a_loc.shape, 1)
    return jnp.where(col_ids <= row_ids, a_loc, 0.0)


def distributed_cholesky(k_mat, mesh: Mesh, axis_name: str = "data"):
    """Cholesky of a row-block-sharded SPD matrix; returns L with the same
    sharding. n must divide the mesh size."""
    n = k_mat.shape[0]
    p = mesh.devices.size
    if n % p:
        raise ValueError(f"n={n} not divisible by mesh size {p}")
    m = n // p
    fn = shard_map(
        partial(_chol_local, axis_name=axis_name, p=p, m=m),
        mesh=mesh, in_specs=P(axis_name, None), out_specs=P(axis_name, None),
    )
    return fn(k_mat)


def _solve_local(l_loc, b_loc, axis_name, p, m):
    d = jax.lax.axis_index(axis_name)
    x_loc = jnp.zeros_like(b_loc)
    for kb in range(p):
        # x_k = L_kk^{-1} (b_k - sum_{j<k} L_kj x_j); the subtraction is
        # accumulated into b_loc as panels finish.
        lkk_mine = l_loc[:, kb * m:(kb + 1) * m]
        blocks = jax.lax.all_gather(lkk_mine, axis_name)        # (p, m, m)
        b_all = jax.lax.all_gather(b_loc, axis_name)            # (p, m, r)
        xk = jax.lax.linalg.triangular_solve(
            blocks[kb], b_all[kb], left_side=True, lower=True)
        # devices below kb subtract L_dk x_k from their rhs
        update = jax.lax.dot_general(
            lkk_mine, xk, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        b_loc = jnp.where(d > kb, b_loc - update, b_loc)
        x_loc = jnp.where(d == kb, xk, x_loc)
    return x_loc


def distributed_tri_solve_lower(l_mat, b, mesh: Mesh, axis_name: str = "data"):
    """Solve L x = b with L and b row-block sharded; x returns row-sharded."""
    n = l_mat.shape[0]
    p = mesh.devices.size
    m = n // p
    fn = shard_map(
        partial(_solve_local, axis_name=axis_name, p=p, m=m),
        mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name, None)),
        out_specs=P(axis_name, None),
    )
    return fn(l_mat, b)


def distributed_cho_solve(l_mat, b, mesh: Mesh, axis_name: str = "data"):
    """(L L^T)^{-1} b via forward then (transposed) backward substitution.

    The backward pass L^T x = y runs on the mirrored problem: reversing both
    block order and intra-block order turns an upper-triangular solve into a
    lower-triangular one with the same machinery.
    """
    y = distributed_tri_solve_lower(l_mat, b, mesh, axis_name)
    # L^T x = y  <=>  (J L^T J)(J x) = J y with J the reversal permutation;
    # J L^T J = (J L J)^T = flip(L, both).T, which is lower triangular.
    lt_rev = jnp.flip(l_mat, (0, 1)).T
    y_rev = jnp.flip(y, 0)
    x_rev = distributed_tri_solve_lower(lt_rev, y_rev, mesh, axis_name)
    return jnp.flip(x_rev, 0)
