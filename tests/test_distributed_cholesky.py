"""Distributed block Cholesky / solves vs dense references on the 8-device
virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nngp_tpu.parallel import make_mesh
from nngp_tpu.parallel.cholesky import (
    cyclic_storage_order,
    distributed_cho_solve,
    distributed_cholesky,
    distributed_tri_solve_lower,
    distributed_tri_solve_lower_t,
)


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n))
    return jnp.asarray(a @ a.T + n * np.eye(n))


def test_distributed_cholesky_matches_dense():
    mesh = make_mesh()
    k = _spd(64)
    l_dist = distributed_cholesky(k, mesh)
    l_dense = jax.lax.linalg.cholesky(k)
    np.testing.assert_allclose(np.asarray(l_dist), np.asarray(l_dense),
                               rtol=1e-9, atol=1e-10)


def test_distributed_cholesky_under_jit():
    mesh = make_mesh()
    k = _spd(32, seed=1)
    fn = jax.jit(lambda a: distributed_cholesky(a, mesh))
    l = fn(k)
    np.testing.assert_allclose(np.asarray(l),
                               np.asarray(jax.lax.linalg.cholesky(k)),
                               rtol=1e-9, atol=1e-10)


def test_distributed_tri_solve_and_cho_solve():
    mesh = make_mesh()
    k = _spd(48, seed=2)
    b = jnp.asarray(np.random.default_rng(3).standard_normal((48, 5)))
    l = distributed_cholesky(k, mesh)

    x = distributed_tri_solve_lower(l, b, mesh)
    want = jax.lax.linalg.triangular_solve(l, b, left_side=True, lower=True)
    np.testing.assert_allclose(np.asarray(x), np.asarray(want),
                               rtol=1e-8, atol=1e-10)

    alpha = distributed_cho_solve(l, b, mesh)
    want = jax.scipy.linalg.cho_solve((l, True), b)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(want),
                               rtol=1e-7, atol=1e-9)


@pytest.mark.parametrize("block_size", [4, 8])
def test_block_cyclic_cholesky_and_solves(block_size):
    """Block-cyclic storage (panel g owned by device g%p): factor + both
    triangular solves + cho_solve must match dense, rows in storage order."""
    mesh = make_mesh()
    p = mesh.devices.size
    n = 64
    k = np.asarray(_spd(n, seed=5))
    rhs = np.random.default_rng(6).standard_normal((n, 3))
    g2e = cyclic_storage_order(n, block_size, p)
    if block_size == n // p:
        np.testing.assert_array_equal(g2e, np.arange(n))

    l_s = distributed_cholesky(jnp.asarray(k[g2e, :]), mesh,
                               block_size=block_size)
    l_dense = np.linalg.cholesky(k)
    np.testing.assert_allclose(np.asarray(l_s), l_dense[g2e, :],
                               rtol=1e-9, atol=1e-10)

    rhs_s = jnp.asarray(rhs[g2e, :])
    x = distributed_tri_solve_lower(l_s, rhs_s, mesh, block_size=block_size)
    np.testing.assert_allclose(np.asarray(x),
                               np.linalg.solve(l_dense, rhs)[g2e, :],
                               rtol=1e-8, atol=1e-10)
    xt = distributed_tri_solve_lower_t(l_s, rhs_s, mesh,
                                       block_size=block_size)
    np.testing.assert_allclose(np.asarray(xt),
                               np.linalg.solve(l_dense.T, rhs)[g2e, :],
                               rtol=1e-8, atol=1e-10)
    a = distributed_cho_solve(l_s, rhs_s, mesh, block_size=block_size)
    np.testing.assert_allclose(np.asarray(a),
                               np.linalg.solve(k, rhs)[g2e, :],
                               rtol=1e-7, atol=1e-9)


def test_bad_block_size_raises():
    mesh = make_mesh()
    with pytest.raises(ValueError, match="block_size"):
        distributed_cholesky(_spd(64), mesh, block_size=16)  # 64/(8*16) < 1


def test_indivisible_n_raises():
    mesh = make_mesh()
    with pytest.raises(ValueError, match="not divisible"):
        distributed_cholesky(_spd(30), mesh)


def test_end_to_end_sharded_fit_with_distributed_cholesky():
    """Full GP fit using only sharded primitives (Gram + Cholesky + solves)
    must match the single-device posterior."""
    from nngp_tpu.gp import fit_gp
    from nngp_tpu.models.kernel_spec import reference_kernel
    from nngp_tpu.parallel import sharded_gram

    mesh = make_mesh()
    spec = reference_kernel()
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(0, 1000, (64, 12)))
    y = jnp.asarray(rng.standard_normal((64, 1)))

    k = sharded_gram(spec, x, mesh)
    reg = 1e-3 * jnp.mean(jnp.diagonal(k))
    l = distributed_cholesky(k + reg * jnp.eye(64), mesh)
    alpha = distributed_cho_solve(l, y, mesh)

    post = fit_gp(spec, x, y, diag_reg=1e-3)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(post.alpha),
                               rtol=1e-7, atol=1e-9)


def test_distributed_fit_cost_model():
    """The asserted cost model of the two-level schedule: per-device update
    flops approach 2x the symmetric-half minimum n^3/(3p) as the panel
    count grows, and comm volume is Theta(n^2) bytes independent of p."""
    from nngp_tpu.parallel.cholesky import distributed_fit_cost

    n, p = 32768, 8
    # one-group degenerate layout (block_size = n/p): full-width updates
    coarse = distributed_fit_cost(n, p)
    assert coarse["flops_per_device"] > 5.5 * coarse["flops_minimal_per_device"]
    # fine layout: within ~35% of the 2x rectangular-matmul bound
    fine = distributed_fit_cost(n, p, block_size=n // (16 * p))
    ratio = fine["flops_per_device"] / fine["flops_minimal_per_device"]
    assert ratio < 2.7, ratio
    # comm: Theta(n^2) bytes per device; doubling n quadruples (+-20%)
    c1 = distributed_fit_cost(n, p, block_size=256)["comm_bytes_per_device"]
    c2 = distributed_fit_cost(2 * n, p, block_size=256)["comm_bytes_per_device"]
    assert 3.2 < c2 / c1 < 4.8
    # comm per device does not grow with p at fixed n (rides ICI in parallel)
    c8 = distributed_fit_cost(n, 8, block_size=256)["comm_bytes_per_device"]
    c16 = distributed_fit_cost(n, 16, block_size=256)["comm_bytes_per_device"]
    assert c16 < 1.5 * c8
