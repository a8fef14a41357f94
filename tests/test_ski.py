"""SKI / KISS-GP machinery: interpolation, Kronecker products, iterative
solvers, and the grid-interpolation DKL (structural parity with
`GridInterpolationKernel` in `/root/reference/dnn/layers.py:62-78`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nngp_tpu.models import dkl, ski
from nngp_tpu.ops.iterative import batched_cg, slq_logdet


def _rbf(z1, z2, ls, amp):
    zs1, zs2 = z1 / ls, z2 / ls
    d = (np.sum(zs1 ** 2, 1)[:, None] + np.sum(zs2 ** 2, 1)[None, :]
         - 2.0 * zs1 @ zs2.T)
    return amp * np.exp(-0.5 * np.maximum(d, 0.0))


def test_cubic_interp_partition_of_unity_and_linear_reproduction():
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, 300))
    w = ski.cubic_interp_matrix(x, g=40)
    np.testing.assert_allclose(np.asarray(w.sum(1)), 1.0, atol=1e-6)
    # Keys cubic reproduces polynomials up to degree 2: W @ grid == x
    grid = np.asarray(ski.grid_points(40))
    np.testing.assert_allclose(np.asarray(w @ grid), np.asarray(x),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(w @ grid ** 2),
                               np.asarray(x) ** 2, atol=1e-5)


def test_ski_gram_approximates_dense_rbf():
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.uniform(-0.95, 0.95, (120, 2)), jnp.float64)
    ls = jnp.asarray([0.6, 0.8], jnp.float64)
    amp = 1.3
    ws = ski.interp_weights(z, 64)
    grid = ski.grid_points(64, dtype=jnp.float64)
    kuu = [ski._kuu_1d(grid, ls[i]) for i in range(2)]
    k_ski = np.asarray(ski.ski_cross_mvm(
        ws, ws, kuu, amp, jnp.eye(120, dtype=jnp.float64)))
    k_dense = _rbf(np.asarray(z), np.asarray(z), np.asarray(ls), amp)
    assert np.max(np.abs(k_ski - k_dense)) < 2e-3
    # diag helper agrees with the full product's diagonal
    d = np.asarray(ski.ski_diag(ws, kuu, amp))
    np.testing.assert_allclose(d, np.diag(k_ski), rtol=1e-10, atol=1e-12)


def test_batched_cg_matches_direct_solve():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((80, 80))
    spd = jnp.asarray(a @ a.T + 5.0 * np.eye(80), jnp.float64)
    b = jnp.asarray(rng.standard_normal((80, 5)), jnp.float64)
    x = batched_cg(lambda v: spd @ v, b, tol=1e-12, max_iters=400)
    np.testing.assert_allclose(np.asarray(x),
                               np.linalg.solve(np.asarray(spd),
                                               np.asarray(b)),
                               rtol=1e-7, atol=1e-8)


def test_slq_logdet_close_to_exact():
    rng = np.random.default_rng(3)
    q, _ = np.linalg.qr(rng.standard_normal((300, 300)))
    evals = np.linspace(0.5, 20.0, 300)
    spd = jnp.asarray((q * evals) @ q.T, jnp.float64)
    want = float(np.sum(np.log(evals)))
    got = float(slq_logdet(lambda v: spd @ v, 300,
                           jax.random.PRNGKey(0), num_probes=32,
                           num_iters=30, dtype=jnp.float64))
    assert abs(got - want) / abs(want) < 0.05


def test_predict_dkl_ski_matches_exact_dkl():
    """With the same (untrained) parameters, the SKI posterior must track
    the exact-GP DKL posterior — interpolation error only."""
    rng = np.random.default_rng(4)
    x_tr = jnp.asarray(rng.uniform(0, 1000, (150, 8)), jnp.float64)
    y_tr = jnp.asarray(rng.standard_normal((150, 1)), jnp.float64)
    x_te = jnp.asarray(rng.uniform(0, 1000, (40, 8)), jnp.float64)
    params = ski.init_dkl_params(jax.random.PRNGKey(5), 8, 32)
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), params)

    m_exact, s_exact = dkl.predict_dkl(params, x_tr, y_tr, x_te)
    m_ski, s_ski = ski.predict_dkl_ski(params, x_tr, y_tr, x_te,
                                       cg_tol=1e-12, cg_iters=500)
    np.testing.assert_allclose(np.asarray(m_ski), np.asarray(m_exact),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(s_ski), np.asarray(s_exact),
                               atol=5e-3)


def test_ski_mll_mean_const_gradient_matches_dense():
    """The surrogate's mean_const gradient must equal the closed form
    -sum(K^-1 (y - c)) of the dense -MLL (the theta gradients are the
    stochastic-trace estimator by construction)."""
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.uniform(0, 1000, (60, 5)), jnp.float64)
    y = jnp.asarray(rng.standard_normal((60, 1)), jnp.float64)
    params = ski.init_dkl_params(jax.random.PRNGKey(7), 5, 16)
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), params)

    g = jax.grad(ski.neg_mll_ski)(params, x, y, jax.random.PRNGKey(8),
                                  grid_size=48, cg_tol=1e-12, cg_iters=400)
    # dense closed form with the SKI kernel materialized
    z = dkl._rescale(dkl._embed(params, x))
    ws = ski.interp_weights(z, 48)
    grid = ski.grid_points(48, dtype=jnp.float64)
    ls, amp, noise = ski._hyper(params)
    kuu = [ski._kuu_1d(grid, ls[i]) for i in range(2)]
    k = np.array(ski.ski_cross_mvm(ws, ws, kuu, amp,
                                   jnp.eye(60, dtype=jnp.float64)))
    k += float(noise) * np.eye(60)
    alpha = np.linalg.solve(k, np.asarray(y).ravel()
                            - float(params["mean_const"]))
    np.testing.assert_allclose(float(g["mean_const"]), -alpha.sum(),
                               rtol=1e-6, atol=1e-8)


def test_train_dkl_ski_end_to_end():
    rng = np.random.default_rng(9)
    x = rng.uniform(0, 1000, (80, 6))
    y = (np.log2(1.0 + np.abs(x[:, :1] - 500.0))
         + 0.1 * rng.standard_normal((80, 1)))
    losses = []
    params = ski.train_dkl_ski(x, y, hid_dim=16, epochs=8, grid_size=32,
                               verbose=lambda s: losses.append(s))
    assert len(losses) == 8
    mean, std = ski.predict_dkl_ski(params, jnp.asarray(x), jnp.asarray(y),
                                    jnp.asarray(x[:10]), grid_size=32)
    assert np.all(np.isfinite(np.asarray(mean)))
    assert np.all(np.asarray(std) >= 0)
