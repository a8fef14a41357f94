"""Trainable RBF (exponentiated-quadratic) GP baseline.

Parity surface of the reference's hand-rolled JAX GP
(`/root/reference/train.py:60-150`): softplus-constrained amplitude / noise /
lengthscale, exact MLL via Cholesky, lognormal amplitude prior
(`:96-103`), RMSProp-style hyperparameter loop (10 steps, lr 0.01,
`:117-136`), posterior mean/var with the train-mean offset (`:104-110`).

TPU-native differences: the covariance is one MXU matmul via the
||x-y||^2 = ||x||^2 + ||y||^2 - 2<x,y> identity (the reference vmaps a
per-pair lambda, `train.py:65-76`, which is O(n^2 d) scalar ops), the whole
train step is one jitted program, and the broken `jit` import of the
reference (`train.py:11` commented out — the `--kernel_type gp` path
NameErrors in that snapshot; SURVEY.md section 5 quirks) obviously isn't
reproduced.
"""

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def _softplus(x):
    return jnp.logaddexp(x, 0.0)


def _sq_dists(x1, x2):
    """Pairwise squared distances as a matmul (MXU) + broadcasts."""
    n1 = jnp.sum(x1 * x1, axis=1)[:, None]
    n2 = jnp.sum(x2 * x2, axis=1)[None, :]
    cross = jax.lax.dot_general(
        x1, x2, dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(n1 + n2 - 2.0 * cross, 0.0)


def init_params(dtype=jnp.float32) -> Dict[str, jax.Array]:
    """Reference init (`train.py:117-119`)."""
    return {
        "amplitude": jnp.zeros((1, 1), dtype),
        "noise": jnp.zeros((1, 1), dtype) - 5.0,
        "lengthscale": jnp.zeros((1, 1), dtype),
    }


def _gp_core(params, x, y):
    noise = _softplus(params["noise"])
    amp = _softplus(params["amplitude"])
    ls = _softplus(params["lengthscale"])
    ymean = jnp.mean(y)
    yc = y - ymean
    xs = x / ls
    n = x.shape[0]
    train_cov = (amp * jnp.exp(-_sq_dists(xs, xs))
                 + jnp.eye(n, dtype=x.dtype) * (noise + 1e-6))
    chol = jax.lax.linalg.cholesky(train_cov)
    kinvy = jax.scipy.linalg.cho_solve((chol, True), yc)
    return noise, amp, ls, ymean, yc, xs, chol, kinvy


def neg_marginal_likelihood(params, x, y):
    """Negative MLL + lognormal amplitude prior (`train.py:96-103`)."""
    noise, amp, ls, ymean, yc, xs, chol, kinvy = _gp_core(params, x, y)
    n = x.shape[0]
    log2pi = jnp.log(2.0 * 3.1415)  # the reference uses 3.1415 — keep parity
    ml = jnp.sum(
        -0.5 * jnp.sum(yc * kinvy)
        - jnp.sum(jnp.log(jnp.diagonal(chol)))
        - (n / 2.0) * log2pi
    )
    ml -= jnp.sum(-0.5 * jnp.log(2 * 3.1415) - jnp.log(amp) ** 2)
    return -ml


@functools.partial(jax.jit, donate_argnums=())
def _train_step(params, momentums, scales, x, y, lr):
    """RMSProp-with-momentum exactly as `train.py:124-130`."""
    grads = jax.grad(neg_marginal_likelihood)(params, x, y)
    new_p, new_m, new_s = {}, {}, {}
    for k in params:
        g = grads[k][0]
        new_m[k] = 0.9 * momentums[k] + 0.1 * g
        new_s[k] = 0.9 * scales[k] + 0.1 * g ** 2
        new_p[k] = params[k] - lr * new_m[k] / jnp.sqrt(new_s[k] + 1e-5)
    return new_p, new_m, new_s


def train(x, y, num_steps: int = 10, lr: float = 0.01, verbose=print):
    params = init_params(x.dtype)
    momentums = {k: p * 0.0 for k, p in params.items()}
    scales = {k: p * 0.0 + 1.0 for k, p in params.items()}
    for i in range(num_steps):
        params, momentums, scales = _train_step(params, momentums, scales,
                                                x, y, lr)
        if verbose:
            ml = neg_marginal_likelihood(params, x, y)
            verbose(f"Step: {i}, neg marginal likelihood: {float(ml):f}")
    return params


@jax.jit
def predict(params, x, y, x_test) -> Tuple[jax.Array, jax.Array]:
    """Posterior mean and full covariance (`train.py:104-110`)."""
    noise, amp, ls, ymean, yc, xs, chol, kinvy = _gp_core(params, x, y)
    xt = x_test / ls
    cross = amp * jnp.exp(-_sq_dists(xs, xt))          # (n, m)
    mu = cross.T @ kinvy + ymean
    v = jax.lax.linalg.triangular_solve(chol, cross, left_side=True, lower=True)
    var = amp * jnp.exp(-_sq_dists(xt, xt)) - v.T @ v
    return mu, var
