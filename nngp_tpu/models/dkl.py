"""Deep Kernel Learning baseline (jax).

Parity surface of `GPRegressionModel` + `DKL_train_and_test`
(`/root/reference/dnn/layers.py:62-78`, `/root/reference/dnn/train.py:
348-388`): an MLP feature extractor projects inputs to 2 dims (min-max
rescaled to [-1, 1] as the reference does at `layers.py:74-75`), and an RBF
GP with constant mean is trained by maximizing the exact marginal likelihood
jointly over extractor + kernel + likelihood parameters with Adam.

The reference needs gpytorch's grid-interpolation (KISS-GP) for speed on
CPU; on TPU the exact Gram of the 2-d projected features is one small matmul
+ Cholesky per step, so the exact GP is used directly.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import optax


def _softplus(x):
    return jnp.logaddexp(x, 0.0)


def _embed(params, x):
    h = jnp.maximum(x @ params["w1"] + params["b1"], 0.0)
    return h @ params["w2"] + params["b2"]   # (n, 2)


def _rescale(z, ref=None):
    """[-1, 1] min-max rescale of embeddings z with stats taken from ref
    (defaults to z itself):
    gpytorch's grid-interp DKL rescales the CONCATENATED train+test batch
    jointly (`/root/reference/dnn/layers.py:74-75`), so train and test must
    share one coordinate frame — normalizing each batch independently maps
    identical inputs to different coordinates under distribution shift."""
    if ref is None:
        ref = z
    lo = jnp.min(ref, axis=0)
    z = z - lo
    return 2.0 * (z / jnp.maximum(jnp.max(ref - lo, axis=0), 1e-12)) - 1.0


def _extract(params, x, stats_from=None):
    """MLP feature extractor + [-1, 1] min-max rescale (stats from
    `stats_from`, defaulting to x itself — see `_rescale`)."""
    z = _embed(params, x)
    ref = z if stats_from is None else _embed(params, stats_from)
    return _rescale(z, ref)


def _rbf_gram(z1, z2, lengthscale, amp):
    zs1, zs2 = z1 / lengthscale, z2 / lengthscale
    d = (jnp.sum(zs1 ** 2, 1)[:, None] + jnp.sum(zs2 ** 2, 1)[None, :]
         - 2.0 * zs1 @ zs2.T)
    return amp * jnp.exp(-0.5 * jnp.maximum(d, 0.0))


def init_dkl_params(key, in_dim, hid_dim=256, out_dim=2):
    k1, k2 = jax.random.split(key)
    s1 = 1.0 / jnp.sqrt(in_dim)
    s2 = 1.0 / jnp.sqrt(hid_dim)
    return {
        "w1": jax.random.uniform(k1, (in_dim, hid_dim), minval=-s1, maxval=s1),
        "b1": jnp.zeros(hid_dim),
        "w2": jax.random.uniform(k2, (hid_dim, out_dim), minval=-s2, maxval=s2),
        "b2": jnp.zeros(out_dim),
        "raw_lengthscale": jnp.zeros(out_dim),
        "raw_amp": jnp.zeros(()),
        "raw_noise": jnp.asarray(-2.0),
        "mean_const": jnp.zeros(()),
    }


def neg_mll(params, x, y):
    z = _extract(params, x)
    ls = _softplus(params["raw_lengthscale"]) + 1e-4
    amp = _softplus(params["raw_amp"]) + 1e-4
    noise = _softplus(params["raw_noise"]) + 1e-4
    n = x.shape[0]
    k = _rbf_gram(z, z, ls, amp) + noise * jnp.eye(n)
    chol = jax.lax.linalg.cholesky(k)
    yc = y.ravel() - params["mean_const"]
    kinvy = jax.scipy.linalg.cho_solve((chol, True), yc)
    return (0.5 * jnp.dot(yc, kinvy)
            + jnp.sum(jnp.log(jnp.diagonal(chol)))
            + 0.5 * n * jnp.log(2.0 * jnp.pi))


def train_dkl(x_train, y_train, hid_dim=256, epochs=40, lr=0.01, seed=0,
              verbose=None):
    x = jnp.asarray(x_train, jnp.float32)
    y = jnp.asarray(y_train, jnp.float32)
    params = init_dkl_params(jax.random.PRNGKey(seed), x.shape[1], hid_dim)
    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(params, state, x, y):
        # data as ARGUMENTS, not closure constants: jit bakes captured
        # arrays into the executable (bigger programs, slower compiles).
        # HIGHEST precision: on TPU the default 1-pass bf16 matmuls inside
        # the n x n Cholesky/solves accumulate enough error across the
        # trailing updates to break positive-definiteness at forest scale
        # (10.8k: NaN from epoch 1; fp32 CPU is clean) — the same measured
        # failure mode as the main fit (CLAUDE.md MXU precision notes).
        with jax.default_matmul_precision("highest"):
            loss, grads = jax.value_and_grad(neg_mll)(params, x, y)
        updates, state = opt.update(grads, state)
        return optax.apply_updates(params, updates), state, loss

    for i in range(epochs):
        params, state, loss = step(params, state, x, y)
        if verbose:
            verbose(f"{i}-th Epochs: DKL Train Loss={float(loss):.4f}")
    return params


@jax.jit
def predict_dkl(params, x_train, y_train, x_test) -> Tuple[jax.Array, jax.Array]:
    """Posterior mean/std at x_test (HIGHEST matmul precision — see the
    train step: bf16 Cholesky NaNs at forest scale)."""
    with jax.default_matmul_precision("highest"):
        return _predict_dkl_impl(params, x_train, y_train, x_test)


def _predict_dkl_impl(params, x_train, y_train, x_test):
    x = jnp.asarray(x_train)
    xt = jnp.asarray(x_test)
    # One joint coordinate frame for train and test (see _rescale): embed
    # the concatenated batch ONCE, take the min/max stats from it, and
    # slice the normalized result into train/test halves — like the
    # reference's gpytorch evaluation of model(X_test) with train data
    # conditioned in, without redundant MLP forward passes.
    zj = _rescale(_embed(params, jnp.concatenate([x, xt], axis=0)), None)
    z, zt = zj[: x.shape[0]], zj[x.shape[0]:]
    ls = _softplus(params["raw_lengthscale"]) + 1e-4
    amp = _softplus(params["raw_amp"]) + 1e-4
    noise = _softplus(params["raw_noise"]) + 1e-4
    n = x.shape[0]
    k = _rbf_gram(z, z, ls, amp) + noise * jnp.eye(n)
    chol = jax.lax.linalg.cholesky(k)
    yc = jnp.asarray(y_train).ravel() - params["mean_const"]
    kinvy = jax.scipy.linalg.cho_solve((chol, True), yc)
    cross = _rbf_gram(zt, z, ls, amp)
    mean = cross @ kinvy + params["mean_const"]
    v = jax.lax.linalg.triangular_solve(chol, cross.T, left_side=True,
                                        lower=True)
    var = amp - jnp.sum(v * v, axis=0)
    return mean, jnp.sqrt(jnp.maximum(var, 0.0))
