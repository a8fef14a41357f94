"""Dense linear algebra for the exact GP posterior.

The reference factorizes the train Gram once inside neural-tangents
(`/root/reference/train.py:171-172`) and its hand-rolled GP does the same
explicitly (`/root/reference/train.py:93-95`). Here the factorization runs
on-device via ``lax.linalg.cholesky`` (XLA's blocked TPU implementation), and
active learning gets an incremental block append (`cholesky_append_rows`) so
each acquisition round costs O(n^2 k) instead of the reference's full O(n^3)
refit (`/root/reference/active/ActiveLearner.py:67-77`).

`diag_reg` follows neural-tangents' *relative* semantics: the ridge added is
``diag_reg * mean(diag(K))``, not ``diag_reg`` itself.
"""

import jax
import jax.numpy as jnp


def cholesky_with_ridge(k, diag_reg=1e-3, diag_reg_absolute_scale=False):
    """Cholesky of K + reg*I with reg = diag_reg * mean(diag K) (relative).

    Returns (L, reg) where L is lower triangular.
    """
    n = k.shape[0]
    if diag_reg_absolute_scale:
        reg = jnp.asarray(diag_reg, k.dtype)
    else:
        reg = diag_reg * jnp.mean(jnp.diagonal(k))
    k_reg = k + reg * jnp.eye(n, dtype=k.dtype)
    return jax.lax.linalg.cholesky(k_reg), reg


def tri_solve_lower(l, b):
    """Solve L x = b for lower-triangular L."""
    return jax.lax.linalg.triangular_solve(
        l, b, left_side=True, lower=True, transpose_a=False
    )


def tri_solve_lower_t(l, b):
    """Solve L^T x = b for lower-triangular L."""
    return jax.lax.linalg.triangular_solve(
        l, b, left_side=True, lower=True, transpose_a=True
    )


def cho_solve(l, b):
    """Solve (L L^T) x = b."""
    return tri_solve_lower_t(l, tri_solve_lower(l, b))


def cholesky_append_rows(l11, k21, k22):
    """Extend a Cholesky factor when appending rows/cols to the Gram matrix.

    Given L11 = chol(K11) and the new blocks so that the extended matrix is
    [[K11, K21^T], [K21, K22]], returns the extended lower factor
    [[L11, 0], [L21, L22]] where L21 = K21 L11^{-T} and
    L22 = chol(K22 - L21 L21^T).

    K22 must already include its ridge. O(n^2 m + m^3) — the active-learning
    fast path.
    """
    l21 = jax.lax.linalg.triangular_solve(
        l11, k21, left_side=False, lower=True, transpose_a=True
    )
    schur = k22 - l21 @ l21.T
    l22 = jax.lax.linalg.cholesky(schur)
    n, m = l11.shape[0], k22.shape[0]
    top = jnp.concatenate([l11, jnp.zeros((n, m), l11.dtype)], axis=1)
    bot = jnp.concatenate([l21, l22], axis=1)
    return jnp.concatenate([top, bot], axis=0)
