"""Matrix-free iterative linear algebra: batched CG and stochastic Lanczos
quadrature (SLQ) log-determinants.

This is the TPU-native machinery behind structured-kernel (SKI / KISS-GP)
Gaussian processes: the reference delegates them to gpytorch's CG/Lanczos
engine (`GridInterpolationKernel` in `/root/reference/dnn/layers.py:62-78`
is evaluated through gpytorch's iterative solves). Here the operator is any
`mvm(v)` closure over static-shape XLA ops — every iteration is a handful of
MXU matmuls, and `lax.while_loop` / `lax.fori_loop` keep the program small
and compile-friendly (no Python-unrolled iteration count).

Numerics: everything runs in the operand dtype (fp32 on TPU). CG on a
well-conditioned kernel-plus-ridge operator converges in far fewer than n
iterations; Lanczos uses full reorthogonalization against the kept basis
(t <= ~30 vectors) — without it fp32 Lanczos loses orthogonality within a
dozen steps and the Ritz values double up.
"""

from typing import Callable

import jax
import jax.numpy as jnp


def batched_cg(mvm: Callable, b: jax.Array, *, tol: float = 1e-6,
               max_iters: int = 200) -> jax.Array:
    """Solve A x = b for SPD matrix-free A, all RHS columns at once.

    mvm: (n, k) -> (n, k) applying A to each column.
    b:   (n, k) right-hand sides.
    Stops when every column's relative residual is under tol, or at
    max_iters. Static shapes: jit-stable for any fixed (n, k).
    """
    b = jnp.asarray(b)
    b_norm2 = jnp.maximum(jnp.sum(b * b, axis=0), 1e-30)

    def cond(state):
        _, r, _, rs, it = state
        return jnp.logical_and(it < max_iters,
                               jnp.max(rs / b_norm2) > tol * tol)

    def body(state):
        x, r, p, rs, it = state
        ap = mvm(p)
        # per-column step size; guard a converged column's 0/0
        denom = jnp.sum(p * ap, axis=0)
        alpha = rs / jnp.where(denom > 0, denom, 1.0)
        x = x + alpha[None, :] * p
        r = r - alpha[None, :] * ap
        rs_new = jnp.sum(r * r, axis=0)
        beta = rs_new / jnp.where(rs > 0, rs, 1.0)
        p = r + beta[None, :] * p
        return x, r, p, rs_new, it + 1

    x0 = jnp.zeros_like(b)
    state = (x0, b, b, jnp.sum(b * b, axis=0), jnp.array(0))
    x, *_ = jax.lax.while_loop(cond, body, state)
    return x


def _batched_lanczos(mvm, q0, num_iters):
    # NOT jitted here: callers jit the enclosing computation (a fresh mvm
    # closure per call would defeat a static-argname cache anyway).
    """Batched Lanczos: tridiagonalize A in the Krylov space of each probe
    column of q0 (n, m), with full reorthogonalization.

    Returns (alphas (t, m), betas (t-1, m), q_norm (m,)): per-probe
    tridiagonal coefficients and the initial probe norms."""
    n, m = q0.shape
    t = num_iters
    q_norm = jnp.sqrt(jnp.sum(q0 * q0, axis=0))
    q = q0 / jnp.maximum(q_norm[None, :], 1e-30)

    # basis has one spare row so the last iteration's .at[i+1] write stays
    # in bounds (row t is never read: the loop ends right after writing it)
    basis = jnp.zeros((t + 1, n, m), q0.dtype).at[0].set(q)
    alphas = jnp.zeros((t, m), q0.dtype)
    betas = jnp.zeros((t, m), q0.dtype)    # betas[i] links step i -> i+1

    def body(i, carry):
        basis, alphas, betas, q_prev, q_cur, beta_prev = carry
        w = mvm(q_cur)
        alpha = jnp.sum(q_cur * w, axis=0)
        w = w - alpha[None, :] * q_cur - beta_prev[None, :] * q_prev
        # full reorthogonalization against every kept vector (rows > i are
        # still zero — einsum over the whole basis keeps the program static)
        coeffs = jnp.einsum("tnm,nm->tm", basis, w)
        w = w - jnp.einsum("tnm,tm->nm", basis, coeffs)
        beta = jnp.sqrt(jnp.maximum(jnp.sum(w * w, axis=0), 0.0))
        q_next = w / jnp.maximum(beta[None, :], 1e-30)
        alphas = alphas.at[i].set(alpha)
        betas = betas.at[i].set(beta)
        basis = basis.at[i + 1].set(q_next)
        return basis, alphas, betas, q_cur, q_next, beta

    init = (basis, alphas, betas, jnp.zeros_like(q), q,
            jnp.zeros((m,), q0.dtype))
    _, alphas, betas, *_ = jax.lax.fori_loop(0, t, body, init)
    return alphas, betas[:-1], q_norm


def slq_logdet(mvm: Callable, n: int, key: jax.Array, *,
               num_probes: int = 16, num_iters: int = 25,
               dtype=jnp.float32) -> jax.Array:
    """Stochastic Lanczos quadrature estimate of logdet(A) for SPD
    matrix-free A of size n x n.

    E_z[z^T log(A) z] = tr(log A) = logdet(A) with Rademacher probes z;
    each quadratic form is evaluated by t Lanczos steps + an eigensolve of
    the t x t tridiagonal (Golub-Welsch quadrature). Relative error is
    typically ~1% at 16 probes / 25 iters for kernel-plus-ridge spectra.
    """
    z = jnp.where(
        jax.random.bernoulli(key, 0.5, (n, num_probes)), 1.0, -1.0
    ).astype(dtype)
    alphas, betas, q_norm = _batched_lanczos(mvm, z, num_iters)
    t = alphas.shape[0]
    # per-probe tridiagonal (m, t, t); betas (t-1, m) padded with a zero
    # row so the off-diagonal einsums line up with the full (t, t) eyes
    bpad = jnp.concatenate(
        [betas, jnp.zeros((1, betas.shape[1]), dtype)], axis=0)
    tri = (jnp.einsum("tm,tj->mtj", alphas, jnp.eye(t, dtype=dtype))
           + jnp.einsum("tm,tj->mtj", bpad, jnp.eye(t, k=1, dtype=dtype))
           + jnp.einsum("tm,tj->mtj", jnp.roll(bpad, 1, axis=0),
                        jnp.eye(t, k=-1, dtype=dtype)))
    evals, evecs = jnp.linalg.eigh(tri)
    # quadrature: z^T log(A) z ~ |z|^2 * sum_j (e1^T v_j)^2 log(lambda_j).
    # A is SPD but fp32 Lanczos can leak tiny negative Ritz values: clamp.
    tau2 = evecs[:, 0, :] ** 2                       # (m, t)
    logs = jnp.log(jnp.maximum(evals, 1e-30))
    quad = jnp.sum(tau2 * logs, axis=1) * q_norm ** 2
    return jnp.mean(quad)
