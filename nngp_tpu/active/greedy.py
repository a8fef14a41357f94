"""Batch-diverse acquisition: greedy conditional-variance selection.

The reference's two acquisition rules score pool points INDEPENDENTLY —
top-k posterior std or biased sampling with p proportional to std
(`/root/reference/active/ActiveLearner.py:43-55`). With batch budgets in
the hundreds, independent scoring buys near-duplicates: the k highest-std
points are usually clustered in one under-covered region, and observing
one of them collapses the variance of the rest.

`greedy_variance_select` fixes that with exact sequential conditioning:
pick the max-variance point, CONDITION the pool covariance on observing it
(fantasy update — the GP posterior covariance does not depend on y, so the
update is exact without a label), repeat. Each step is a Schur complement

    C <- C - c c^T / (C[s, s] + noise),   c = C[:, s]

i.e. the batch is the pivot set of a partial pivoted Cholesky of the pool
posterior covariance. For an NNGP posterior this is exactly the point
whose acquisition most reduces total predictive uncertainty at each step;
for the NTK posterior (whose predictive law mixes the NNGP and NTK
kernels) it is the same pivoted-Cholesky diversity rule applied to its
covariance — still duplicate-suppressing, no longer an exact conditional.

TPU shape: one `predict(compute_cov=True)` dispatch builds the (P, P)
pool covariance on device, then the k-step loop is a `lax.fori_loop` of
rank-1 updates — O(k P^2) fused MXU/VPU work with no host round-trips.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k",))
def greedy_variance_select(cov, k: int, noise=0.0, num_valid=None):
    """Greedy max-conditional-variance batch of `k` indices.

    cov: (P, P) posterior covariance of the candidate pool (PSD up to
    fp32 roundoff). noise: fantasy observation-noise VARIANCE added to the
    pivot before conditioning — pass the fit's effective ridge (in the
    same units as `cov`) so a fantasized observation is conditioned
    exactly like a real one; 0.0 selects by pure pivoted Cholesky.

    num_valid: only rows < num_valid are candidates (may be traced) —
    lets the caller zero-pad the pool to a fixed bucket shape so the
    compiled program is reused as the pool shrinks round over round
    (tunnel compiles cost 30-300 s). Requires k <= num_valid.

    Returns (k,) int32 indices into the pool, distinct by construction
    (selected pivots are masked out of the argmax), ordered by selection.
    """
    p = cov.shape[0]
    if k > p:
        raise ValueError(f"cannot select {k} from a pool of {p}")
    cov = jnp.asarray(cov)
    noise = jnp.asarray(noise, cov.dtype)
    # fp32 covariance diagonals can dip epsilon-negative for near-
    # interpolated points; a degenerate pivot (c[s,s] + noise below tiny,
    # possible past the numerical rank with noise=0.0) must yield a
    # NO-OP update — dividing by a floored denominator instead would
    # blow the column up by ~1e38 and corrupt every later selection
    tiny = jnp.asarray(jnp.finfo(cov.dtype).tiny, cov.dtype)
    if num_valid is None:
        mask0 = jnp.zeros((p,), bool)
    else:
        mask0 = jnp.arange(p) >= num_valid

    def body(j, state):
        c, mask, sel = state
        d = jnp.where(mask, -jnp.inf, jnp.diagonal(c))
        s = jnp.argmax(d)
        col = c[:, s]
        denom = c[s, s] + noise
        inv = jnp.where(denom > tiny, 1.0 / jnp.maximum(denom, tiny), 0.0)
        c = c - jnp.outer(col, col) * inv
        return (c, mask.at[s].set(True), sel.at[j].set(s.astype(jnp.int32)))

    _, _, sel = jax.lax.fori_loop(
        0, k, body,
        (cov, mask0, jnp.zeros((k,), jnp.int32)))
    return sel
