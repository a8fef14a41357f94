"""Closed-form dual activations for infinite-width network kernels.

This module is the mathematical heart that replaces neural-tangents in the
reference (`/root/reference/train.py:161-164` builds
``stax.serial(Dense(512), Relu(), Dense(1))`` and uses its kernel). For an
infinite-width network, each nonlinearity maps the pre-activation Gaussian
covariance through a closed-form "dual" map T (for the NNGP kernel) and its
derivative-dual Tdot (for the NTK multiplier):

  ReLU  (arccos kernel, Cho & Saul 2009):
      T(k12; k11, k22)   = sqrt(k11 k22) * (sin t + (pi - t) cos t) / (2 pi)
      Tdot(k12; k11, k22) = (pi - t) / (2 pi)
      with  cos t = k12 / sqrt(k11 k22),  t in [0, pi]

  Erf   (arcsin kernel, Williams 1997):
      T    = (2/pi) * arcsin( 2 k12 / sqrt((1 + 2 k11)(1 + 2 k22)) )
      Tdot = (4/pi) / sqrt((1 + 2 k11)(1 + 2 k22) - 4 k12^2)

All functions are pure elementwise jnp — they fuse into the surrounding Gram
computation under XLA and are reused verbatim inside the Pallas kernel
(`nngp_tpu/ops/gram_pallas.py`). They are dtype-polymorphic: fp32 on TPU,
fp64 on CPU for oracle tests.

Numerical safety: the cosine is clamped to [-1, 1] before arccos (fp32
rounding can push |k12| a hair above sqrt(k11 k22) when x1 == x2), and
diagonal entries use the exact scalar maps below instead of the generic
formula, which keeps the posterior-variance subtraction well conditioned
(SURVEY.md section 7 "fp64 -> fp32 parity").
"""

import jax
import jax.numpy as jnp

from nngp_tpu.ops.math import acos_auto as _arccos, asin_auto as _arcsin

_INV_2PI = 0.15915494309189535  # 1 / (2 pi)
_PI = 3.141592653589793


def _safe_cos_theta(k12, sqrt_k11_k22):
    return jnp.clip(k12 / sqrt_k11_k22, -1.0, 1.0)


def relu_nngp(k12, k11, k22):
    """NNGP dual of ReLU: E[relu(u) relu(v)] for (u,v) ~ N(0, [[k11,k12],[k12,k22]]).

    Uses one rsqrt instead of sqrt+divide: the Gram is VPU-transcendental-
    bound, and cos = k12 * rsqrt(k11 k22), sqrt(k11 k22) = (k11 k22) * rsqrt
    saves the division at identical accuracy."""
    # tiny floor keeps zero-norm rows finite (rsqrt(0)=inf -> 0*inf=NaN);
    # the true dual for a zero row is 0 and the floored path returns ~1e-18 (floor 1e-36 stays in fp32 normal range; TPUs flush subnormals)
    kk = jnp.maximum(k11 * k22, 1e-36)
    inv = jax.lax.rsqrt(kk)
    cos_t = jnp.clip(k12 * inv, -1.0, 1.0)
    theta = _arccos(cos_t)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    return (kk * inv) * (sin_t + (_PI - theta) * cos_t) * _INV_2PI


def relu_ntk_mult(k12, k11, k22):
    """Derivative dual of ReLU: E[relu'(u) relu'(v)] = (pi - theta) / (2 pi)."""
    cos_t = jnp.clip(k12 * jax.lax.rsqrt(jnp.maximum(k11 * k22, 1e-36)),
                     -1.0, 1.0)
    return (_PI - _arccos(cos_t)) * _INV_2PI


def relu_diag(k):
    """Diagonal of the ReLU dual: T(k; k, k) = k / 2 exactly."""
    return 0.5 * k


def erf_nngp(k12, k11, k22):
    """NNGP dual of erf: (2/pi) arcsin(2 k12 / sqrt((1+2k11)(1+2k22)))."""
    inv = jax.lax.rsqrt((1.0 + 2.0 * k11) * (1.0 + 2.0 * k22))
    ratio = jnp.clip(2.0 * k12 * inv, -1.0, 1.0)
    return (2.0 / _PI) * _arcsin(ratio)


def erf_ntk_mult(k12, k11, k22):
    """Derivative dual of erf: (4/pi) / sqrt((1+2k11)(1+2k22) - 4 k12^2)."""
    denom_sq = (1.0 + 2.0 * k11) * (1.0 + 2.0 * k22) - 4.0 * k12 * k12
    return (4.0 / _PI) * jax.lax.rsqrt(jnp.maximum(denom_sq, 1e-30))


def erf_diag(k):
    """Diagonal of the erf dual: (2/pi) arcsin(2k / (1 + 2k))."""
    return (2.0 / _PI) * _arcsin(2.0 * k / (1.0 + 2.0 * k))


def sin_nngp(k12, k11, k22):
    """NNGP dual of sin: E[sin u sin v] = e^{-(k11+k22)/2} sinh(k12)
    (from E[cos w] = e^{-Var w / 2} applied to w = u -+ v). Computed as a
    difference of exps with non-positive arguments (|k12| <= (k11+k22)/2 by
    AM-GM), so it never overflows even for huge covariances."""
    a = -0.5 * (k11 + k22)
    return 0.5 * (jnp.exp(a + k12) - jnp.exp(a - k12))


def sin_ntk_mult(k12, k11, k22):
    """Derivative dual of sin: E[cos u cos v] = e^{-(k11+k22)/2} cosh(k12)."""
    a = -0.5 * (k11 + k22)
    return 0.5 * (jnp.exp(a + k12) + jnp.exp(a - k12))


def sin_diag(k):
    """T(k; k, k) = e^{-k} sinh(k) = (1 - e^{-2k}) / 2."""
    return 0.5 * (1.0 - jnp.exp(-2.0 * k))


def sin_ntk_mult_diag(k):
    """Tdot(k; k, k) = e^{-k} cosh(k) = (1 + e^{-2k}) / 2."""
    return 0.5 * (1.0 + jnp.exp(-2.0 * k))


def abs_nngp(k12, k11, k22):
    """NNGP dual of |x| via |x| = relu(x) + relu(-x): the four cross terms
    pair into 2 T_relu(k12) + 2 T_relu(-k12) (negating one variable negates
    the cross covariance). Diag sanity: 2*(k/2) + 0 = k = E[|u|^2]."""
    return 2.0 * (relu_nngp(k12, k11, k22) + relu_nngp(-k12, k11, k22))


def abs_ntk_mult(k12, k11, k22):
    """Derivative dual of |x|: E[sign(u) sign(v)] = (pi - 2 theta)/pi
    = 2 Tdot_relu(k12) - 2 Tdot_relu(-k12)."""
    return 2.0 * (relu_ntk_mult(k12, k11, k22)
                  - relu_ntk_mult(-k12, k11, k22))


def abs_diag(k):
    """T(k; k, k) = E[|u|^2] = k exactly."""
    return k


def abs_ntk_mult_diag(k):
    """Tdot(k; k, k) = E[sign(u)^2] = 1 exactly."""
    return jnp.ones_like(k)


def relu_ntk_mult_diag(k):
    """Tdot(k; k, k) = (pi - acos(1)) / (2 pi) = 1/2 exactly. The generic
    formula computes acos(k * rsqrt(k*k)) whose sqrt(eps) sensitivity at
    rho=1 injects ~1e-4 relative noise into fp32 NTK diagonals."""
    return jnp.full_like(k, 0.5)


def erf_ntk_mult_diag(k):
    """Tdot(k; k, k) = (4/pi)/sqrt((1+2k)^2 - 4k^2) = (4/pi)/sqrt(1+4k),
    algebraically cancellation-free (the generic form subtracts two large
    squares)."""
    return (4.0 / _PI) * jax.lax.rsqrt(1.0 + 4.0 * k)


# Registry used by kernel_spec to look up an activation by name.
DUALS = {
    "relu": (relu_nngp, relu_ntk_mult, relu_diag),
    "erf": (erf_nngp, erf_ntk_mult, erf_diag),
    "sin": (sin_nngp, sin_ntk_mult, sin_diag),
    "abs": (abs_nngp, abs_ntk_mult, abs_diag),
}

# Exact on-diagonal NTK multipliers (apply_diag_recursion).
DUALS_NTK_DIAG = {
    "relu": relu_ntk_mult_diag,
    "erf": erf_ntk_mult_diag,
    "sin": sin_ntk_mult_diag,
    "abs": abs_ntk_mult_diag,
}


def _make_fast_duals():
    """Fast-math variants using the division-free polynomial acos/asin
    (2.5e-8 abs error — below fp32 rounding of the Gram matmul). Selected by
    the Pallas Gram kernel where arccos dominates per-element cost."""
    from nngp_tpu.ops.math import acos_fast, asin_fast

    def relu_nngp_f(k12, k11, k22):
        sqrt_kk = jnp.sqrt(k11 * k22)
        cos_t = _safe_cos_theta(k12, sqrt_kk)
        theta = acos_fast(cos_t)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
        return sqrt_kk * (sin_t + (_PI - theta) * cos_t) * _INV_2PI

    def relu_ntk_mult_f(k12, k11, k22):
        theta = acos_fast(_safe_cos_theta(k12, jnp.sqrt(k11 * k22)))
        return (_PI - theta) * _INV_2PI

    def erf_nngp_f(k12, k11, k22):
        denom = jnp.sqrt((1.0 + 2.0 * k11) * (1.0 + 2.0 * k22))
        return (2.0 / _PI) * asin_fast(jnp.clip(2.0 * k12 / denom, -1.0, 1.0))

    def erf_diag_f(k):
        return (2.0 / _PI) * asin_fast(2.0 * k / (1.0 + 2.0 * k))

    def abs_nngp_f(k12, k11, k22):
        return 2.0 * (relu_nngp_f(k12, k11, k22)
                      + relu_nngp_f(-k12, k11, k22))

    def abs_ntk_mult_f(k12, k11, k22):
        return 2.0 * (relu_ntk_mult_f(k12, k11, k22)
                      - relu_ntk_mult_f(-k12, k11, k22))

    return {
        "relu": (relu_nngp_f, relu_ntk_mult_f, relu_diag),
        "erf": (erf_nngp_f, erf_ntk_mult, erf_diag_f),
        "sin": (sin_nngp, sin_ntk_mult, sin_diag),   # no arccos to speed up
        "abs": (abs_nngp_f, abs_ntk_mult_f, abs_diag),
    }


DUALS_FAST = _make_fast_duals()
