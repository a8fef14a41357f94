"""Double-float NNGP/NTK kernel recursion — fp64-class Gram entries on TPU.

The fp32 Nystrom serving tier carries a measured ~5% median q-error
penalty against the fp64-CPU anchor (BASELINE.md "fp32-vs-fp64 gap
attribution": 2.521 vs 2.399 at 90k rows, m=2048): psi = W^T K_mn noise
at the whitening amplification bound sqrt(1/rank_rtol) * eps_fp32 ~ 6e-4
sits marginal against the 1e-3 ridge. The bases and the k x k stages are
already fp64-grade (host LAPACK or `ops/df64.py` on device); the residual
noise is the fp32 KERNEL ENTRIES themselves plus the fp32 projection
matmul. This module removes both: the dual-activation recursion
(`ops/dual_activations.py`, reference semantics behind
`/root/reference/train.py:161-168`) evaluated in double-float (hi, lo)
fp32 pairs on the VPU, with the input Gram and any downstream projection
on the MXU via `ops.df64.hp_matmul` (Ozaki integer slicing — exact slice
products). End-to-end entry accuracy ~1e-13 relative (tests/test_df64.py
asserts vs the fp64 CPU oracle), i.e. fp64-grade for every consumer whose
own rounding floor is fp32.

The transcendental core is the fdlibm rational arcsin (the same branch
structure as `ops/math.py`, which this module mirrors in df arithmetic):

    |x| <  0.5 :  acos(x) = pi/2 - asin(x),  asin(x) = x + x * R(x^2)
    x  >= 0.5 :  acos(x) = 2 * asin(sqrt((1-x)/2))
    x  <= -0.5 :  acos(x) = pi - 2 * asin(sqrt((1+x)/2))

R's approximation error is ~2^-58, below the df64 unit roundoff 2^-49,
so the df evaluation error is pure arithmetic rounding. The reductions
(1 -+ x)/2 are computed IN df, which is the whole point: fp32 acos near
rho = 1 loses the angle entirely (1 - rho rounds to eps granularity),
while the df path keeps theta ~ sqrt(2(1-rho)) relatively accurate —
exactly the near-duplicate-row regime that decides posterior quality at
kappa(K) ~ 1e8.

Supported duals: relu / abs (the homogeneous pair) and erf. sin needs a
df exp and has no workload here — it raises.
"""

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from nngp_tpu.ops.df64 import (DF, df_add, df_const, df_div, df_from_f32,
                               df_mul, df_neg, df_sqrt, df_sub, hp_matmul,
                               _df_tree_sum, _two_prod, _two_sum)

__all__ = [
    "df_acos", "df_asin", "df_apply_recursion", "df_input_gram",
    "df_input_diag", "df_kernel_eval", "DF_DUALS",
]


def _pair(v: float):
    """Split a python float64 into an (hi, lo) fp32 pair at module scope —
    plain floats only (no jnp at import time; backend init order matters,
    CLAUDE.md), lifted to DF inside traced code by `_dfc`."""
    hi = np.float32(v)
    lo = np.float32(v - np.float64(hi))
    return float(hi), float(lo)


_PI = _pair(3.141592653589793)
_PIO2 = _pair(1.5707963267948966)
_INV_2PI = _pair(0.15915494309189535)
_TWO_OVER_PI = _pair(0.6366197723675814)
_FOUR_OVER_PI = _pair(1.2732395447351628)

# fdlibm e_asin.c rational coefficients (approximation error ~2^-58)
_PS = [_pair(v) for v in (
    1.66666666666666657415e-01, -3.25565818622400915405e-01,
    2.01212532134862925881e-01, -4.00555345006794114027e-02,
    7.91534994289814532176e-04, 3.47933107596021167570e-05)]
_QS = [_pair(v) for v in (
    -2.40339491173441421878e+00, 2.02094576023350569471e+00,
    -6.88283971605453293030e-01, 7.70381505559019352791e-02)]


def _dfc(pair) -> DF:
    # opaque constants: literal (hi, lo) pairs entering two_sum chains
    # get algebraically simplified away under jit (ops/df64.df_const)
    return df_const(pair[0], pair[1])


def _df_where(mask, a: DF, b: DF) -> DF:
    return DF(jnp.where(mask, a.hi, b.hi), jnp.where(mask, a.lo, b.lo))


def _df_abs(a: DF) -> DF:
    neg = a.hi < 0
    return DF(jnp.where(neg, -a.hi, a.hi), jnp.where(neg, -a.lo, a.lo))


def _df_scale_pow2(a: DF, s: float) -> DF:
    """Multiply by an exact power of two (error-free)."""
    s32 = jnp.float32(s)
    return DF(a.hi * s32, a.lo * s32)


def _df_clip_pm1(a: DF) -> DF:
    """Clip a df value to [-1, 1] (rounding can push |rho| past 1)."""
    one = df_from_f32(jnp.ones_like(a.hi))
    over = (a.hi > 1.0) | ((a.hi == 1.0) & (a.lo > 0.0))
    under = (a.hi < -1.0) | ((a.hi == -1.0) & (a.lo < 0.0))
    return _df_where(over, one, _df_where(under, df_neg(one), a))


def _asin_core(z: DF) -> DF:
    """R(z) with asin(x) = x + x * R(x^2), valid z = x^2 <= 0.25.
    df Horner over the fdlibm rational."""
    p = _dfc(_PS[5])
    for c in _PS[4::-1]:
        p = df_add(df_mul(z, p), _dfc(c))
    p = df_mul(z, p)
    q = _dfc(_QS[3])
    for c in _QS[2::-1]:
        q = df_add(df_mul(z, q), _dfc(c))
    q = df_add(df_mul(z, q), df_const(1.0))
    return df_div(p, q)


def df_acos(x: DF) -> DF:
    """Elementwise df arccos for x in [-1, 1] (callers clip first).
    ~2^-48 relative in theta, including theta -> 0 (rho -> 1), where the
    (1 - x)/2 reduction is exact in df."""
    ax = _df_abs(x)
    small = ax.hi < 0.5
    # branch A: asin(x) directly (z = x^2)
    za = df_mul(x, x)
    # branch B/C: z = (1 - |x|)/2, asin(sqrt(z))
    zb = _df_scale_pow2(df_sub(df_const(1.0), ax), 0.5)
    zb = DF(jnp.maximum(zb.hi, 0.0), jnp.where(zb.hi > 0, zb.lo, 0.0))
    sb = df_sqrt(zb)
    # one asin-core evaluation on the selected argument/arg^2
    z_sel = _df_where(small, za, zb)
    arg = _df_where(small, x, sb)
    r = _asin_core(z_sel)
    asin_v = df_add(arg, df_mul(arg, r))          # asin(arg), odd in arg
    res_a = df_sub(_dfc(_PIO2), asin_v)           # acos(x), |x| < .5
    res_b = _df_scale_pow2(asin_v, 2.0)           # acos(|x|), |x| >= .5
    res_c = df_sub(_dfc(_PI), res_b)              # acos(-|x|)
    big = _df_where(x.hi >= 0, res_b, res_c)
    return _df_where(small, res_a, big)


def df_asin(x: DF) -> DF:
    return df_sub(_dfc(_PIO2), df_acos(x))


# ---------------------------------------------------------------------------
# dual activations in df (same math as ops/dual_activations.py)
# ---------------------------------------------------------------------------

def _df_safe_rho(k12: DF, k11: DF, k22: DF):
    """(rho, s) with s = sqrt(k11 k22) and rho = clip(k12 / s, -1, 1).
    Zero-norm rows (s == 0) get rho = 0 — their dual is 0 via the s
    factor, mirroring the fp32 floor in `relu_nngp`."""
    kk = df_mul(k11, k22)
    s = df_sqrt(kk)
    dead = s.hi <= 1e-18
    safe_s = _df_where(dead, df_from_f32(jnp.ones_like(s.hi)), s)
    rho = _df_clip_pm1(df_div(k12, safe_s))
    rho = _df_where(dead, df_from_f32(jnp.zeros_like(s.hi)), rho)
    return rho, s


def df_relu_nngp(k12: DF, k11: DF, k22: DF) -> DF:
    """T(k12; k11, k22) = s (sin t + (pi - t) cos t) / (2 pi)."""
    rho, s = _df_safe_rho(k12, k11, k22)
    theta = df_acos(rho)
    one = df_const(1.0)
    sin_t = df_sqrt(df_mul(df_sub(one, rho), df_add(one, rho)))
    j1 = df_add(sin_t, df_mul(df_sub(_dfc(_PI), theta), rho))
    return df_mul(df_mul(s, j1), _dfc(_INV_2PI))


def df_relu_ntk_mult(k12: DF, k11: DF, k22: DF) -> DF:
    rho, _ = _df_safe_rho(k12, k11, k22)
    return df_mul(df_sub(_dfc(_PI), df_acos(rho)), _dfc(_INV_2PI))


def df_relu_diag(k: DF) -> DF:
    return _df_scale_pow2(k, 0.5)


def df_erf_nngp(k12: DF, k11: DF, k22: DF) -> DF:
    """(2/pi) asin(2 k12 / sqrt((1+2k11)(1+2k22)))."""
    one = df_const(1.0)
    d1 = df_add(one, _df_scale_pow2(k11, 2.0))
    d2 = df_add(one, _df_scale_pow2(k22, 2.0))
    s = df_sqrt(df_mul(d1, d2))
    ratio = _df_clip_pm1(df_div(_df_scale_pow2(k12, 2.0), s))
    return df_mul(_dfc(_TWO_OVER_PI), df_asin(ratio))


def df_erf_ntk_mult(k12: DF, k11: DF, k22: DF) -> DF:
    """(4/pi) / sqrt((1+2k11)(1+2k22) - 4 k12^2)."""
    one = df_const(1.0)
    d1 = df_add(one, _df_scale_pow2(k11, 2.0))
    d2 = df_add(one, _df_scale_pow2(k22, 2.0))
    k2 = df_mul(k12, k12)
    den = df_sub(df_mul(d1, d2), _df_scale_pow2(k2, 4.0))
    den = DF(jnp.maximum(den.hi, 1e-30),
             jnp.where(den.hi > 1e-30, den.lo, 0.0))
    return df_div(_dfc(_FOUR_OVER_PI), df_sqrt(den))


def df_erf_diag(k: DF) -> DF:
    one = df_const(1.0)
    ratio = df_div(_df_scale_pow2(k, 2.0),
                   df_add(one, _df_scale_pow2(k, 2.0)))
    return df_mul(_dfc(_TWO_OVER_PI), df_asin(_df_clip_pm1(ratio)))


def df_abs_nngp(k12: DF, k11: DF, k22: DF) -> DF:
    return _df_scale_pow2(
        df_add(df_relu_nngp(k12, k11, k22),
               df_relu_nngp(df_neg(k12), k11, k22)), 2.0)


def df_abs_ntk_mult(k12: DF, k11: DF, k22: DF) -> DF:
    return _df_scale_pow2(
        df_sub(df_relu_ntk_mult(k12, k11, k22),
               df_relu_ntk_mult(df_neg(k12), k11, k22)), 2.0)


def df_abs_diag(k: DF) -> DF:
    return k


def _df_sin_unsupported(*_a, **_k):
    raise NotImplementedError(
        "sin dual needs a df exp — no workload uses it at df precision")


DF_DUALS = {
    "relu": (df_relu_nngp, df_relu_ntk_mult, df_relu_diag),
    "erf": (df_erf_nngp, df_erf_ntk_mult, df_erf_diag),
    "abs": (df_abs_nngp, df_abs_ntk_mult, df_abs_diag),
    "sin": (_df_sin_unsupported,) * 3,
}


# ---------------------------------------------------------------------------
# kernel recursion
# ---------------------------------------------------------------------------

def _df_dense_const(v: float) -> tuple:
    """w_std^2 / b_std^2 as an (hi, lo) pair — squared in float64 first so
    the df constant carries the exact square of the spec's float."""
    return _pair(float(np.float64(v) * np.float64(v)))


def df_apply_recursion(k: DF, ntk, d1: DF, d2: DF,
                       layers: Sequence) -> tuple:
    """`kernel_spec.apply_recursion` in df arithmetic. `ntk` may be None
    for nngp-only callers (skips the multiplier chain entirely). Dense
    w_std/b_std must be CONCRETE floats (traced spec_params have no df
    lift; the hyperopt path stays fp32/fp64)."""
    from nngp_tpu.models.kernel_spec import Dense

    for layer in layers:
        if isinstance(layer, Dense):
            if not isinstance(layer.w_std, (int, float)) or \
                    not isinstance(layer.b_std, (int, float)):
                raise TypeError(
                    "df kernel recursion needs concrete Dense std floats "
                    "(traced spec_params are not supported)")
            w2 = _dfc(_df_dense_const(layer.w_std))
            b2 = _dfc(_df_dense_const(layer.b_std))
            k = df_add(df_mul(k, w2), b2)
            if ntk is not None:
                ntk = df_add(df_mul(ntk, w2), k)
            d1 = df_add(df_mul(d1, w2), b2)
            d2 = df_add(df_mul(d2, w2), b2)
        else:
            t, tdot, tdiag = DF_DUALS[layer.name]
            if ntk is not None:
                ntk = df_mul(ntk, tdot(k, d1, d2))
            k = t(k, d1, d2)
            d1 = tdiag(d1)
            d2 = tdiag(d2)
    return k, ntk


def df_input_gram(x1, x2) -> DF:
    """K0 = x1 @ x2.T / d in df: exact Ozaki matmul + df scale by 1/d."""
    d = x1.shape[-1]
    k = hp_matmul(jnp.asarray(x1, jnp.float32),
                  jnp.asarray(x2, jnp.float32), transpose_b=True)
    return df_mul(k, _dfc(_pair(1.0 / float(d))))


def df_input_diag(x) -> DF:
    """Row squared norms / d in df (exact products, tree reduction)."""
    x = jnp.asarray(x, jnp.float32)
    sq = DF(*_two_prod(x, x))
    s = _df_tree_sum(sq, axis=1)
    return df_mul(s, _dfc(_pair(1.0 / float(x.shape[-1]))))


def df_kernel_eval(layers, x1, x2=None, get="nngp"):
    """Dense df Gram block for the requested kernel(s). Returns DF (or a
    tuple of DF when `get` is a tuple) — callers keep the pair for exact
    downstream projection (`hp_matmul` accepts DF operands) or round with
    `df_round`. Semantics anchor: `KernelSpec.kernel_fn`
    (`models/kernel_spec.py`), itself the rebuild of the reference's
    neural-tangents kernel (`/root/reference/train.py:161-168`)."""
    if x2 is None:
        x2 = x1
    want = get if isinstance(get, (tuple, list)) else (get,)
    need_ntk = "ntk" in want
    k0 = df_input_gram(x1, x2)
    d1v = df_input_diag(x1)
    d2v = df_input_diag(x2)
    d1 = DF(d1v.hi[:, None], d1v.lo[:, None])
    d2 = DF(d2v.hi[None, :], d2v.lo[None, :])
    ntk0 = df_from_f32(jnp.zeros_like(k0.hi)) if need_ntk else None
    nngp, ntk = df_apply_recursion(k0, ntk0, d1, d2, layers)
    out = {"nngp": nngp, "ntk": ntk}
    if isinstance(get, (tuple, list)):
        return tuple(out[g] for g in get)
    return out[get]
