"""Elementwise math primitives missing from the Pallas TPU lowering.

Mosaic (Pallas TPU) does not lower acos/asin/atan (probed on this image —
only sin/cos/sqrt/rsqrt/exp/log/tanh are available). The arccos-kernel
recursion needs arccos, so it is implemented here from primitives with the
classic fdlibm branch structure + rational arcsin core:

    |x| <  0.5 :  acos(x) = pi/2 - asin(x),  asin(x) = x + x * R(x^2)
    x  >= 0.5 :  acos(x) = 2 * asin(sqrt((1-x)/2))
    x  <= -0.5 :  acos(x) = pi - 2 * asin(sqrt((1+x)/2))

R(z) = p(z)/q(z) uses the double-precision fdlibm coefficients, giving
~1 ulp in fp32 and ~1e-17 relative in fp64 — far below the diag_reg ridge,
so XLA-path and Pallas-path Grams agree to rounding. Used unconditionally
(also under plain XLA) so both Gram paths share one numeric definition.
"""

import jax.numpy as jnp

_PIO2 = 1.5707963267948966
_PI = 3.141592653589793

_PS0 = 1.66666666666666657415e-01
_PS1 = -3.25565818622400915405e-01
_PS2 = 2.01212532134862925881e-01
_PS3 = -4.00555345006794114027e-02
_PS4 = 7.91534994289814532176e-04
_PS5 = 3.47933107596021167570e-05
_QS1 = -2.40339491173441421878e+00
_QS2 = 2.02094576023350569471e+00
_QS3 = -6.88283971605453293030e-01
_QS4 = 7.70381505559019352791e-02


def _asin_core(z):
    """R(z) such that asin(x) = x + x*R(x^2) for |x| <= 0.5 (z = x^2 <= 0.25)."""
    p = z * (_PS0 + z * (_PS1 + z * (_PS2 + z * (_PS3 + z * (_PS4 + z * _PS5)))))
    q = 1.0 + z * (_QS1 + z * (_QS2 + z * (_QS3 + z * _QS4)))
    return p / q


def acos(x):
    """Elementwise arccos for x in [-1, 1]; Pallas-TPU-lowerable."""
    ax = jnp.abs(x)
    # Branch A: |x| < 0.5
    za = x * x
    asin_x = x + x * _asin_core(za)
    res_a = _PIO2 - asin_x
    # Branch B: x >= 0.5  -> 2*asin(sqrt((1-x)/2))
    zb = jnp.maximum((1.0 - ax) * 0.5, 0.0)
    sb = jnp.sqrt(zb)
    two_asin = 2.0 * (sb + sb * _asin_core(zb))
    res_b = two_asin
    # Branch C: x <= -0.5 -> pi - 2*asin(sqrt((1+x)/2))
    res_c = _PI - two_asin
    return jnp.where(ax < 0.5, res_a, jnp.where(x >= 0.0, res_b, res_c))


def asin(x):
    """Elementwise arcsin for x in [-1, 1]; Pallas-TPU-lowerable."""
    return _PIO2 - acos(x)


# Degree-7 Chebyshev-LSQ fit of acos(x)/sqrt(1-x) on [0,1]; max abs error
# 2.5e-8 over [-1,1] — below one fp32 ulp at the pi/2 scale. Division-free
# (1 sqrt + 7 FMA + reflection), ~2.5x cheaper on the VPU than the fdlibm
# rational above; used inside the Pallas Gram kernel where the arccos is the
# dominant per-element cost.
_FAST_C = (1.57079630e+00, -2.14598494e-01, 8.89740993e-02, -5.01450250e-02,
           3.08082534e-02, -1.69654720e-02, 6.58088524e-03, -1.23700485e-03)


def acos_fast(x):
    """Elementwise arccos, fp32-accurate (2.5e-8 abs), division-free."""
    ax = jnp.abs(x)
    p = _FAST_C[7]
    for c in _FAST_C[6::-1]:
        p = p * ax + c
    pos = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * p
    return jnp.where(x >= 0.0, pos, _PI - pos)


def asin_fast(x):
    return _PIO2 - acos_fast(x)


def acos_auto(x):
    """Dtype dispatch: fp64 gets the exact fdlibm rational (oracle runs),
    fp32 gets the division-free polynomial (2.5e-8 abs — below the Gram
    matmul's own fp32 rounding, and ~3x cheaper on the VPU where the
    arccos dominates Gram assembly)."""
    if jnp.asarray(x).dtype == jnp.float64:
        return acos(x)
    return acos_fast(x)


def asin_auto(x):
    if jnp.asarray(x).dtype == jnp.float64:
        return asin(x)
    return asin_fast(x)
