"""acos/asin implementations (Pallas-lowerable) vs numpy."""

import numpy as np

from nngp_tpu.ops.math import acos, acos_fast, asin, asin_fast


def test_acos_fdlibm_fp64_exact():
    x = np.linspace(-1, 1, 500001)
    np.testing.assert_allclose(np.asarray(acos(x)), np.arccos(x), atol=1e-15)
    np.testing.assert_allclose(np.asarray(asin(x)), np.arcsin(x), atol=1e-15)


def test_acos_fast_absolute_error_bound():
    x = np.linspace(-1, 1, 500001)
    err = np.abs(np.asarray(acos_fast(x)) - np.arccos(x))
    assert err.max() < 5e-8
    err2 = np.abs(np.asarray(asin_fast(x)) - np.arcsin(x))
    assert err2.max() < 5e-8


def test_acos_endpoints_and_fp32():
    for fn in (acos, acos_fast):
        assert abs(float(fn(np.float32(1.0)))) < 1e-6
        assert abs(float(fn(np.float32(-1.0))) - np.pi) < 1e-6
        x32 = np.linspace(-1, 1, 100001).astype(np.float32)
        got = np.asarray(fn(x32))
        assert np.isfinite(got).all()
        assert np.abs(got - np.arccos(x32.astype(np.float64))).max() < 1e-6


def test_fast_duals_match_precise_duals():
    from nngp_tpu.ops.dual_activations import DUALS, DUALS_FAST
    rng = np.random.default_rng(0)
    k11 = rng.uniform(0.5, 5.0, 1000)
    k22 = rng.uniform(0.5, 5.0, 1000)
    k12 = rng.uniform(-1.0, 1.0, 1000) * np.sqrt(k11 * k22)
    for name in ("relu", "erf"):
        for fn_p, fn_f in zip(DUALS[name][:2], DUALS_FAST[name][:2]):
            a = np.asarray(fn_p(k12, k11, k22))
            b = np.asarray(fn_f(k12, k11, k22))
            np.testing.assert_allclose(b, a, atol=1e-7, rtol=1e-6)
