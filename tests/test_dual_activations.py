"""Oracle tests for the dual-activation maps: Monte-Carlo Gaussian
expectations (independent of our formulas) + closed-form special cases."""

import numpy as np
import pytest

from nngp_tpu.ops import dual_activations as da


def _mc_dual(fn, k11, k12, k22, n=4_000_000, seed=0):
    """Monte-Carlo E[fn(u) fn(v)] for (u, v) ~ N(0, [[k11,k12],[k12,k22]])."""
    rng = np.random.default_rng(seed)
    cov = np.array([[k11, k12], [k12, k22]])
    l = np.linalg.cholesky(cov)
    z = rng.standard_normal((2, n))
    uv = l @ z
    return float(np.mean(fn(uv[0]) * fn(uv[1])))


@pytest.mark.parametrize("k11,k12,k22", [
    (1.0, 0.5, 1.0),
    (2.0, -0.3, 0.7),
    (1.0, 0.999, 1.0),
    (5.0, 2.0, 3.0),
])
def test_relu_nngp_matches_monte_carlo(k11, k12, k22):
    relu = lambda x: np.maximum(x, 0.0)
    mc = _mc_dual(relu, k11, k12, k22)
    got = float(da.relu_nngp(np.float64(k12), np.float64(k11), np.float64(k22)))
    assert abs(got - mc) < 5e-3 * max(1.0, abs(mc))


@pytest.mark.parametrize("k11,k12,k22", [
    (1.0, 0.5, 1.0),
    (2.0, -0.3, 0.7),
    (5.0, 2.0, 3.0),
])
def test_relu_ntk_mult_matches_monte_carlo(k11, k12, k22):
    step = lambda x: (x > 0).astype(np.float64)
    mc = _mc_dual(step, k11, k12, k22)
    got = float(da.relu_ntk_mult(np.float64(k12), np.float64(k11), np.float64(k22)))
    assert abs(got - mc) < 5e-3


@pytest.mark.parametrize("k11,k12,k22", [
    (1.0, 0.5, 1.0),
    (2.0, -0.3, 0.7),
    (0.5, 0.2, 0.8),
])
def test_erf_nngp_matches_monte_carlo(k11, k12, k22):
    from scipy import special
    mc = _mc_dual(special.erf, k11, k12, k22)
    got = float(da.erf_nngp(np.float64(k12), np.float64(k11), np.float64(k22)))
    assert abs(got - mc) < 5e-3


@pytest.mark.parametrize("k11,k12,k22", [
    (1.0, 0.5, 1.0),
    (0.5, 0.2, 0.8),
])
def test_erf_ntk_mult_matches_monte_carlo(k11, k12, k22):
    # erf'(x) = 2/sqrt(pi) exp(-x^2)
    dphi = lambda x: 2.0 / np.sqrt(np.pi) * np.exp(-x * x)
    mc = _mc_dual(dphi, k11, k12, k22)
    got = float(da.erf_ntk_mult(np.float64(k12), np.float64(k11), np.float64(k22)))
    assert abs(got - mc) < 5e-3


def test_relu_closed_form_special_cases():
    # Perfectly aligned: T(k,k,k) = k/2, Tdot = 1/2
    assert float(da.relu_nngp(3.0, 3.0, 3.0)) == pytest.approx(1.5, rel=1e-12)
    assert float(da.relu_ntk_mult(3.0, 3.0, 3.0)) == pytest.approx(0.5, rel=1e-12)
    assert float(da.relu_diag(np.float64(3.0))) == pytest.approx(1.5)
    # Orthogonal: theta = pi/2 -> T = sqrt(k11 k22)/(2 pi), Tdot = 1/4
    got = float(da.relu_nngp(0.0, 2.0, 8.0))
    assert got == pytest.approx(4.0 / (2.0 * np.pi), rel=1e-12)
    assert float(da.relu_ntk_mult(0.0, 1.0, 1.0)) == pytest.approx(0.25, rel=1e-12)
    # Anti-aligned: theta = pi -> T = 0, Tdot = 0
    assert float(da.relu_nngp(-1.0, 1.0, 1.0)) == pytest.approx(0.0, abs=1e-12)
    assert float(da.relu_ntk_mult(-1.0, 1.0, 1.0)) == pytest.approx(0.0, abs=1e-12)


def test_erf_diag_consistent_with_general_formula():
    k = np.float64(0.7)
    assert float(da.erf_diag(k)) == pytest.approx(float(da.erf_nngp(k, k, k)), rel=1e-12)


def test_relu_clipping_robust_to_fp32_overshoot():
    # k12 marginally above sqrt(k11*k22) from rounding must not produce NaN.
    k = np.float32(1.0000001)
    out = float(da.relu_nngp(k, np.float32(1.0), np.float32(1.0)))
    assert np.isfinite(out)
    assert out == pytest.approx(0.5, rel=1e-5)


@pytest.mark.parametrize("k11,k12,k22", [
    (1.0, 0.5, 1.0),
    (2.0, -0.3, 0.7),
    (0.5, 0.2, 0.8),
])
def test_sin_duals_match_monte_carlo(k11, k12, k22):
    mc = _mc_dual(np.sin, k11, k12, k22)
    got = float(da.sin_nngp(np.float64(k12), np.float64(k11), np.float64(k22)))
    assert abs(got - mc) < 5e-3
    mc_dot = _mc_dual(np.cos, k11, k12, k22)
    got_dot = float(da.sin_ntk_mult(np.float64(k12), np.float64(k11),
                                    np.float64(k22)))
    assert abs(got_dot - mc_dot) < 5e-3


def test_sin_dual_no_overflow_at_feature_scale():
    # [0,1000]-scaled features give covariances ~1e5: the stable form must
    # return 0 (fully decorrelated), not inf*0 = NaN.
    out = float(da.sin_nngp(np.float64(9e4), np.float64(1e5), np.float64(1e5)))
    assert np.isfinite(out)
    assert float(da.sin_diag(np.float64(1e5))) == pytest.approx(0.5)


@pytest.mark.parametrize("k11,k12,k22", [
    (1.0, 0.5, 1.0),
    (2.0, -0.3, 0.7),
    (5.0, 2.0, 3.0),
])
def test_abs_duals_match_monte_carlo(k11, k12, k22):
    mc = _mc_dual(np.abs, k11, k12, k22)
    got = float(da.abs_nngp(np.float64(k12), np.float64(k11), np.float64(k22)))
    assert abs(got - mc) < 5e-3 * max(1.0, abs(mc))
    mc_dot = _mc_dual(np.sign, k11, k12, k22)
    got_dot = float(da.abs_ntk_mult(np.float64(k12), np.float64(k11),
                                    np.float64(k22)))
    assert abs(got_dot - mc_dot) < 5e-3


def test_sin_abs_diag_consistency():
    k = np.float64(0.7)
    assert float(da.sin_diag(k)) == pytest.approx(
        float(da.sin_nngp(k, k, k)), rel=1e-12)
    assert float(da.abs_diag(k)) == pytest.approx(
        float(da.abs_nngp(k, k, k)), rel=1e-10)
    assert float(da.abs_ntk_mult_diag(k)) == pytest.approx(1.0)
    assert float(da.sin_ntk_mult_diag(k)) == pytest.approx(
        float(da.sin_ntk_mult(k, k, k)), rel=1e-12)


def test_new_activations_work_in_kernel_spec():
    """End-to-end: finite-width MC kernel of a sin / abs MLP must approach
    the closed-form NNGP (architecture grammar accepts the new names)."""
    import jax
    import jax.numpy as jnp
    from nngp_tpu.models.kernel_spec import KernelSpec, mlp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((6, 4)))
    for name in ("sin", "abs"):
        spec = KernelSpec(mlp(1, width=4096, activation=name))
        k = np.asarray(spec.kernel_fn(x, x, "nngp"))
        init, apply = spec.init_apply()
        outs = []
        for s in range(200):
            params = init(jax.random.PRNGKey(s), 4)
            outs.append(np.asarray(apply(params, x)).ravel())
        emp = np.cov(np.stack(outs, axis=1), bias=True) \
            + np.outer(np.mean(outs, 0), np.mean(outs, 0))
        scale = np.abs(k).max()
        assert np.abs(emp - k).max() < 0.2 * scale
