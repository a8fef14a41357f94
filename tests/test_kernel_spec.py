"""Kernel-composition tests: finite-width Monte-Carlo networks as the oracle
for the full serial recursion (validates every scaling convention at once),
plus structural identities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nngp_tpu.models.kernel_spec import (
    Dense,
    Erf,
    KernelSpec,
    Relu,
    mlp,
    reference_kernel,
)


def _finite_width_cov(spec, x, width, n_samples, seed=0):
    """Empirical output covariance over random finite-width networks."""
    # Replace hidden widths with `width` for concentration.
    layers = tuple(
        Dense(width, l.w_std, l.b_std) if isinstance(l, Dense) and l is not spec.layers[-1]
        else l
        for l in spec.layers
    )
    wide = KernelSpec(layers)
    init, apply = wide.init_apply()
    keys = jax.random.split(jax.random.PRNGKey(seed), n_samples)

    def one(key):
        params = init(key, x.shape[-1])
        return apply(params, x)[:, 0]  # (n,)

    # Batch to bound memory (n_samples x width x width weights otherwise).
    outs = jax.lax.map(jax.vmap(one), keys.reshape(-1, 50, 2)).reshape(n_samples, -1)
    return np.asarray(outs.T @ outs / n_samples)


@pytest.mark.parametrize("spec_layers", [
    (Dense(512), Relu(), Dense(1)),               # the reference architecture
    (Dense(256), Erf(), Dense(1)),
    (Dense(128), Relu(), Dense(128), Relu(), Dense(1)),
])
def test_nngp_matches_finite_width_monte_carlo(spec_layers):
    spec = KernelSpec(spec_layers)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 6)))
    k_analytic = np.asarray(spec.kernel_fn(x, x, "nngp"))
    k_mc = _finite_width_cov(spec, x, width=1024, n_samples=4000)
    scale = np.mean(np.abs(np.diag(k_analytic)))
    # MC std of each entry ~ scale * sqrt(2/4000) ~= 0.022 * scale; 4 sigma.
    assert np.max(np.abs(k_analytic - k_mc)) < 0.09 * scale


def test_reference_architecture_closed_form():
    """Dense(512)->Relu->Dense(1) with w_std=1, no bias:
    nngp = T_relu(x.x'/d); ntk = nngp + (x.x'/d) * Tdot_relu."""
    spec = reference_kernel()
    rng = np.random.default_rng(2)
    x1 = rng.standard_normal((5, 8))
    x2 = rng.standard_normal((3, 8))
    k0 = x1 @ x2.T / 8
    d1 = np.sum(x1 * x1, axis=1) / 8
    d2 = np.sum(x2 * x2, axis=1) / 8
    sq = np.sqrt(np.outer(d1, d2))
    cos = np.clip(k0 / sq, -1, 1)
    theta = np.arccos(cos)
    t = sq * (np.sin(theta) + (np.pi - theta) * cos) / (2 * np.pi)
    tdot = (np.pi - theta) / (2 * np.pi)

    nngp, ntk = spec.kernel_fn(jnp.asarray(x1), jnp.asarray(x2), ("nngp", "ntk"))
    np.testing.assert_allclose(np.asarray(nngp), t, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(ntk), t + k0 * tdot, rtol=1e-10)


def test_diag_fn_matches_kernel_diagonal():
    for layers in [mlp(1), mlp(3, activation="erf"), mlp(2, w_std=1.5, b_std=0.1)]:
        spec = KernelSpec(layers)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((7, 5)))
        # The full-matrix path evaluates sqrt(1 - cos^2) at cos ~= 1 on the
        # diagonal (~1e-8 noise in fp64); diag_fn uses the exact scalar maps.
        full = np.diag(np.asarray(spec.kernel_fn(x, x, "nngp")))
        diag = np.asarray(spec.diag_fn(x, "nngp"))
        np.testing.assert_allclose(diag, full, rtol=1e-7)
        full_ntk = np.diag(np.asarray(spec.kernel_fn(x, x, "ntk")))
        diag_ntk = np.asarray(spec.diag_fn(x, "ntk"))
        np.testing.assert_allclose(diag_ntk, full_ntk, rtol=1e-7)


def test_kernel_symmetry_and_dtype():
    spec = reference_kernel()
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((6, 4)))
    k = np.asarray(spec.kernel_fn(x, x, "nngp"))
    np.testing.assert_allclose(k, k.T, rtol=1e-12)
    x32 = x.astype(jnp.float32)
    k32 = spec.kernel_fn(x32, x32, "nngp")
    assert k32.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(k32), k, rtol=2e-5, atol=1e-6)


def test_bias_and_wstd_propagation():
    """With b_std>0 the kernel must shift; check against direct recursion."""
    spec = KernelSpec((Dense(512, w_std=1.5, b_std=0.05), Relu(),
                       Dense(1, w_std=1.5, b_std=0.05)))
    x = jnp.asarray(np.eye(3) * 2.0)
    k = np.asarray(spec.kernel_fn(x, x, "nngp"))
    # hand recursion
    k0 = np.asarray(x @ x.T) / 3
    w2, b2 = 1.5 ** 2, 0.05 ** 2
    k1 = w2 * k0 + b2
    d1 = np.diag(k1)
    sq = np.sqrt(np.outer(d1, d1))
    cos = np.clip(k1 / sq, -1, 1)
    theta = np.arccos(cos)
    t = sq * (np.sin(theta) + (np.pi - theta) * cos) / (2 * np.pi)
    expect = w2 * t + b2
    np.testing.assert_allclose(k, expect, rtol=1e-10)
