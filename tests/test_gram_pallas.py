"""Fused Pallas Gram kernel vs the XLA path (interpret mode on CPU; the
real-hardware comparison is in BASELINE.md)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nngp_tpu.models.kernel_spec import KernelSpec, mlp, reference_kernel
from nngp_tpu.ops.gram_pallas import gram_pallas


def _x(n, d=10, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0, 1000, (n, d)), dtype=jnp.float32)


def test_symmetric_gram_matches_xla():
    spec = reference_kernel()
    x = _x(40)
    k_p = np.asarray(gram_pallas(spec, x, tile_m=16, tile_n=16))
    k_x = np.asarray(spec.kernel_fn(x, x, "nngp"))
    np.testing.assert_allclose(k_p, k_x, rtol=2e-5, atol=1e-3)
    # symmetry is exact by construction (mirrored lower triangle)
    np.testing.assert_array_equal(k_p, k_p.T)


def test_cross_gram_and_ntk_match_xla():
    spec = KernelSpec(mlp(2, activation="erf"))
    x1, x2 = _x(24, seed=1), _x(40, seed=2)
    c_p = np.asarray(gram_pallas(spec, x1, x2, symmetric=False,
                                 tile_m=8, tile_n=16))
    c_x = np.asarray(spec.kernel_fn(x1, x2, "nngp"))
    np.testing.assert_allclose(c_p, c_x, rtol=2e-5, atol=1e-3)

    t_p = np.asarray(gram_pallas(spec, x1, x2, get="ntk", symmetric=False,
                                 tile_m=8, tile_n=16))
    t_x = np.asarray(spec.kernel_fn(x1, x2, "ntk"))
    np.testing.assert_allclose(t_p, t_x, rtol=2e-5, atol=1e-3)


def test_unaligned_shapes_are_padded_and_sliced():
    spec = reference_kernel()
    x1, x2 = _x(13, d=7, seed=3), _x(29, d=7, seed=4)
    c_p = gram_pallas(spec, x1, x2, symmetric=False, tile_m=8, tile_n=16)
    assert c_p.shape == (13, 29)
    c_x = np.asarray(spec.kernel_fn(x1, x2, "nngp"))
    np.testing.assert_allclose(np.asarray(c_p), c_x, rtol=2e-5, atol=1e-3)


def test_precise_math_mode():
    spec = reference_kernel()
    x = _x(16, seed=5)
    k_fast = np.asarray(gram_pallas(spec, x, tile_m=8, tile_n=8,
                                    fast_math=True))
    k_precise = np.asarray(gram_pallas(spec, x, tile_m=8, tile_n=8,
                                       fast_math=False))
    k_x = np.asarray(spec.kernel_fn(x, x, "nngp"))
    np.testing.assert_allclose(k_fast, k_x, rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(k_precise, k_x, rtol=2e-5, atol=1e-3)


def test_lower_mode_and_fused_ridge():
    """mirror='lower' leaves correct lower triangle + diagonal (upper tiles
    unwritten); the diagonal comes from the exact O(n) recursion with
    diag_add fused onto the solve kernel only."""
    from nngp_tpu.models.kernel_spec import apply_diag_recursion
    from nngp_tpu.ops.gram import input_diag

    spec = reference_kernel()
    x = _x(40, seed=6)
    reg = 0.125
    dn, dt = apply_diag_recursion(input_diag(x), spec.layers)
    il = np.tril_indices(40, k=-1)  # strict lower: diag checked separately
    idx = np.arange(40)

    k_low = np.asarray(gram_pallas(spec, x, tile_m=16, tile_n=16,
                                   mirror="lower", diag_add=reg))
    k_x = np.asarray(spec.kernel_fn(x, x, "nngp"))
    np.testing.assert_allclose(k_low[il], k_x[il], rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(k_low[idx, idx], np.asarray(dn) + reg,
                               rtol=1e-5)

    # ntk pair: ridge must land on Theta only; nngp stays clean
    k_pair, t_pair = gram_pallas(spec, x, get=("nngp", "ntk"),
                                 tile_m=16, tile_n=16, mirror="lower",
                                 diag_add=reg)
    t_x = np.asarray(spec.kernel_fn(x, x, "ntk"))
    np.testing.assert_allclose(np.asarray(t_pair)[il], t_x[il],
                               rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(t_pair)[idx, idx],
                               np.asarray(dt) + reg, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(k_pair)[il], k_x[il],
                               rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(k_pair)[idx, idx], np.asarray(dn),
                               rtol=1e-5)
