"""Multi-device tests on the 8-way virtual CPU mesh (conftest forces
--xla_force_host_platform_device_count=8): sharded results must match the
single-device reference path exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from nngp_tpu.gp import fit_gp
from nngp_tpu.models.kernel_spec import reference_kernel
from nngp_tpu.parallel import (
    make_mesh,
    sharded_fit,
    sharded_gram,
    sharded_predict_mean_std,
)


def _data(n=64, m=24, d=10, seed=0):
    rng = np.random.default_rng(seed)
    x_tr = jnp.asarray(rng.uniform(0, 1000, (n, d)))
    y_tr = jnp.asarray(rng.standard_normal((n, 1)))
    x_te = jnp.asarray(rng.uniform(0, 1000, (m, d)))
    return x_tr, y_tr, x_te


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_gram_matches_dense():
    spec = reference_kernel()
    mesh = make_mesh()
    x_tr, _, _ = _data()
    k_sharded = sharded_gram(spec, x_tr, mesh, "nngp")
    k_dense = spec.kernel_fn(x_tr, x_tr, "nngp")
    np.testing.assert_allclose(np.asarray(k_sharded), np.asarray(k_dense),
                               rtol=1e-8)
    t_sharded = sharded_gram(spec, x_tr, mesh, "ntk")
    t_dense = spec.kernel_fn(x_tr, x_tr, "ntk")
    np.testing.assert_allclose(np.asarray(t_sharded), np.asarray(t_dense),
                               rtol=1e-8)


def test_sharded_fit_predict_matches_single_device():
    spec = reference_kernel()
    mesh = make_mesh()
    x_tr, y_tr, x_te = _data()

    l, alpha, reg = sharded_fit(spec, x_tr, y_tr, mesh)
    mean_s, std_s = sharded_predict_mean_std(spec, x_te, x_tr, l, alpha, mesh)

    post = fit_gp(spec, x_tr, y_tr, diag_reg=1e-3, get="nngp")
    mean, std = post.predict_mean_std(x_te)

    np.testing.assert_allclose(np.asarray(mean_s), np.asarray(mean), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(std_s), np.asarray(std),
                               rtol=1e-6, atol=1e-10)


def test_sharded_fit_under_jit():
    """The full training step must compile as ONE jitted program over the
    mesh (this is what the driver's dryrun_multichip exercises)."""
    spec = reference_kernel()
    mesh = make_mesh()
    x_tr, y_tr, x_te = _data(n=40, m=16)

    step = jax.jit(lambda x, y: sharded_fit(spec, x, y, mesh))
    l, alpha, reg = step(x_tr, y_tr)
    post = fit_gp(spec, x_tr, y_tr)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(post.alpha),
                               rtol=1e-7)
