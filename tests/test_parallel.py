"""Multi-device tests on the 8-way virtual CPU mesh (conftest forces
--xla_force_host_platform_device_count=8): sharded results must match the
single-device reference path exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nngp_tpu.gp import fit_gp
from nngp_tpu.models.kernel_spec import reference_kernel
from nngp_tpu.parallel import (
    distributed_fit,
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


def test_sharded_predict_ntk_matches_single_device():
    """Test-sharded serving with get='ntk' (factor + k_tt replicated)."""
    spec = reference_kernel()
    mesh = make_mesh()
    x_tr, y_tr, x_te = _data(n=48, m=16, seed=2)

    l, alpha, reg, k_tt = sharded_fit(spec, x_tr, y_tr, mesh, get="ntk")
    mean_s, std_s = sharded_predict_mean_std(
        spec, x_te, x_tr, l, alpha, mesh, get="ntk", k_tt=k_tt)

    post = fit_gp(spec, x_tr, y_tr, diag_reg=1e-3, get="ntk")
    mean, std = post.predict_mean_std(x_te)
    # NTK tolerance is sqrt(eps)-limited: the ReLU NTK dual's acos has
    # unbounded slope at rho=1, so on-diagonal Theta entries computed by
    # different-but-equivalent orderings differ by ~1e-8 even in fp64.
    np.testing.assert_allclose(np.asarray(mean_s), np.asarray(mean), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(std_s), np.asarray(std),
                               rtol=1e-5, atol=1e-9)


@pytest.mark.parametrize("get", ["nngp", "ntk"])
@pytest.mark.parametrize("block_size", [None, 4])
def test_distributed_fit_predict_matches_single_device(get, block_size):
    """Fully-sharded fit + serving (block-cyclic factor, train-row-sharded
    cross Gram) must match the single-device posterior for both gets."""
    spec = reference_kernel()
    mesh = make_mesh()
    x_tr, y_tr, x_te = _data(n=64, m=24, seed=3)

    dist = distributed_fit(spec, x_tr, y_tr, mesh, diag_reg=1e-3, get=get,
                           block_size=block_size)
    post = fit_gp(spec, x_tr, y_tr, diag_reg=1e-3, get=get)
    np.testing.assert_allclose(np.asarray(dist.alpha_natural()),
                               np.asarray(post.alpha), rtol=1e-7, atol=1e-10)

    mean_d, std_d = dist.predict_mean_std(x_te)
    mean, std = post.predict_mean_std(x_te)
    np.testing.assert_allclose(np.asarray(mean_d), np.asarray(mean),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(std_d), np.asarray(std),
                               rtol=1e-5, atol=1e-9)


def test_distributed_fit_under_jit_stays_sharded_at_scale():
    """n=2048 over the virtual mesh: (a) correct alpha, (b) the compiled
    per-device program's live memory stays ~n^2/p — i.e. the Gram/factor are
    genuinely sharded, never replicated (the >HBM escape-hatch claim)."""
    spec = reference_kernel()
    mesh = make_mesh()
    p = mesh.devices.size
    n, d = 2048, 16
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(0, 1000, (n, d)))
    y = jnp.asarray(rng.standard_normal((n, 1)))

    fn = jax.jit(lambda x, y: distributed_fit(
        spec, x, y, mesh, 1e-3, "nngp", block_size=64))
    compiled = fn.lower(x, y).compile()
    ma = compiled.memory_analysis()
    bytes_per_shard = n * n * 8 // p  # fp64 on the CPU test backend
    per_device = (ma.temp_size_in_bytes + ma.output_size_in_bytes
                  + ma.argument_size_in_bytes)
    # Replicated would be >= n^2 bytes of temps alone (8x the shard);
    # allow ~3.5 shards for K + L + solver temporaries.
    assert per_device < 3.5 * bytes_per_shard, (
        f"per-device {per_device} vs shard {bytes_per_shard}")

    dist = fn(x, y)
    post = fit_gp(spec, x, y, diag_reg=1e-3)
    np.testing.assert_allclose(np.asarray(dist.alpha_natural()),
                               np.asarray(post.alpha), rtol=1e-6, atol=1e-8)


def test_active_learner_over_mesh_matches_single_chip():
    """ActiveLearner(mesh=...) — the >HBM active-learning tier — must track
    the single-chip full-refit learner (top-k selection, same seed)."""
    from nngp_tpu.active import ActiveLearner

    rng = np.random.default_rng(3)
    d = 6
    x_tr = rng.uniform(0, 100, (32, d))
    y_tr = rng.standard_normal((32, 1))
    x_pool = rng.uniform(0, 100, (64, d))
    y_pool = rng.standard_normal((64, 1))
    x_val = rng.uniform(0, 100, (16, d))
    y_val = rng.standard_normal((16, 1))

    spec = reference_kernel()
    mesh = make_mesh()
    mesh_learner = ActiveLearner(spec, budget=16, active_iters=1,
                                 biased_sample=False, mesh=mesh)
    assert mesh_learner.refit == "full"
    post_m, hist_m = mesh_learner.active_train(
        x_tr, y_tr, x_pool, y_pool, x_val, y_val, printer=None)

    dense_learner = ActiveLearner(spec, budget=16, active_iters=1,
                                  biased_sample=False, refit="full")
    post_d, hist_d = dense_learner.active_train(
        x_tr, y_tr, x_pool, y_pool, x_val, y_val, printer=None)

    assert [h["num_train"] for h in hist_m] == [h["num_train"] for h in hist_d]
    for hm, hd in zip(hist_m, hist_d):
        assert hm["val_mse"] == pytest.approx(hd["val_mse"], rel=1e-6)
    # the final posterior stays row-sharded (no replicated n x n factor)
    from nngp_tpu.parallel import DistributedPosterior
    assert isinstance(post_m, DistributedPosterior)

    with pytest.raises(ValueError):
        ActiveLearner(spec, mesh=mesh, refit="incremental")


def test_active_learner_mesh_empty_selection_is_safe():
    """Budget below the mesh quantum snaps to an EMPTY selection and the
    loop stops — regression for argsort(std)[-0:] grabbing the whole pool."""
    from nngp_tpu.active import ActiveLearner

    rng = np.random.default_rng(4)
    x_tr = rng.uniform(0, 100, (16, 4))
    y_tr = rng.standard_normal((16, 1))
    x_pool = rng.uniform(0, 100, (24, 4))
    y_pool = rng.standard_normal((24, 1))
    x_val = rng.uniform(0, 100, (8, 4))
    y_val = rng.standard_normal((8, 1))

    learner = ActiveLearner(reference_kernel(), budget=4, active_iters=2,
                            biased_sample=False, mesh=make_mesh())
    post, hist = learner.active_train(x_tr, y_tr, x_pool, y_pool,
                                      x_val, y_val, printer=None)
    assert hist == []                      # nothing acquirable under p=8
    assert post.num_train == 16


def test_active_learner_mesh_respects_block_size_quantum():
    """With an explicit dist_block_size, selections stay multiples of
    p * block_size so every refit keeps a valid cyclic layout."""
    from nngp_tpu.active import ActiveLearner

    rng = np.random.default_rng(5)
    x_tr = rng.uniform(0, 100, (32, 4))     # 32 = p*b*2 with p=8, b=2
    y_tr = rng.standard_normal((32, 1))
    x_pool = rng.uniform(0, 100, (40, 4))
    y_pool = rng.standard_normal((40, 1))
    x_val = rng.uniform(0, 100, (8, 4))
    y_val = rng.standard_normal((8, 1))

    learner = ActiveLearner(reference_kernel(), budget=20, active_iters=1,
                            biased_sample=False, mesh=make_mesh(),
                            dist_block_size=2)
    post, hist = learner.active_train(x_tr, y_tr, x_pool, y_pool,
                                      x_val, y_val, printer=None)
    # 20 snapped down to 16 (= p*b): layout stays factorizable
    assert hist[0]["num_train"] == 48


@pytest.mark.parametrize("get", ["nngp", "ntk"])
def test_distributed_chunked_predict_matches_direct(get):
    x_tr, y_tr, x_te = _data(n=64, m=40)
    mesh = make_mesh()
    from nngp_tpu.parallel import distributed_fit
    post = distributed_fit(reference_kernel(), x_tr, y_tr, mesh, get=get)
    m_d, s_d = post.predict_mean_std(jnp.asarray(x_te))
    m_c, s_c = post.predict_mean_std_chunked(np.asarray(x_te), chunk=16)
    np.testing.assert_allclose(m_c.ravel(), np.asarray(m_d).ravel(),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(s_c, np.asarray(s_d), rtol=1e-8, atol=1e-10)
