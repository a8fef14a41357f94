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
    the single-chip INCREMENTAL learner (top-k selection, same seed): both
    appends keep the fit-time ridge, so they agree to fp rounding (the
    full-refit learner re-derives the relative ridge each round and is the
    subject of test_active_incremental_tracks_full_refit instead)."""
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
    mesh_learner = ActiveLearner(spec, budget=16, active_iters=2,
                                 biased_sample=False, mesh=mesh)
    # the default is the INCREMENTAL distributed block-cyclic append
    assert mesh_learner.refit == "incremental"
    post_m, hist_m = mesh_learner.active_train(
        x_tr, y_tr, x_pool, y_pool, x_val, y_val, printer=None)

    dense_learner = ActiveLearner(spec, budget=16, active_iters=2,
                                  biased_sample=False, refit="incremental")
    post_d, hist_d = dense_learner.active_train(
        x_tr, y_tr, x_pool, y_pool, x_val, y_val, printer=None)

    assert [h["num_train"] for h in hist_m] == [h["num_train"] for h in hist_d]
    for hm, hd in zip(hist_m, hist_d):
        assert hm["val_mse"] == pytest.approx(hd["val_mse"], rel=1e-6)
    # the final posterior stays row-sharded (no replicated n x n factor)
    from nngp_tpu.parallel import DistributedPosterior
    assert isinstance(post_m, DistributedPosterior)


def test_active_learner_mesh_acquires_full_budget_at_ragged_sizes():
    """No quantum snapping: a budget that doesn't divide the mesh size is
    acquired IN FULL (the distributed layout pads with inert rows instead
    of shedding selections), and tracks the single-chip learner exactly."""
    from nngp_tpu.active import ActiveLearner

    rng = np.random.default_rng(5)
    x_tr = rng.uniform(0, 100, (33, 4))     # ragged everywhere: 33 % 8 != 0
    y_tr = rng.standard_normal((33, 1))
    x_pool = rng.uniform(0, 100, (40, 4))
    y_pool = rng.standard_normal((40, 1))
    x_val = rng.uniform(0, 100, (8, 4))
    y_val = rng.standard_normal((8, 1))

    mesh_learner = ActiveLearner(reference_kernel(), budget=21,
                                 active_iters=1, biased_sample=False,
                                 mesh=make_mesh(), dist_block_size=2)
    post_m, hist_m = mesh_learner.active_train(x_tr, y_tr, x_pool, y_pool,
                                               x_val, y_val, printer=None)
    assert hist_m[0]["num_train"] == 54     # full 21-point budget acquired
    assert post_m.num_train == 54

    dense = ActiveLearner(reference_kernel(), budget=21, active_iters=1,
                          biased_sample=False, refit="incremental")
    post_d, hist_d = dense.active_train(x_tr, y_tr, x_pool, y_pool,
                                        x_val, y_val, printer=None)
    assert hist_d[0]["num_train"] == 54
    assert hist_m[0]["val_mse"] == pytest.approx(hist_d[0]["val_mse"],
                                                 rel=1e-6)


@pytest.mark.parametrize("get", ["nngp", "ntk"])
def test_distributed_fit_ragged_n_matches_single_device(get):
    """Arbitrary n over the mesh: inert-row padding must be an exact no-op —
    alpha, mean, and std match the unpadded single-chip posterior."""
    spec = reference_kernel()
    mesh = make_mesh()
    x_tr, y_tr, x_te = _data(n=61, m=17, seed=11)   # 61 is prime: pads to 64

    dist = distributed_fit(spec, x_tr, y_tr, mesh, diag_reg=1e-3, get=get,
                           block_size=4)
    assert dist.num_train == 61
    assert dist.num_padded == 64
    post = fit_gp(spec, x_tr, y_tr, diag_reg=1e-3, get=get)
    np.testing.assert_allclose(np.asarray(dist.alpha_natural()),
                               np.asarray(post.alpha), rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(dist.y_natural()),
                               np.asarray(y_tr))

    mean_d, std_d = dist.predict_mean_std(x_te)
    mean, std = post.predict_mean_std(x_te)
    np.testing.assert_allclose(np.asarray(mean_d), np.asarray(mean),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(std_d), np.asarray(std),
                               rtol=1e-5, atol=1e-9)


@pytest.mark.parametrize("get", ["nngp", "ntk"])
@pytest.mark.parametrize("m_new", [11, 3])
def test_distributed_extend_matches_refit(get, m_new):
    """`DistributedPosterior.extend` (block-cyclic append) must equal a
    distributed refit on the concatenated set: alpha, mean, std, for both
    gets, at ragged sizes. m_new=3 stays inside the existing pad quantum
    (no storage growth); m_new=11 forces growth by a fresh quantum."""
    spec = reference_kernel()
    mesh = make_mesh()
    x_tr, y_tr, _ = _data(n=59, m=8, seed=13)     # pads 59 -> 64 (b=4, p=8)
    rng = np.random.default_rng(21)
    x_new = jnp.asarray(rng.uniform(0, 1000, (m_new, x_tr.shape[1])))
    y_new = jnp.asarray(rng.standard_normal((m_new, 1)))
    x_te = jnp.asarray(rng.uniform(0, 1000, (16, x_tr.shape[1])))

    post = distributed_fit(spec, x_tr, y_tr, mesh, diag_reg=1e-3, get=get,
                           block_size=4)
    ext = post.extend(x_new, y_new)
    assert ext.num_train == 59 + m_new
    if m_new == 3:
        assert ext.num_padded == post.num_padded     # reused pad slots
    else:
        assert ext.num_padded == 96                  # grew by whole quanta

    # oracle 1: single-chip posterior extended the dense way (same
    # fit-time-ridge semantics as GPPosterior.extend)
    dense = fit_gp(spec, x_tr, y_tr, diag_reg=1e-3, get=get)
    dense_ext = dense.extend(x_new, y_new)
    np.testing.assert_allclose(np.asarray(ext.alpha_natural()),
                               np.asarray(dense_ext.alpha),
                               rtol=1e-7, atol=1e-10)
    m_e, s_e = ext.predict_mean_std(x_te)
    m_d, s_d = dense_ext.predict_mean_std(x_te)
    np.testing.assert_allclose(np.asarray(m_e), np.asarray(m_d),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(s_e), np.asarray(s_d),
                               rtol=1e-5, atol=1e-9)

    # oracle 2: natural-order state round-trips (x/y of the merged set)
    np.testing.assert_allclose(
        np.asarray(ext.x_natural()),
        np.concatenate([np.asarray(x_tr), np.asarray(x_new)]))
    np.testing.assert_allclose(
        np.asarray(ext.y_natural()),
        np.concatenate([np.asarray(y_tr), np.asarray(y_new)]))

    # a second extension stacks on the first (pads keep cycling correctly)
    x2 = jnp.asarray(rng.uniform(0, 1000, (5, x_tr.shape[1])))
    y2 = jnp.asarray(rng.standard_normal((5, 1)))
    ext2 = ext.extend(x2, y2)
    dense2 = dense_ext.extend(x2, y2)
    m2, s2 = ext2.predict_mean_std(x_te)
    md2, sd2 = dense2.predict_mean_std(x_te)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(md2),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(sd2),
                               rtol=1e-5, atol=1e-9)


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
