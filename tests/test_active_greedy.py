"""Batch-diverse greedy conditional-variance acquisition (active/greedy.py).

Oracle: the GP posterior covariance does not depend on y, so the fantasy
Schur update must match ACTUALLY extending the posterior with the selected
point (GPPosterior.extend keeps the fit-time ridge, exactly the greedy
noise term). fp64 CPU throughout (conftest forces both)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nngp_tpu.active import ActiveLearner, greedy_variance_select
from nngp_tpu.gp import fit_gp
from nngp_tpu.models.kernel_spec import KernelSpec, mlp


def _problem(n=24, p=12, d=5, seed=0):
    rng = np.random.default_rng(seed)
    x_tr = rng.uniform(0.0, 1000.0, (n, d))
    y_tr = rng.normal(size=(n, 1))
    x_pool = rng.uniform(0.0, 1000.0, (p, d))
    return x_tr, y_tr, x_pool


def test_single_fantasy_update_matches_extend():
    """Conditioning the pool covariance on one fantasy observation (Schur
    update with noise = fit ridge) equals the covariance of the posterior
    actually extended with that point (any y — covariance ignores it)."""
    spec = KernelSpec(mlp(1))
    x_tr, y_tr, x_pool = _problem()
    post = fit_gp(spec, x_tr, y_tr, diag_reg=1e-3)
    _, cov = post.predict(jnp.asarray(x_pool), compute_cov=True)
    cov = np.asarray(cov)
    s = int(np.argmax(np.diag(cov)))
    c = cov[:, s]
    fantasy = cov - np.outer(c, c) / (cov[s, s] + float(post.reg))

    ext = post.extend(jnp.asarray(x_pool[s:s + 1]), jnp.zeros((1, 1)))
    _, cov_ext = ext.predict(jnp.asarray(x_pool), compute_cov=True)
    np.testing.assert_allclose(fantasy, np.asarray(cov_ext),
                               rtol=1e-8, atol=1e-10)


def test_greedy_matches_brute_force_extend_loop():
    """greedy_variance_select's pivot sequence equals the brute-force loop
    that re-extends the posterior and re-predicts the pool each step."""
    spec = KernelSpec(mlp(1))
    x_tr, y_tr, x_pool = _problem(seed=3)
    post = fit_gp(spec, x_tr, y_tr, diag_reg=1e-3)
    k = 5

    _, cov = post.predict(jnp.asarray(x_pool), compute_cov=True)
    sel = np.asarray(greedy_variance_select(cov, k, noise=post.reg))

    brute, cur = [], post
    for _ in range(k):
        _, c = cur.predict(jnp.asarray(x_pool), compute_cov=True)
        var = np.diag(np.asarray(c)).copy()
        var[brute] = -np.inf
        s = int(np.argmax(var))
        brute.append(s)
        cur = cur.extend(jnp.asarray(x_pool[s:s + 1]), jnp.zeros((1, 1)))
    assert sel.tolist() == brute


def test_greedy_basic_properties():
    rng = np.random.default_rng(7)
    a = rng.normal(size=(20, 20))
    cov = a @ a.T
    sel = np.asarray(greedy_variance_select(jnp.asarray(cov), 8))
    assert len(set(sel.tolist())) == 8
    assert sel[0] == int(np.argmax(np.diag(cov)))
    with pytest.raises(ValueError, match="pool"):
        greedy_variance_select(jnp.asarray(cov), 21)


def test_greedy_suppresses_duplicates():
    """A pool containing an exact duplicate of the max-variance point: topk
    picks both copies, greedy with fantasy conditioning does not pick the
    duplicate second."""
    spec = KernelSpec(mlp(1))
    x_tr, y_tr, x_pool = _problem(p=10, seed=11)
    post = fit_gp(spec, x_tr, y_tr, diag_reg=1e-3)
    _, var = post.predict(jnp.asarray(x_pool), compute_cov="diag")
    top = int(np.argmax(np.asarray(var)))
    x_dup = np.vstack([x_pool, x_pool[top:top + 1]])  # duplicate at index 10
    _, cov = post.predict(jnp.asarray(x_dup), compute_cov=True)
    sel = np.asarray(greedy_variance_select(cov, 2, noise=post.reg))
    assert {top, 10} != set(sel.tolist())
    # while independent top-2 scoring picks exactly the pair
    topk = np.argsort(np.diag(np.asarray(cov)))[-2:]
    assert {top, 10} == set(topk.tolist())


def test_learner_greedy_end_to_end():
    spec = KernelSpec(mlp(1))
    rng = np.random.default_rng(5)
    x = rng.uniform(0.0, 1000.0, (80, 4))
    y = rng.normal(size=(80, 1))
    learner = ActiveLearner(spec, budget=6, active_iters=2,
                            selection="greedy", refit="incremental")
    post, history = learner.active_train(
        x[:30], y[:30], x[30:60], y[30:60], x[60:], y[60:], printer=None)
    assert len(history) == 2
    assert post.num_train == 30 + 2 * 6
    assert all(np.isfinite(h["val_mse"]) for h in history)


def test_learner_greedy_preselect_cap():
    """Pools beyond GREEDY_POOL_MAX are pre-filtered to the top-variance
    slice; returned indices address the ORIGINAL pool and equal greedy run
    directly on that slice."""
    spec = KernelSpec(mlp(1))
    x_tr, y_tr, _ = _problem(n=30, seed=9)
    rng = np.random.default_rng(10)
    x_pool = rng.uniform(0.0, 1000.0, (40, 5))
    post = fit_gp(spec, x_tr, y_tr, diag_reg=1e-3)

    learner = ActiveLearner(spec, budget=4, selection="greedy")
    learner.GREEDY_POOL_MAX = 16
    sel = np.asarray(learner.select(post, jnp.asarray(x_pool)))
    assert len(set(sel.tolist())) == 4 and sel.min() >= 0 and sel.max() < 40

    _, std = post.predict_mean_std(jnp.asarray(x_pool))
    pre = np.argsort(np.asarray(std))[-16:]
    _, cov = post.predict(jnp.asarray(x_pool[pre]), compute_cov=True)
    expect = pre[np.asarray(greedy_variance_select(cov, 4, noise=post.reg))]
    np.testing.assert_array_equal(sel, expect)


def test_greedy_nystrom_tier():
    """The DTC/Nystrom posterior exposes the same full-covariance predict;
    greedy selection works on that tier too."""
    from nngp_tpu.gp import fit_nystrom
    spec = KernelSpec(mlp(1))
    x_tr, y_tr, x_pool = _problem(n=60, p=15, seed=13)
    post = fit_nystrom(spec, x_tr, y_tr, num_inducing=20, diag_reg=1e-3)
    learner = ActiveLearner(spec, budget=5, selection="greedy", nystrom_m=20)
    sel = np.asarray(learner.select(post, jnp.asarray(x_pool)))
    assert len(set(sel.tolist())) == 5
    _, cov = post.predict(jnp.asarray(x_pool), compute_cov=True)
    assert sel[0] == int(np.argmax(np.diag(np.asarray(cov))))


@pytest.mark.parametrize("get", ["nngp", "ntk"])
def test_distributed_predict_full_cov_matches_single_chip(get):
    """DistributedPosterior.predict(compute_cov=True) assembles the pool
    covariance from sharded contractions — must match the single-chip
    posterior (ragged n exercises the inert-padding masks)."""
    from nngp_tpu.parallel import distributed_fit, make_mesh
    spec = KernelSpec(mlp(1))
    x_tr, y_tr, x_pool = _problem(n=37, p=9, seed=19)
    ref = fit_gp(spec, x_tr, y_tr, diag_reg=1e-3, get=get)
    dist = distributed_fit(spec, x_tr, y_tr, make_mesh(), diag_reg=1e-3,
                           get=get)
    m0, c0 = ref.predict(jnp.asarray(x_pool), compute_cov=True)
    m1, c1 = dist.predict(jnp.asarray(x_pool), compute_cov=True)
    # solve orderings differ (block-cyclic vs dense); the mixed NTK
    # covariance cancels to ~1e-9 of its own scale
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                               rtol=1e-6, atol=1e-6)
    scale = float(np.abs(np.asarray(c0)).max())
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0),
                               rtol=1e-5, atol=1e-7 * max(scale, 1.0))
    m_only = dist.predict(jnp.asarray(x_pool), compute_cov=False)
    np.testing.assert_allclose(np.asarray(m_only), np.asarray(m1))


def test_greedy_on_rowsharded_mesh_matches_single_chip():
    """Greedy acquisition runs on the distributed exact tier and selects
    the same batch as the single-chip posterior on the same data."""
    from nngp_tpu.parallel import distributed_fit, make_mesh
    spec = KernelSpec(mlp(1))
    x_tr, y_tr, x_pool = _problem(n=37, p=14, seed=23)
    learner = ActiveLearner(spec, budget=5, selection="greedy")
    ref = fit_gp(spec, x_tr, y_tr, diag_reg=1e-3)
    dist = distributed_fit(spec, x_tr, y_tr, make_mesh(), diag_reg=1e-3)
    sel_ref = np.asarray(learner.select(ref, jnp.asarray(x_pool)))
    sel_dist = np.asarray(learner.select(dist, jnp.asarray(x_pool)))
    np.testing.assert_array_equal(sel_dist, sel_ref)


def test_selection_argument_validation():
    spec = KernelSpec(mlp(1))
    with pytest.raises(ValueError, match="selection"):
        ActiveLearner(spec, selection="entropy")
    assert ActiveLearner(spec, biased_sample=True).selection == "biased"
    assert ActiveLearner(spec, biased_sample=False).selection == "topk"


def test_greedy_huge_input_scale_fp32():
    """Greedy selection works at the 2^64 packed-categorical prescale in
    fp32: selection happens in SCALED units (raw-unit covariance
    compensation would be scale^2 = 2^128 = inf in fp32) and must match
    the scale-free selection on the same data."""
    spec = KernelSpec(mlp(1))
    x_tr, y_tr, x_pool = _problem(n=30, p=12, seed=17)
    learner = ActiveLearner(spec, budget=4, selection="greedy")

    ref_post = fit_gp(spec, jnp.asarray(x_tr, jnp.float32),
                      jnp.asarray(y_tr, jnp.float32), diag_reg=1e-3,
                      input_scale=1.0)
    ref_sel = np.asarray(learner.select(ref_post,
                                        jnp.asarray(x_pool, jnp.float32)))

    s = 2.0 ** 64
    big_post = fit_gp(spec, jnp.asarray(x_tr * s, jnp.float32),
                      jnp.asarray(y_tr, jnp.float32), diag_reg=1e-3,
                      input_scale=s)
    big_sel = np.asarray(learner.select(big_post,
                                        jnp.asarray(x_pool * s,
                                                    jnp.float32)))
    assert len(set(big_sel.tolist())) == 4
    np.testing.assert_array_equal(np.sort(big_sel), np.sort(ref_sel))


def test_greedy_degenerate_pivot_is_noop():
    """Past the numerical rank with noise=0.0 the Schur denominator can be
    <= 0: the update must be a NO-OP (zero scale), not a divide-by-tiny
    that explodes the covariance to inf and corrupts later selections."""
    v = np.arange(1.0, 7.0, dtype=np.float32)[:, None]
    cov = (v @ v.T - 3e-6 * np.eye(6)).astype(np.float32)  # rank ~1
    sel = np.asarray(greedy_variance_select(jnp.asarray(cov), 4, noise=0.0))
    assert len(set(sel.tolist())) == 4
    assert sel.min() >= 0 and sel.max() < 6
    assert sel[0] == 5  # largest diagonal first


def test_greedy_num_valid_padding_matches_unpadded():
    """Zero-padding the pool to a bucket with num_valid masking selects
    exactly what the unpadded program selects (pads never chosen)."""
    rng = np.random.default_rng(31)
    a = rng.normal(size=(20, 20))
    cov = a @ a.T
    ref = np.asarray(greedy_variance_select(jnp.asarray(cov), 6, noise=0.5))
    pad = np.zeros((32, 32))
    pad[:20, :20] = cov
    pad[20:, 20:] = np.eye(12) * 1e6     # huge pad variance: must be masked
    got = np.asarray(greedy_variance_select(jnp.asarray(pad), 6, noise=0.5,
                                            num_valid=20))
    np.testing.assert_array_equal(got, ref)


def test_greedy_budget_consumes_filtered_pool_shortcircuit():
    """When the budget covers the whole (possibly pre-filtered) pool the
    selection is returned directly — no covariance program is built."""
    spec = KernelSpec(mlp(1))
    x_tr, y_tr, x_pool = _problem(n=24, p=8, seed=29)
    post = fit_gp(spec, x_tr, y_tr, diag_reg=1e-3)
    learner = ActiveLearner(spec, budget=8, selection="greedy")
    sel = np.asarray(learner.select(post, jnp.asarray(x_pool)))
    assert sorted(sel.tolist()) == list(range(8))


def test_greedy_prefilter_has_headroom():
    """The pre-filter keeps 2x the budget so conditioning can actually
    reject near-duplicates instead of being forced to take the slice."""
    spec = KernelSpec(mlp(1))
    learner = ActiveLearner(spec, budget=4096, selection="greedy")
    x_tr, y_tr, _ = _problem(n=20, seed=41)
    post = fit_gp(spec, x_tr, y_tr, diag_reg=1e-3)
    # monkey-check via the cap computation path: budget > GREEDY_POOL_MAX
    cap = max(learner.GREEDY_POOL_MAX, 2 * 4096)
    assert cap == 8192


def test_nystrom_grow_incompatible_modes_raise():
    from nngp_tpu.active import ActiveLearner as AL
    spec = KernelSpec(mlp(1))
    with pytest.raises(ValueError, match="refit"):
        AL(spec, nystrom_m=32, nystrom_grow=8, refit="full")
    with pytest.raises(ValueError, match="relearn"):
        AL(spec, nystrom_m=32, nystrom_grow=8, relearn_hyper=True)
