"""Nystrom/DTC approximate posterior (`gp/nystrom.py`).

Anchor: with the inducing set = the full train set the construction is
algebraically the exact posterior, so it must match `fit_gp` (both gets) to
jitter-level tolerance. Below that, approximation sanity, exact online
extend, prescale compensation, and ridge semantics.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nngp_tpu.gp import fit_gp
from nngp_tpu.gp.nystrom import fit_nystrom, select_inducing
from nngp_tpu.models.kernel_spec import KernelSpec, Dense, Relu, mlp, \
    reference_kernel


def _data(n=96, d=6, m_test=24, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, scale, (n, d)).astype(np.float64)
    y = np.sin(x.sum(axis=1))[:, None] + 0.1 * rng.standard_normal((n, 1))
    xt = rng.uniform(0, scale, (m_test, d)).astype(np.float64)
    return x, y, xt


@pytest.mark.parametrize("get", ["nngp", "ntk"])
def test_full_inducing_recovers_exact_posterior(get):
    x, y, xt = _data()
    spec = reference_kernel()
    exact = fit_gp(spec, x, y, get=get)
    approx = fit_nystrom(spec, x, y, num_inducing=x.shape[0], get=get,
                         rank_rtol=1e-14, panel_size=37)
    m0, s0 = exact.predict_mean_std(jnp.asarray(xt))
    m1, s1 = approx.predict_mean_std(jnp.asarray(xt))
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("get", ["nngp", "ntk"])
def test_full_cov_matches_exact(get):
    x, y, xt = _data(n=60, m_test=10)
    spec = reference_kernel()
    exact = fit_gp(spec, x, y, get=get)
    approx = fit_nystrom(spec, x, y, num_inducing=x.shape[0], get=get,
                         rank_rtol=1e-14)
    _, c0 = exact.predict(jnp.asarray(xt), compute_cov=True)
    _, c1 = approx.predict(jnp.asarray(xt), compute_cov=True)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0),
                               rtol=1e-5, atol=1e-8)
    # mean-only path
    m_only = approx.predict(jnp.asarray(xt), compute_cov=False)
    m_full, _ = approx.predict(jnp.asarray(xt))
    np.testing.assert_allclose(np.asarray(m_only), np.asarray(m_full))


def test_approximation_improves_with_m():
    x, y, xt = _data(n=240, m_test=40, seed=3)
    spec = reference_kernel()
    exact = fit_gp(spec, x, y)
    m_ref, _ = exact.predict_mean_std(jnp.asarray(xt))
    errs = []
    for m in (20, 80, 240):
        post = fit_nystrom(spec, x, y, num_inducing=m, rank_rtol=1e-14)
        m_a, s_a = post.predict_mean_std(jnp.asarray(xt))
        assert np.all(np.isfinite(np.asarray(m_a)))
        assert np.all(np.asarray(s_a) >= 0)
        errs.append(float(np.max(np.abs(np.asarray(m_a) - np.asarray(m_ref)))))
    assert errs[2] < errs[0]
    assert errs[2] < 1e-5          # m = n: exact


@pytest.mark.parametrize("get", ["nngp", "ntk"])
def test_extend_equals_refit_same_inducing(get):
    """Moments are sums over rows, so extend == refit with the same
    inducing set and ridge — exactly."""
    x, y, _ = _data(n=120, seed=5)
    x2, y2, xt = _data(n=32, seed=6)
    spec = KernelSpec(mlp(depth=2))
    base = fit_nystrom(spec, x, y, num_inducing=48, get=get, seed=9,
                       diag_reg=1e-3, diag_reg_absolute_scale=True)
    ext = base.extend(x2, y2)
    assert ext.num_train == 152

    # "refit" with the SAME inducing rows: base's set indexes rows < 120,
    # which are unchanged in the concatenated array
    idx = select_inducing(120, 48, seed=9)
    xa = np.concatenate([x, x2])
    ya = np.concatenate([y, y2])
    from nngp_tpu.gp import nystrom as nmod
    x_m = xa[idx]
    np.testing.assert_allclose(np.asarray(base.x_m), x_m)  # inducing fixed
    c, b, m1, dsum, _yty = nmod._stream_moments(
        spec, get, "highest", base.x_m, base.w_solve, base.w_kmm, xa, ya, 64)
    np.testing.assert_allclose(np.asarray(ext.c_raw), np.asarray(c),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ext.b_w), np.asarray(b),
                               rtol=1e-10, atol=1e-10)
    if get == "ntk":
        np.testing.assert_allclose(np.asarray(ext.m1_w), np.asarray(m1),
                                   rtol=1e-10, atol=1e-10)
    me, se = ext.predict_mean_std(jnp.asarray(xt))
    assert np.all(np.isfinite(np.asarray(me)))
    assert np.all(np.isfinite(np.asarray(se)))


@pytest.mark.parametrize("get", ["nngp", "ntk"])
def test_forget_inverts_extend(get):
    """Decremental learning: forget(extend(rows)) must reproduce the base
    posterior's predictions (moments are sums — exact removal up to fp
    reassociation)."""
    x, y, xt = _data(n=120, seed=30)
    x2, y2, _ = _data(n=33, seed=31)
    spec = KernelSpec(mlp(depth=2))
    base = fit_nystrom(spec, x, y, num_inducing=40, get=get)
    rt = base.extend(x2, y2).forget(x2, y2)
    assert rt.num_train == base.num_train
    m0, s0 = base.predict_mean_std(jnp.asarray(xt))
    m1, s1 = rt.predict_mean_std(jnp.asarray(xt))
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=1e-7, atol=1e-10)
    if base.yty is not None:
        np.testing.assert_allclose(float(rt.yty), float(base.yty),
                                   rtol=1e-10)


def test_forget_equals_refit_on_remainder():
    """Sliding window: forgetting the head rows equals refitting on the
    tail with the same inducing set and ridge."""
    from nngp_tpu.gp import nystrom as nmod
    x, y, xt = _data(n=150, seed=32)
    spec = reference_kernel()
    full = fit_nystrom(spec, x, y, num_inducing=30, seed=3,
                       diag_reg_absolute_scale=True)
    slid = full.forget(x[:50], y[:50])
    assert slid.num_train == 100

    # refit on the tail, pinning the SAME inducing rows and ridge
    idx = nmod.select_inducing(150, 30, seed=3)
    c, b, _m1, _d, _y2 = nmod._stream_moments(
        spec, "nngp", "highest", full.x_m, full.w_solve, full.w_kmm,
        x[50:], y[50:], 64)
    np.testing.assert_allclose(np.asarray(slid.c_raw), np.asarray(c),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(slid.b_w), np.asarray(b),
                               rtol=1e-9, atol=1e-12)
    m, s = slid.predict_mean_std(jnp.asarray(xt))
    assert np.all(np.isfinite(np.asarray(m)))
    assert np.all(np.isfinite(np.asarray(s)))


def test_forget_too_many_rows_raises():
    x, y, _ = _data(n=30)
    post = fit_nystrom(reference_kernel(), x, y, num_inducing=10)
    with pytest.raises(ValueError, match="exceeds num_train"):
        post.forget(np.concatenate([x, x]), np.concatenate([y, y]))


def test_panel_size_invariance():
    x, y, xt = _data(n=100, seed=2)
    spec = reference_kernel()
    p1 = fit_nystrom(spec, x, y, num_inducing=30, panel_size=7)
    p2 = fit_nystrom(spec, x, y, num_inducing=30, panel_size=1000)
    m1, s1 = p1.predict_mean_std(jnp.asarray(xt))
    m2, s2 = p2.predict_mean_std(jnp.asarray(xt))
    # panelization only reorders the fp64 moment sums; the difference is
    # amplified by the whitened system's condition (~lam_max * n / reg),
    # hence the loose-looking tolerance on an exact-reordering test
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2),
                               rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-5, atol=1e-9)


def test_input_scale_compensation():
    """A forced power-of-two prescale must leave mean/std unchanged for the
    scale-equivariant relu spec (same contract as GPPosterior)."""
    x, y, xt = _data(n=90, scale=1000.0, seed=7)
    spec = KernelSpec((Dense(512), Relu(), Dense(1)))
    raw = fit_nystrom(spec, x, y, num_inducing=40, input_scale=1.0)
    scaled = fit_nystrom(spec, x, y, num_inducing=40, input_scale=64.0)
    m0, s0 = raw.predict_mean_std(jnp.asarray(xt))
    m1, s1 = scaled.predict_mean_std(jnp.asarray(xt))
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=1e-7, atol=1e-10)


def test_relative_ridge_semantics():
    """reg = diag_reg * mean(TRUE solve-kernel diag) — same semantics as
    the exact fit, independent of the inducing count."""
    x, y, _ = _data(n=80)
    spec = reference_kernel()
    exact = fit_gp(spec, x, y, diag_reg=1e-2)
    approx = fit_nystrom(spec, x, y, num_inducing=20, diag_reg=1e-2)
    np.testing.assert_allclose(float(approx.reg), float(exact.reg),
                               rtol=1e-9)


def test_chunked_predict_matches_batch():
    x, y, xt = _data(n=100, m_test=50)
    spec = reference_kernel()
    post = fit_nystrom(spec, x, y, num_inducing=32)
    mb, sb = post.predict_mean_std(jnp.asarray(xt))
    mc, sc = post.predict_mean_std_chunked(xt, chunk=16)
    np.testing.assert_allclose(np.asarray(mc).ravel(),
                               np.asarray(mb).ravel(), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(sc).ravel(),
                               np.asarray(sb).ravel(), rtol=1e-8)


def test_bad_get_raises():
    x, y, _ = _data(n=20)
    with pytest.raises(ValueError, match="get"):
        fit_nystrom(reference_kernel(), x, y, get="gp")


@pytest.mark.parametrize("get", ["nngp", "ntk"])
def test_whiten_chol_matches_eigh(get):
    """The jittered-Cholesky basis and the eigenvalue-truncated basis span
    the same column space at full rank; predictions must agree to the
    jitter scale (jitter = rank_rtol * lam_max damps vs drops the noise
    directions — see _whiten_basis_chol)."""
    x, y, xt = _data(n=140, seed=40)
    spec = reference_kernel()
    pe = fit_nystrom(spec, x, y, num_inducing=48, get=get, whiten="eigh")
    pc = fit_nystrom(spec, x, y, num_inducing=48, get=get, whiten="chol")
    m0, s0 = pe.predict_mean_std(jnp.asarray(xt))
    m1, s1 = pc.predict_mean_std(jnp.asarray(xt))
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(float(pc.log_evidence()),
                               float(pe.log_evidence()), rtol=1e-4)


def test_bad_whiten_raises():
    x, y, _ = _data(n=20)
    with pytest.raises(ValueError, match="whiten"):
        fit_nystrom(reference_kernel(), x, y, whiten="qr")


# ------------------------------------------------------ RPCholesky selection

def _skewed_data(n_dense=220, n_rare=24, d=6, seed=0):
    """One dense cluster + scattered rare rows: uniform selection starves
    the rare region, RPCholesky must not."""
    rng = np.random.default_rng(seed)
    dense = 0.05 * rng.standard_normal((n_dense, d)) + 0.3
    rare = rng.uniform(-4, 4, (n_rare, d))
    x = np.concatenate([dense, rare]).astype(np.float64)
    y = np.sin(x.sum(axis=1))[:, None]
    return x, y


def _nystrom_trace_err(spec, x, idx):
    """Exact fp64 residual trace tr(K - K_nm K_mm^+ K_mn)."""
    k = np.asarray(spec.kernel_fn(jnp.asarray(x), jnp.asarray(x), "nngp"),
                   np.float64)
    kmm = k[np.ix_(idx, idx)]
    knm = k[:, idx]
    lam, v = np.linalg.eigh(0.5 * (kmm + kmm.T))
    keep = lam > 1e-12 * max(lam[-1], 0.0)
    w = v[:, keep] / np.sqrt(lam[keep])[None, :]
    psi = knm @ w
    return float(np.trace(k) - np.sum(psi * psi))


def test_rpchol_selection_well_formed():
    from nngp_tpu.gp.nystrom import select_inducing_rpchol
    x, _ = _skewed_data()
    spec = reference_kernel()
    idx = select_inducing_rpchol(spec, x, 24, seed=1)
    assert idx.ndim == 1 and len(idx) <= 24
    assert len(np.unique(idx)) == len(idx)
    assert np.all(idx == np.sort(idx))
    assert idx.min() >= 0 and idx.max() < x.shape[0]
    idx2 = select_inducing_rpchol(spec, x, 24, seed=1)
    np.testing.assert_array_equal(idx, idx2)   # seeded-deterministic
    # m >= n short-circuits to the identity
    np.testing.assert_array_equal(
        select_inducing_rpchol(spec, x[:10], 32), np.arange(10))


def test_rpchol_beats_uniform_on_skewed_data():
    """RPCholesky is near trace-optimal; on clustered+rare data it must
    dominate seeded-uniform selection (averaged over seeds so the test is
    about the METHOD, not one lucky draw)."""
    from nngp_tpu.gp.nystrom import select_inducing, select_inducing_rpchol
    x, _ = _skewed_data()
    spec = reference_kernel()
    m = 20
    uni = np.mean([_nystrom_trace_err(spec, x, select_inducing(
        x.shape[0], m, seed=s)) for s in range(4)])
    rp = np.mean([_nystrom_trace_err(spec, x, select_inducing_rpchol(
        spec, x, m, seed=s, block=8)) for s in range(4)])
    assert rp < 0.5 * uni, (rp, uni)


@pytest.mark.parametrize("get", ["nngp", "ntk"])
def test_fit_nystrom_rpchol_end_to_end(get):
    x, y = _skewed_data(seed=5)
    xt = x[::7] + 0.01
    spec = reference_kernel()
    post = fit_nystrom(spec, x, y, num_inducing=32, get=get,
                       inducing="rpchol")
    assert post.num_inducing <= 32
    m, s = post.predict_mean_std(jnp.asarray(xt))
    assert np.all(np.isfinite(np.asarray(m)))
    assert np.all(np.isfinite(np.asarray(s))) and np.all(np.asarray(s) >= 0)
    # extend stays exact regardless of how the inducing set was chosen
    ext = post.extend(x[:16], y[:16])
    assert ext.num_train == post.num_train + 16


def test_bad_inducing_raises():
    x, y, _ = _data(n=20)
    with pytest.raises(ValueError, match="inducing"):
        fit_nystrom(reference_kernel(), x, y, inducing="kmeans")


# ---------------------------------------------------------------- mesh tier

@pytest.mark.parametrize("get", ["nngp", "ntk"])
def test_sharded_moments_match_single_device(get):
    """Moment deltas are row sums, so sharding panel rows over the mesh and
    psum-ing must reproduce the single-device fit to reduction-order
    jitter."""
    from nngp_tpu.parallel import make_mesh
    x, y, xt = _data(n=200, seed=11)
    spec = reference_kernel()
    ref = fit_nystrom(spec, x, y, num_inducing=64, get=get, panel_size=48)
    sh = fit_nystrom(spec, x, y, num_inducing=64, get=get, panel_size=48,
                     mesh=make_mesh())
    # per-device partial sums + psum reorder the fp64 reduction; the NTK
    # moments see ~1e-8 relative jitter from the cancellation-heavier sums
    np.testing.assert_allclose(np.asarray(sh.c_raw), np.asarray(ref.c_raw),
                               rtol=1e-6, atol=1e-9)
    m0, s0 = ref.predict_mean_std(jnp.asarray(xt))
    m1, s1 = sh.predict_mean_std(jnp.asarray(xt))
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=1e-6, atol=1e-9)


def test_sharded_extend_matches_single_device():
    """The posterior carries its mesh: extend streams sharded too, and the
    ragged new-row count (not divisible by 8) rides the panel zero-pad."""
    from nngp_tpu.parallel import make_mesh
    x, y, _ = _data(n=120, seed=12)
    x2, y2, xt = _data(n=37, seed=13)       # 37 % 8 != 0
    spec = reference_kernel()
    ref = fit_nystrom(spec, x, y, num_inducing=40, panel_size=64)
    sh = fit_nystrom(spec, x, y, num_inducing=40, panel_size=64,
                     mesh=make_mesh())
    assert sh.mesh is not None
    ref_e = ref.extend(x2, y2)
    sh_e = sh.extend(x2, y2)
    assert sh_e.mesh is sh.mesh             # replace() keeps the mesh
    m0, s0 = ref_e.predict_mean_std(jnp.asarray(xt))
    m1, s1 = sh_e.predict_mean_std(jnp.asarray(xt))
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=1e-6, atol=1e-9)


def test_active_learner_on_nystrom_tier():
    """ActiveLearner(nystrom_m=...) runs the full acquisition loop on the
    streaming tier; incremental rounds use the exact moment extend."""
    from nngp_tpu.active import ActiveLearner
    x, y, _ = _data(n=100, seed=20)
    xp, yp, _ = _data(n=60, seed=21)
    xv, yv, _ = _data(n=30, seed=22)
    spec = reference_kernel()
    learner = ActiveLearner(spec, budget=16, active_iters=2,
                            biased_sample=False, nystrom_m=32)
    post, history = learner.active_train(x, y, xp, yp, xv, yv, printer=None)
    assert post.num_train == 100 + 2 * 16
    assert len(history) == 2
    assert all(np.isfinite(h["val_mse"]) for h in history)


def test_active_learner_nystrom_df64_moments():
    """ActiveLearner(nystrom_moments='df64') threads the accuracy tier
    through the acquisition loop's fits (fp32 inputs; the per-round
    moment extends stay df64 through the posterior's stored tails)."""
    from nngp_tpu.active import ActiveLearner

    x, y, _ = _data(n=80, scale=1000.0, seed=20)
    xp, yp, _ = _data(n=40, scale=1000.0, seed=21)
    xv, yv, _ = _data(n=20, scale=1000.0, seed=22)

    def f32(a):
        return a.astype(np.float32)

    learner = ActiveLearner(reference_kernel(), budget=8, active_iters=1,
                            biased_sample=False, nystrom_m=24,
                            nystrom_moments="df64", input_scale=1.0)
    post, history = learner.active_train(f32(x), f32(y), f32(xp), f32(yp),
                                         f32(xv), f32(yv), printer=None)
    assert post.moments == "df64" and post.w_solve_lo is not None
    assert post.c_lo is not None
    assert np.isfinite(history[0]["val_mse"])


def test_inducing_rows_override_matches_selection():
    """fit_nystrom(inducing_rows=x[idx]) is bit-equivalent to the seeded
    internal selection of the same rows (the override is the grow hook)."""
    x, y, xt = _data(n=120, seed=30)
    spec = reference_kernel()
    idx = select_inducing(x.shape[0], 40, seed=0)
    a = fit_nystrom(spec, x, y, num_inducing=40, seed=0)
    b = fit_nystrom(spec, x, y, inducing_rows=x[idx])
    ma, sa = a.predict_mean_std(jnp.asarray(xt))
    mb, sb = b.predict_mean_std(jnp.asarray(xt))
    np.testing.assert_array_equal(np.asarray(ma), np.asarray(mb))
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))


def test_grow_inducing_matches_fresh_fit():
    """grow_inducing(new, x, y) equals a fresh fit whose inducing set is
    the concatenation, at the same ridge (same data -> same trace)."""
    x, y, xt = _data(n=150, seed=31)
    spec = reference_kernel()
    idx = select_inducing(x.shape[0], 30, seed=0)
    post = fit_nystrom(spec, x, y, num_inducing=30, seed=0)
    extra = x[140:148]
    grown = post.grow_inducing(extra, x, y)
    fresh = fit_nystrom(spec, x, y,
                        inducing_rows=np.concatenate([x[idx], extra]))
    assert grown.num_inducing == 38
    mg, sg = grown.predict_mean_std(jnp.asarray(xt))
    mf, sf = fresh.predict_mean_std(jnp.asarray(xt))
    np.testing.assert_allclose(np.asarray(mg), np.asarray(mf),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sg), np.asarray(sf),
                               rtol=1e-10, atol=1e-12)


def test_grow_inducing_monotone_elbo_and_input_scale():
    """The Titsias ELBO is monotone non-decreasing under inducing-set
    inclusion (the DTC marginal itself is NOT — observed both ways on this
    data). Also exercises an input prescale through the grow round-trip
    (x_m is stored prescaled; grow must hand fit_nystrom RAW-unit rows)."""
    x, y, xt = _data(n=200, seed=32, scale=1000.0)
    spec = KernelSpec(mlp(2))
    post = fit_nystrom(spec, x, y, num_inducing=24, seed=1, input_scale=4.0)
    grown = post.grow_inducing(x[180:196], x, y)
    assert grown.input_scale == post.input_scale
    assert grown.num_inducing == 40
    assert grown.elbo() >= post.elbo() - 1e-6 * abs(post.elbo())
    # ELBO is a LOWER bound on the exact-GP evidence at the same
    # kernel/ridge (fp64 end to end here, so the slack is one-sided)
    exact = fit_gp(spec, x, y, input_scale=4.0)
    assert grown.elbo() <= float(exact.log_marginal_likelihood()) + 1e-6
    # predictions stay finite and the variance shrinks on average
    _, s0 = post.predict_mean_std(jnp.asarray(xt))
    _, s1 = grown.predict_mean_std(jnp.asarray(xt))
    assert np.isfinite(np.asarray(s1)).all()
    assert float(jnp.mean(s1)) <= float(jnp.mean(s0)) + 1e-9


def test_active_learner_nystrom_grow():
    """nystrom_grow: the inducing set grows per round and the loop stays
    finite; nystrom_grow without nystrom_m raises."""
    from nngp_tpu.active import ActiveLearner
    x, y, _ = _data(n=100, seed=33)
    xp, yp, _ = _data(n=60, seed=34)
    xv, yv, _ = _data(n=30, seed=35)
    spec = reference_kernel()
    learner = ActiveLearner(spec, budget=16, active_iters=2,
                            biased_sample=False, nystrom_m=32,
                            nystrom_grow=8)
    post, history = learner.active_train(x, y, xp, yp, xv, yv, printer=None)
    assert post.num_train == 100 + 2 * 16
    assert post.num_inducing == 32 + 2 * 8
    assert all(np.isfinite(h["val_mse"]) for h in history)
    with pytest.raises(ValueError, match="nystrom_grow"):
        ActiveLearner(spec, nystrom_grow=8)


@pytest.mark.parametrize("get", ["nngp", "ntk"])
def test_device_finalize_matches_host(get):
    """finalize='device' (emulated-fp64 on the accelerator, ops/df64.py)
    must agree with the host-fp64 solve stage it replaces — fit, predict
    AND the extend path, which reuses the posterior's finalize choice."""
    x, y, xt = _data(n=80)
    x32 = x.astype(np.float32)
    y32 = y.astype(np.float32)
    xt32 = jnp.asarray(xt.astype(np.float32))
    spec = reference_kernel()
    host = fit_nystrom(spec, x32[:64], y32[:64], num_inducing=48, get=get)
    dev = fit_nystrom(spec, x32[:64], y32[:64], num_inducing=48, get=get,
                      finalize="device")
    assert host.finalize == "host" and dev.finalize == "device"
    m0, s0 = host.predict_mean_std(xt32)
    m1, s1 = dev.predict_mean_std(xt32)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=2e-3, atol=1e-5)
    host2 = host.extend(x32[64:], y32[64:])
    dev2 = dev.extend(x32[64:], y32[64:])
    m0, s0 = host2.predict_mean_std(xt32)
    m1, s1 = dev2.predict_mean_std(xt32)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=2e-3, atol=1e-5)


def test_finalize_auto_resolves_by_backend_and_dtype():
    x, y, _ = _data(n=40)
    spec = reference_kernel()
    # CPU backend: auto -> host (native fp64 LAPACK is right there)
    post = fit_nystrom(spec, x.astype(np.float32), y.astype(np.float32),
                       num_inducing=24, finalize="auto")
    assert post.finalize == "host"
    # fp64 posteriors must reject the (48-bit) device path outright
    with pytest.raises(ValueError, match="fp32"):
        fit_nystrom(spec, x, y, num_inducing=24, finalize="device")
    with pytest.raises(ValueError, match="finalize"):
        fit_nystrom(spec, x.astype(np.float32), y.astype(np.float32),
                    num_inducing=24, finalize="gpu")


# ---------------------------------------------------------------------------
# moments='df64' (emulated-fp64 kernels + projection, ops/df64_kernel.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("get", ["nngp", "ntk"])
def test_df64_moments_extend_forget_exact(get):
    """df64 fit runs end to end (fp32 inputs), extend == refit on the
    concatenation (same inducing set + ridge), forget inverts extend —
    the same contracts the fp32 moment path guarantees."""
    x, y, xt = _data(n=160, scale=1000.0)
    x32, y32, xt32 = (a.astype(np.float32) for a in (x, y, xt))
    spec = reference_kernel()
    post = fit_nystrom(spec, x32[:120], y32[:120], num_inducing=48,
                       rank_rtol=1e-8, input_scale=1.0, get=get,
                       moments="df64")
    assert post.moments == "df64" and post.c_lo is not None
    ext = post.extend(x32[120:], y32[120:])
    ref = fit_nystrom(spec, x32, y32,
                      inducing_rows=np.asarray(post.x_m),
                      diag_reg_absolute_scale=True,
                      diag_reg=float(post.reg), rank_rtol=1e-8,
                      input_scale=1.0, get=get, moments="df64")
    me, se = ext.predict_mean_std(xt32)
    mr, sr = ref.predict_mean_std(xt32)
    np.testing.assert_allclose(np.asarray(me), np.asarray(mr),
                               rtol=0, atol=1e-6 * np.abs(mr).max())
    np.testing.assert_allclose(np.asarray(se), np.asarray(sr),
                               rtol=1e-4, atol=1e-6 * np.abs(sr).max())
    back = ext.forget(x32[120:], y32[120:])
    mb, _ = back.predict_mean_std(xt32)
    m0, _ = post.predict_mean_std(xt32)
    np.testing.assert_allclose(np.asarray(mb), np.asarray(m0),
                               rtol=0, atol=1e-5 * np.abs(m0).max())
    # evidence/ELBO consume the df tails without error
    assert np.isfinite(ext.log_evidence()) and np.isfinite(ext.elbo())


def test_df64_moments_beat_fp32_moments():
    """The point of the tier: at [0,1000] feature scale the df64 moment
    matrix tracks a SAME-BASIS fp64 oracle ~5+ digits closer than the
    fp32 accumulation. The oracle shares the fp32 arms' inducing rows
    and whitening basis (C = Psi Psi^T with Psi = W^T K_mn in real
    fp64), so the comparison isolates kernel-entry + projection +
    accumulator rounding — a full-fp64 FIT has a different (fp64) basis
    and its c_raw is not comparable entry-wise."""
    x, y, _ = _data(n=256, scale=1000.0)
    spec = reference_kernel()
    common = dict(num_inducing=64, rank_rtol=1e-8, input_scale=1.0)
    p32 = fit_nystrom(spec, x.astype(np.float32), y.astype(np.float32),
                      **common)
    pdf = fit_nystrom(spec, x.astype(np.float32), y.astype(np.float32),
                      moments="df64", **common)
    np.testing.assert_array_equal(np.asarray(p32.x_m), np.asarray(pdf.x_m))
    # per-arm same-basis fp64 oracle (the arms' BASES legitimately differ:
    # df64 builds W from df64 K_mm entries); promote the SAME fp32-cast
    # inputs the arms saw, so input rounding isn't attributed
    x64 = jnp.asarray(x.astype(np.float32).astype(np.float64))
    x_m64 = jnp.asarray(np.asarray(pdf.x_m, np.float64))
    k_nm = np.asarray(spec.kernel_fn(x64, x_m64, "nngp"), np.float64)

    def moment_err(post, c64):
        w64 = np.asarray(post.w_solve, np.float64)
        if post.w_solve_lo is not None:   # df64 keeps the basis as a pair
            w64 = w64 + np.asarray(post.w_solve_lo, np.float64)
        psi = w64.T @ k_nm.T
        c_ref = psi @ psi.T
        return np.abs(c64 - c_ref).max() / np.abs(c_ref).max()

    err32 = moment_err(p32, np.asarray(p32.c_raw, np.float64))
    errdf = moment_err(pdf, np.asarray(pdf.c_raw, np.float64)
                       + np.asarray(pdf.c_lo, np.float64))
    assert errdf < 1e-4 * err32, (err32, errdf)
    assert errdf < 1e-11, errdf


def test_df64_bases_whiten_below_fp32_entry_noise():
    """The reason moments='df64' exists: fp32 K_mm ENTRY noise floors the
    usable rank cut at ~1e-8 (deeper eigendirections are unidentifiable),
    and that floor owns the measured fp32-vs-fp64 serving gap. With df64
    entries the whitening residual ||W^T K64 W - I|| at a 1e-12 cut must
    be orders below the fp32-entry basis's at the same cut."""
    from nngp_tpu.gp.nystrom import _inducing_bases

    from nngp_tpu.gp.nystrom import _inducing_bases as bases

    rng = np.random.default_rng(3)
    base = rng.uniform(0, 1000.0, (48, 6))
    # near-duplicate rows at ~1e-3 relative separation: the pair-difference
    # eigendirections land at 2e-10..5e-9 of lam_max (measured) — BETWEEN
    # the fp32 floor (1e-8) and the df64 default cut (1e-12). Whether they
    # are usable is exactly the question the entry precision decides.
    x = np.concatenate([base, base + 1.0 * rng.standard_normal((48, 6))])
    x32 = jnp.asarray(x, jnp.float32)
    spec = reference_kernel()
    k64 = np.asarray(spec.kernel_fn(jnp.asarray(x32, jnp.float64),
                                    jnp.asarray(x32, jnp.float64),
                                    "nngp"), np.float64)

    rtol = 1e-12

    def as64(w):
        # entries='df64' bases come back as DF pairs (the fp32-rounded
        # basis alone breaks deep cuts — nystrom_cut_depth.py): evaluate
        # the EFFECTIVE basis hi + lo
        if hasattr(w, "hi"):
            return (np.asarray(w.hi, np.float64)
                    + np.asarray(w.lo, np.float64))
        return np.asarray(w, np.float64)

    def metrics(w):
        w = as64(w)
        g = w.T @ k64 @ w
        d = np.diag(g)
        ok = np.abs(d - 1) < 0.1
        off = g - np.diag(d)
        return int(ok.sum()), np.abs(off[np.ix_(ok, ok)]).max()

    n_df, r_df = metrics(bases(spec, "nngp", rtol, x32,
                               entries="df64")[0])
    n_32, r_32 = metrics(bases(spec, "nngp", rtol, x32,
                               entries="fp32")[0])
    # df64 entries whiten the deep pair-difference directions fp32
    # entries cannot (they sit below the fp32 entry-noise floor) ...
    assert n_df >= n_32 + 32, (n_df, n_32)
    # ... and the directions BOTH whiten are cleaner. With the basis kept
    # as a DF pair the residual floor is the df64 entry/arithmetic noise
    # itself — orders below the fp32-entry arm.
    assert r_df < 0.2 * r_32, (r_df, r_32)
    # the device df64 factorization matches the host semantics
    n_dev, r_dev = metrics(bases(spec, "nngp", rtol, x32,
                                 entries="df64", device=True)[0])
    assert n_dev >= n_32 + 32 and r_dev < 0.2 * r_32, (n_dev, r_dev)


def test_df64_moments_default_rank_rtol_deepens():
    from nngp_tpu.gp.nystrom import _default_rank_rtol
    assert _default_rank_rtol(jnp.float32) == 1e-8
    assert _default_rank_rtol(jnp.float32, "df64") == 1e-12
    assert _default_rank_rtol(jnp.float64) == 1e-14
    x, y, xt = _data(n=96, scale=1000.0)
    x32, y32 = x.astype(np.float32), y.astype(np.float32)
    post = fit_nystrom(reference_kernel(), x32, y32, num_inducing=32,
                       moments="df64")
    assert post.rank_rtol == 1e-12
    m, s = post.predict_mean_std(xt.astype(np.float32))
    assert np.all(np.isfinite(np.asarray(m)))
    assert np.all(np.asarray(s) >= 0)


def test_df64_moments_rejects_fp64_inputs():
    x, y, _ = _data(n=32)
    with pytest.raises(ValueError, match="df64"):
        fit_nystrom(reference_kernel(), x, y, num_inducing=16,
                    moments="df64")
    with pytest.raises(ValueError, match="moments"):
        fit_nystrom(reference_kernel(), x.astype(np.float32),
                    y.astype(np.float32), num_inducing=16, moments="bf16")
