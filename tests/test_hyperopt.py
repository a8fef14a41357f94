"""Gradient-based kernel hyperparameter learning (`gp/hyperopt.py`).

Anchors: the traced-hyperparameter loss equals the fitted posterior's exact
log evidence at pinned values; optimization decreases the loss, survives
duplicate rows (the acos-at-rho=1 hazard), beats the reference-default
hyperparameters on evidence, and its output plugs into the normal tiers.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nngp_tpu.gp import fit_gp
from nngp_tpu.gp.hyperopt import (HyperoptResult, _build_layers,
                                  _grad_safe_duals, _nll,
                                  fit_kernel_hyperparams)
from nngp_tpu.models.kernel_spec import KernelSpec


def _data(n=80, d=5, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, (n, d))
    y = np.sin(2 * x.sum(axis=1))[:, None] + 0.05 * rng.standard_normal((n, 1))
    return x, y


def test_loss_matches_exact_evidence_at_pinned_values():
    """-_nll(theta) == GPPosterior.log_marginal_likelihood for the same
    (spec, diag_reg): the clamp + smooth-diagonal replacement must not move
    the forward value beyond fp noise."""
    x, y = _data()
    w0, w, b, reg = 1.2, 0.9, 0.3, 3e-3
    theta = {"log_w0": jnp.log(jnp.asarray(w0)),
             "log_w": jnp.log(jnp.asarray(w)),
             "log_b": jnp.log(jnp.asarray(b)),
             "log_reg": jnp.log(jnp.asarray(reg))}
    from nngp_tpu.ops.gram import input_diag, input_gram
    k0, d1 = input_gram(jnp.asarray(x), jnp.asarray(x)), input_diag(
        jnp.asarray(x))
    for get in ("nngp", "ntk"):
        nll = float(_nll(theta, k0, d1, jnp.asarray(y), 2, "relu",
                         512, get, _grad_safe_duals(1e-12)))
        spec = KernelSpec(_build_layers(2, "relu", 512, w0, w, b))
        post = fit_gp(spec, x, y, diag_reg=reg, get=get, input_scale=1.0)
        np.testing.assert_allclose(-nll, post.log_marginal_likelihood(),
                                   rtol=1e-6)   # clamp eps forward error


def test_optimization_decreases_nll_and_beats_defaults():
    x, y = _data(n=120, seed=3)
    res = fit_kernel_hyperparams(x, y, steps=60, lr=0.1)
    assert res.nll_history.shape == (60,)
    assert np.all(np.isfinite(res.nll_history))
    assert res.nll_history[-1] < res.nll_history[0]
    # Adam is non-monotone step to step; the final iterate must still be
    # far better than where the best restart started
    assert -res.log_evidence < res.nll_history[0]
    # beats the reference-default hyperparameters on the same data
    default = fit_gp(KernelSpec(_build_layers(1, "relu", 512, 1.0, 1.0, 0.0)),
                     x, y, diag_reg=1e-3, input_scale=1.0)
    assert res.log_evidence > default.log_marginal_likelihood()
    assert res.w0 > 0 and res.w > 0 and res.b > 0 and res.diag_reg > 0


def test_duplicate_rows_keep_gradients_finite():
    """rho = 1 off the diagonal (duplicate rows) is exactly where the
    unclamped acos would NaN the backward pass."""
    x, y = _data(n=40, seed=5)
    x = np.concatenate([x, x[:10]])          # exact duplicates
    y = np.concatenate([y, y[:10]])
    res = fit_kernel_hyperparams(x, y, steps=20, lr=0.1)
    assert np.all(np.isfinite(res.nll_history))
    assert np.isfinite(res.log_evidence)


@pytest.mark.parametrize("get", ["nngp", "ntk"])
def test_result_plugs_into_exact_tier(get):
    x, y = _data(n=90, seed=7)
    xt, _ = _data(n=20, seed=8)
    res = fit_kernel_hyperparams(x, y, get=get, steps=30)
    assert isinstance(res, HyperoptResult)
    post = fit_gp(res.spec, x, y, get=get, **res.fit_kwargs())
    m, s = post.predict_mean_std(jnp.asarray(xt))
    assert np.all(np.isfinite(np.asarray(m)))
    assert np.all(np.isfinite(np.asarray(s)))


def test_recovers_noise_scale():
    """Draw y from a known prior (reference kernel + noise): the learned
    relative ridge should land within an order of magnitude of the true
    noise-to-signal ratio, and far from the 1e-3 default."""
    rng = np.random.default_rng(11)
    x = rng.uniform(0, 1, (150, 4))
    spec = KernelSpec(_build_layers(1, "relu", 512, 1.0, 1.0, 0.0))
    k = np.asarray(spec.kernel_fn(jnp.asarray(x), jnp.asarray(x), "nngp"),
                   np.float64)
    true_rel = 0.3                            # strong noise
    noise_var = true_rel * np.mean(np.diag(k))
    cov = k + noise_var * np.eye(len(x))
    y = np.linalg.cholesky(cov) @ rng.standard_normal((len(x), 1))
    res = fit_kernel_hyperparams(x, y, steps=150, lr=0.1)
    assert 0.03 < res.diag_reg < 3.0, res.diag_reg


def test_subsample_cap():
    x, y = _data(n=60)
    res = fit_kernel_hyperparams(x, y, steps=5, max_points=32)
    assert res.num_points == 32


def test_select_kernel_ranks_by_evidence():
    from nngp_tpu.gp import select_kernel
    x, y = _data(n=100, seed=13)
    best, all_res = select_kernel(x, y, depths=(1, 2),
                                  activations=("relu",), steps=25)
    assert len(all_res) == 2 and best is all_res[0]
    evs = [r.log_evidence for r in all_res]
    assert evs == sorted(evs, reverse=True)
    assert {(r.depth, r.activation) for r in all_res} == {(1, "relu"),
                                                          (2, "relu")}


def test_result_plugs_into_nystrom_tier():
    from nngp_tpu.gp import fit_nystrom
    x, y = _data(n=120, seed=9)
    xt, _ = _data(n=15, seed=10)
    res = fit_kernel_hyperparams(x, y, steps=20)
    post = fit_nystrom(res.spec, x, y, num_inducing=32, **res.fit_kwargs())
    m, s = post.predict_mean_std(jnp.asarray(xt))
    assert np.all(np.isfinite(np.asarray(m)))
    assert np.all(np.isfinite(np.asarray(s)))


def test_fp32_path_matches_fp64():
    """The TPU path runs fp32 (eps=1e-6 clamp): the optimization must stay
    finite and land near the fp64 optimum on the same data."""
    x, y = _data(n=100, seed=21)
    r64 = fit_kernel_hyperparams(x, y, steps=40)
    r32 = fit_kernel_hyperparams(x.astype(np.float32),
                                 y.astype(np.float32), steps=40)
    assert np.all(np.isfinite(r32.nll_history))
    # same basin: hyperparameters within a few percent, evidence within
    # a nat of the fp64 run
    np.testing.assert_allclose(
        [r32.w0, r32.w, r32.b, r32.diag_reg],
        [r64.w0, r64.w, r64.b, r64.diag_reg], rtol=0.05)
    assert abs(r32.log_evidence - r64.log_evidence) < 1.0


def test_degenerate_inputs_stay_finite():
    """Constant targets and tiny n are legal inputs (a cold-start server
    may fit on a handful of queries): the optimization must not NaN."""
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, (6, 3))
    res = fit_kernel_hyperparams(x, np.zeros((6, 1)), steps=10)
    assert np.isfinite(res.log_evidence)
    assert all(np.isfinite(v) for v in (res.w0, res.w, res.b, res.diag_reg))
    # single restart (init reg equal to the only entry in reg_restarts)
    res2 = fit_kernel_hyperparams(x, rng.standard_normal((6, 1)), steps=10,
                                  init=(1.0, 1.0, 0.1, 0.3),
                                  reg_restarts=(0.3,))
    assert np.isfinite(res2.log_evidence)


def test_fp32_magnitude_guard():
    """Raw packed categorical chunks (up to 2^64) must be rejected in fp32
    with a chunk_norm pointer, and accepted in fp64."""
    x = np.array([[2.0 ** 40, 1.0], [3.0, 2.0 ** 39]], np.float32)
    y = np.ones((2, 1), np.float32)
    with pytest.raises(ValueError, match="chunk_norm"):
        fit_kernel_hyperparams(x, y, steps=2)
    res = fit_kernel_hyperparams(x.astype(np.float64),
                                 y.astype(np.float64), steps=2)
    assert np.isfinite(res.log_evidence)


def test_ard_constant_scale_equals_scalar_loss():
    """With s = w0 * ones the ARD loss must equal the scalar loss exactly
    (the first Dense sees the same scaled inputs either way)."""
    from nngp_tpu.gp.hyperopt import _nll_ard
    from nngp_tpu.ops.gram import input_diag, input_gram
    x, y = _data(n=50, seed=30)
    xd, yd = jnp.asarray(x), jnp.asarray(y)
    w0, w, b, reg = 0.7, 1.3, 0.2, 1e-2
    duals = _grad_safe_duals(1e-12)
    base = {"log_w": jnp.log(jnp.asarray(w)),
            "log_b": jnp.log(jnp.asarray(b)),
            "log_reg": jnp.log(jnp.asarray(reg))}
    scalar = _nll(dict(base, log_w0=jnp.log(jnp.asarray(w0))),
                  input_gram(xd, xd), input_diag(xd), yd, 1, "relu", 512,
                  "nngp", duals)
    ard = _nll_ard(dict(base, log_s=jnp.full(x.shape[1], jnp.log(w0))),
                   xd, yd, 1, "relu", 512, "nngp", duals)
    np.testing.assert_allclose(float(ard), float(scalar), rtol=1e-10)


def test_ard_recovers_relevant_feature():
    """y depends on feature 0 only: the learned per-feature scale must
    weight it far above the pure-noise dims."""
    rng = np.random.default_rng(31)
    x = rng.uniform(0, 1, (200, 6))
    y = np.sin(4 * x[:, :1]) + 0.02 * rng.standard_normal((200, 1))
    res = fit_kernel_hyperparams(x, y, steps=200, ard=True)
    s = res.feature_scale
    assert s.shape == (6,)
    assert s[0] > 3.0 * np.max(s[1:]), s
    # the result plugs into the exact tier through scale_inputs
    post = fit_gp(res.spec, res.scale_inputs(x), y, **res.fit_kwargs())
    m, sd = post.predict_mean_std(res.scale_inputs(jnp.asarray(x[:10])))
    assert np.all(np.isfinite(np.asarray(m)))
    assert np.all(np.isfinite(np.asarray(sd)))


def test_ard_init_feature_scale_tames_magnitudes():
    """Mixed-scale features with a data-driven init pass the fp32 guard
    and stay finite."""
    rng = np.random.default_rng(32)
    x = np.hstack([rng.uniform(0, 1000, (60, 2)),
                   rng.uniform(0, 2.0 ** 40, (60, 1))]).astype(np.float32)
    y = rng.standard_normal((60, 1)).astype(np.float32)
    init_s = (1000.0 / np.maximum(np.abs(x).max(axis=0), 1e-6))
    res = fit_kernel_hyperparams(x, y, steps=10, ard=True,
                                 init_feature_scale=init_s)
    assert np.all(np.isfinite(res.feature_scale))
    assert np.isfinite(res.log_evidence)


def test_dtc_loss_matches_dense_oracle():
    """-_nll_dtc == the closed-form DTC evidence computed densely in numpy
    (Q = K_nm K_mm^-1 K_mn, y ~ N(0, Q + rI)) at pinned hyperparameters —
    the same model `NystromPosterior.log_evidence` scores after a fit."""
    from nngp_tpu.gp.hyperopt import _nll_dtc
    from nngp_tpu.models.kernel_spec import apply_diag_recursion
    x, y = _data(n=48, seed=40)
    m = 12
    w0, w, b, reg = 1.1, 0.8, 0.25, 4e-3
    theta = {"log_w0": jnp.log(jnp.asarray(w0)),
             "log_w": jnp.log(jnp.asarray(w)),
             "log_b": jnp.log(jnp.asarray(b)),
             "log_reg": jnp.log(jnp.asarray(reg))}
    for get in ("nngp", "ntk"):
        nll = float(_nll_dtc(theta, jnp.asarray(x), jnp.asarray(y), m,
                             2, "relu", 512, get, _grad_safe_duals(1e-12)))
        # dense fp64 oracle through the production kernel path
        spec = KernelSpec(_build_layers(2, "relu", 512, w0, w, b))
        from nngp_tpu.ops.gram import input_diag
        knm = np.asarray(spec.kernel_fn(jnp.asarray(x), jnp.asarray(x[:m]),
                                        ("nngp", "ntk"))[get == "ntk"],
                         np.float64)
        kmm = knm[:m].copy()
        dn, dt = apply_diag_recursion(input_diag(jnp.asarray(x)), spec.layers)
        dvec = np.asarray(dt if get == "ntk" else dn, np.float64)
        np.fill_diagonal(kmm, dvec[:m])
        r = reg * dvec.mean()
        q = knm @ np.linalg.solve(kmm, knm.T)
        cov = q + r * np.eye(len(x))
        sign, logdet = np.linalg.slogdet(cov)
        quad = float(y[:, 0] @ np.linalg.solve(cov, y[:, 0]))
        oracle = 0.5 * (quad + logdet + len(x) * np.log(2 * np.pi))
        np.testing.assert_allclose(nll, oracle, rtol=1e-6)


def test_dtc_loss_equals_exact_at_full_rank():
    """With m == n the Nystrom model IS the exact GP (Q = K), so the DTC
    loss must reduce to the exact loss."""
    from nngp_tpu.gp.hyperopt import _nll_dtc
    from nngp_tpu.ops.gram import input_diag, input_gram
    x, y = _data(n=40, seed=41)
    xd, yd = jnp.asarray(x), jnp.asarray(y)
    theta = {"log_w0": jnp.log(jnp.asarray(0.9)),
             "log_w": jnp.log(jnp.asarray(1.1)),
             "log_b": jnp.log(jnp.asarray(0.3)),
             "log_reg": jnp.log(jnp.asarray(2e-3))}
    duals = _grad_safe_duals(1e-12)
    dtc = float(_nll_dtc(theta, xd, yd, 40, 1, "relu", 512, "nngp", duals))
    exact = float(_nll(theta, input_gram(xd, xd), input_diag(xd), yd,
                       1, "relu", 512, "nngp", duals))
    np.testing.assert_allclose(dtc, exact, rtol=1e-5)


@pytest.mark.parametrize("get", ["nngp", "ntk"])
def test_dtc_objective_optimizes_and_transfers_to_nystrom(get):
    """fit_kernel_hyperparams(objective='dtc') optimizes the served model's
    own evidence; the result plugs into fit_nystrom and the fitted
    posterior's log_evidence agrees in preferring the learned hypers."""
    from nngp_tpu.gp import fit_nystrom
    x, y = _data(n=150, seed=42)
    res = fit_kernel_hyperparams(x, y, steps=60, objective="dtc", dtc_m=32,
                                 get=get)
    assert res.objective == "dtc"
    assert np.all(np.isfinite(res.nll_history))
    assert res.nll_history[-1] < res.nll_history[0]
    post = fit_nystrom(res.spec, x, y, num_inducing=32, get=get,
                       **res.fit_kwargs())
    default = fit_nystrom(KernelSpec(_build_layers(1, "relu", 512,
                                                   1.0, 1.0, 0.0)),
                          x, y, num_inducing=32, diag_reg=1e-3, get=get,
                          input_scale=1.0)
    assert post.log_evidence() > default.log_evidence()


def test_dtc_objective_composes_with_ard():
    rng = np.random.default_rng(43)
    x = rng.uniform(0, 1, (120, 4))
    y = np.sin(4 * x[:, :1]) + 0.02 * rng.standard_normal((120, 1))
    res = fit_kernel_hyperparams(x, y, steps=80, objective="dtc",
                                 dtc_m=48, ard=True)
    s = res.feature_scale
    assert s is not None and np.all(np.isfinite(s))
    assert s[0] > np.max(s[1:]), s


def test_dtc_mask_padding_is_inert():
    """_nll_dtc with zero-padded rows + mask equals the unpadded loss at
    pinned theta — including b > 0, where padded rows pick up NONZERO
    kernel values through the bias and MUST be masked after the
    recursion."""
    from nngp_tpu.gp.hyperopt import _nll_dtc
    x, y = _data(n=50, seed=44)
    theta = {"log_w0": jnp.log(jnp.asarray(0.8)),
             "log_w": jnp.log(jnp.asarray(1.2)),
             "log_b": jnp.log(jnp.asarray(0.4)),
             "log_reg": jnp.log(jnp.asarray(3e-3))}
    duals = _grad_safe_duals(1e-12)
    ref = float(_nll_dtc(theta, jnp.asarray(x), jnp.asarray(y), 16,
                         1, "relu", 512, "nngp", duals))
    pad = 14
    xp = jnp.concatenate([jnp.asarray(x), jnp.zeros((pad, x.shape[1]))])
    yp = jnp.concatenate([jnp.asarray(y), jnp.zeros((pad, 1))])
    mask = jnp.concatenate([jnp.ones(len(x)), jnp.zeros(pad)])
    padded = float(_nll_dtc(theta, xp, yp, 16, 1, "relu", 512, "nngp",
                            duals, mask=mask))
    np.testing.assert_allclose(padded, ref, rtol=1e-10)
    # explicit all-ones mask is the identity
    ones = float(_nll_dtc(theta, jnp.asarray(x), jnp.asarray(y), 16,
                          1, "relu", 512, "nngp", duals,
                          mask=jnp.ones(len(x))))
    np.testing.assert_allclose(ones, ref, rtol=1e-12)


def test_dtc_mesh_full_n_matches_unsharded():
    """fit_kernel_hyperparams(mesh=..., max_points=None, objective='dtc')
    on a ragged n (padding required) learns the SAME hyperparameters as
    the unsharded full-n run — GSPMD only changes the reduction order
    (CLAUDE.md: psum jitter ~1e-8 rel on fp64)."""
    from jax.sharding import Mesh

    x, y = _data(n=198, d=4, seed=45)   # 198 % 8 != 0: exercises padding
    kw = dict(steps=25, max_points=None, objective="dtc", dtc_m=24)
    ref = fit_kernel_hyperparams(x, y, **kw)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    res = fit_kernel_hyperparams(x, y, mesh=mesh, **kw)
    np.testing.assert_allclose(
        [res.w0, res.w, res.b, res.diag_reg],
        [ref.w0, ref.w, ref.b, ref.diag_reg], rtol=1e-6)
    np.testing.assert_allclose(res.log_evidence, ref.log_evidence,
                               rtol=1e-8)
    # mesh requires the row-shardable objective
    with pytest.raises(ValueError, match="dtc"):
        fit_kernel_hyperparams(x, y, steps=5, mesh=mesh)


def test_dtc_mesh_composes_with_ard():
    """ARD (per-feature log_s in theta) + mesh sharding + vmapped restarts
    all compose: the sharded run learns the same feature scales as the
    unsharded one."""
    from jax.sharding import Mesh

    x, y = _data(n=100, d=3, seed=46)   # 100 % 8 != 0
    kw = dict(steps=15, max_points=None, objective="dtc", dtc_m=16,
              ard=True)
    ref = fit_kernel_hyperparams(x, y, **kw)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    res = fit_kernel_hyperparams(x, y, mesh=mesh, **kw)
    np.testing.assert_allclose(res.feature_scale, ref.feature_scale,
                               rtol=1e-6)
    np.testing.assert_allclose(res.diag_reg, ref.diag_reg, rtol=1e-6)


def test_json_roundtrip_preserves_result():
    """HyperoptResult.to_json/from_json: learning costs minutes; the JSON
    artifact must rebuild the exact spec/ridge/ARD-scale (json float repr
    round-trips fp64 exactly), so a reloaded artifact fits the identical
    posterior."""
    x, y = _data(n=60, d=4, seed=3)
    for ard in (False, True):
        res = fit_kernel_hyperparams(x, y, steps=8, ard=ard)
        res2 = HyperoptResult.from_json(res.to_json())
        assert res2.w0 == res.w0 and res2.w == res.w and res2.b == res.b
        assert res2.diag_reg == res.diag_reg
        assert res2.log_evidence == res.log_evidence
        assert res2.num_points == res.num_points
        assert (res2.depth, res2.activation, res2.objective) == (
            res.depth, res.activation, res.objective)
        assert res2.spec.layers == res.spec.layers
        np.testing.assert_array_equal(res2.nll_history, res.nll_history)
        if ard:
            np.testing.assert_array_equal(res2.feature_scale,
                                          res.feature_scale)
        else:
            assert res2.feature_scale is None
        post = fit_gp(res.spec, res.scale_inputs(x), y, **res.fit_kwargs())
        post2 = fit_gp(res2.spec, res2.scale_inputs(x), y,
                       **res2.fit_kwargs())
        m1, _ = post.predict_mean_std(jnp.asarray(res.scale_inputs(x[:9])))
        m2, _ = post2.predict_mean_std(jnp.asarray(res2.scale_inputs(x[:9])))
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_save_load_file(tmp_path):
    x, y = _data(n=40, d=3, seed=5)
    res = fit_kernel_hyperparams(x, y, steps=5)
    p = tmp_path / "hyper.json"
    res.save(str(p))
    res2 = HyperoptResult.load(str(p))
    assert res2.spec.layers == res.spec.layers
    assert res2.diag_reg == res.diag_reg


def test_all_diverged_restarts_raise():
    """nanargmin over all-inf finals would silently report the UN-learned
    init as a success — a NaN feature makes every restart diverge, which
    must raise instead."""
    x, y = _data(n=30, d=3, seed=9)
    x = x.copy()
    x[0, 0] = np.nan
    with pytest.raises(FloatingPointError, match="diverged"):
        fit_kernel_hyperparams(x, y, steps=5)


def test_artifact_provenance_fields_roundtrip():
    """get + num_features ride the JSON artifact (and default sensibly on
    pre-guard artifacts missing the keys)."""
    import json
    x, y = _data(n=40, d=4, seed=11)
    res = fit_kernel_hyperparams(x, y, steps=5, get="ntk")
    assert res.get == "ntk" and res.num_features == 4
    res2 = HyperoptResult.from_json(res.to_json())
    assert res2.get == "ntk" and res2.num_features == 4
    d = json.loads(res.to_json())
    del d["get"], d["num_features"]
    old = HyperoptResult.from_json(json.dumps(d))
    assert old.get == "nngp" and old.num_features is None


def test_dtc_fp32_near_duplicate_rows_survive():
    """fp32 DTC jitter floor: near-duplicate rows (shared categorical
    chunk patterns on join workloads) push kappa(K_mm) past 1/eps_fp32;
    with the old 1e-6 relative jitter the K_mm Cholesky NaN'd at the
    INITIAL theta and every restart 'diverged' (measured on synth6_big
    chunk_norm fp32 — TPU and CPU alike). The fp32 path must stay finite
    and actually descend."""
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1000.0, size=(64, 8))
    x = np.repeat(base, 8, axis=0) + rng.normal(0, 1e-3, (512, 8))
    y = rng.normal(0, 5.0, (512,))
    res = fit_kernel_hyperparams(x.astype(np.float32),
                                 y.astype(np.float32), steps=8,
                                 ard=True, objective="dtc", dtc_m=128)
    assert np.isfinite(res.log_evidence)
    hist = res.nll_history
    assert np.all(np.isfinite(hist))
    assert hist[-1] < hist[0]          # optimization made progress
