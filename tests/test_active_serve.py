"""Active-learning loop + serving Estimator tests (synthetic schema, CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nngp_tpu.active import ActiveLearner
from nngp_tpu.featurize.join import MultiJoinEncoder
from nngp_tpu.featurize.stats import ColumnStats, TableStats
from nngp_tpu.models.kernel_spec import reference_kernel
from nngp_tpu.serve.estimator import Estimator
from nngp_tpu.serve.feedback import merge_query_res, PredInfo


def _toy_data(n=120, d=8, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1000, (n, d)).astype(np.float64)
    y = (np.log2(1 + np.abs(x[:, :1] - x[:, 1:2]) / 10)
         + 0.05 * rng.standard_normal((n, 1)))
    return x, y


@pytest.mark.parametrize("refit", ["incremental", "full"])
@pytest.mark.parametrize("biased", [True, False])
def test_active_learning_improves_val_mse(refit, biased):
    x, y = _toy_data(300)
    learner = ActiveLearner(reference_kernel(), budget=40, active_iters=3,
                            biased_sample=biased, refit=refit)
    post, history = learner.active_train(
        x[:30], y[:30], x[30:240], y[30:240], x[240:], y[240:], printer=None)
    assert len(history) == 3
    assert post.num_train == 30 + 3 * 40
    mse0 = learner.test(post, jnp.asarray(x[240:]), jnp.asarray(y[240:]),
                        printer=None)
    base = learner.train(jnp.asarray(x[:30]), jnp.asarray(y[:30]))
    mse_base = learner.test(base, jnp.asarray(x[240:]), jnp.asarray(y[240:]),
                            printer=None)
    assert mse0 < mse_base  # more (selected) data must help on this toy task


def test_select_chunked_pool_matches_direct(monkeypatch):
    """Above CHUNKED_POOL_MIN the selection predicts the pool in chunks;
    with deterministic top-k acquisition the indices must be identical."""
    x, y = _toy_data(260, seed=3)
    learner = ActiveLearner(reference_kernel(), budget=25,
                            biased_sample=False)
    post = learner.train(jnp.asarray(x[:60]), jnp.asarray(y[:60]))
    pool = jnp.asarray(x[60:])
    direct = np.asarray(learner.select(post, pool))
    monkeypatch.setattr(ActiveLearner, "CHUNKED_POOL_MIN", 32)
    chunked = np.asarray(learner.select(post, pool))
    np.testing.assert_array_equal(np.sort(chunked), np.sort(direct))


def test_active_incremental_tracks_full_refit():
    """Incremental extend and full refit should give very close val MSE."""
    x, y = _toy_data(240, seed=1)
    common = dict(budget=30, active_iters=2, biased_sample=False)
    li = ActiveLearner(reference_kernel(), refit="incremental", **common)
    pi, hi = li.active_train(x[:30], y[:30], x[30:200], y[30:200],
                             x[200:], y[200:], printer=None)
    lf = ActiveLearner(reference_kernel(), refit="full", **common)
    pf, hf = lf.active_train(x[:30], y[:30], x[30:200], y[30:200],
                             x[200:], y[200:], printer=None)
    # same top-k selections -> same train sets; ridge differs slightly
    # (frozen vs re-derived relative reg), so allow a loose match.
    assert hi[-1]["num_train"] == hf[-1]["num_train"]
    assert abs(hi[-1]["val_mse"] - hf[-1]["val_mse"]) < 0.1 * (hf[-1]["val_mse"] + 1e-6)


def test_active_relearn_hyper_updates_spec_each_round():
    """relearn_hyper warm-relearns (w0, w, b, reg) after every merge and
    full-refits with the new values. Single-chip relearn loops run the
    TRACED-hyperparameter fit: the STRUCTURE spec is fixed at the first
    learn (so every round shares one compiled program) and the learned
    Dense stds ride as the posterior's spec_params operands."""
    from nngp_tpu.gp.hyperopt import fit_kernel_hyperparams

    x, y = _toy_data(260, seed=2)
    res0 = fit_kernel_hyperparams(x[:40], y[:40], steps=15,
                                  reg_restarts=(), max_points=None)
    learner = ActiveLearner(reference_kernel(), budget=30, active_iters=2,
                            biased_sample=False, relearn_hyper=res0,
                            hyper_warm_steps=8, hyper_points=None)
    assert learner.spec is res0.spec            # adopted at construction
    assert learner.diag_reg == res0.diag_reg
    post, history = learner.active_train(
        x[:40], y[:40], x[40:200], y[40:200], x[200:], y[200:], printer=None)
    assert len(history) == 2
    assert post.num_train == 40 + 2 * 30
    assert learner._hyper is not res0           # relearned at least once
    # the STRUCTURE spec stays the object fixed at construction — that is
    # what keeps every round's programs cached...
    assert learner.spec is res0.spec
    assert post.spec is learner.spec
    # ...while the latest learned values ride as traced operands and must
    # match the newest HyperoptResult exactly
    latest = learner._hyper.spec_params()
    np.testing.assert_allclose(np.asarray(post.spec_params["w_stds"]),
                               latest["w_stds"], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(post.spec_params["b_stds"]),
                               latest["b_stds"], rtol=1e-12)
    assert learner.diag_reg == learner._hyper.diag_reg
    assert np.isfinite(history[-1]["val_mse"])


def test_active_relearn_hyper_over_mesh():
    """relearn composes with the distributed regime: each round relearns,
    then full-refits the row-sharded posterior with the new spec."""
    from nngp_tpu.gp.hyperopt import fit_kernel_hyperparams
    from nngp_tpu.parallel import make_mesh

    x, y = _toy_data(200, seed=7)
    res0 = fit_kernel_hyperparams(x[:40], y[:40], steps=12,
                                  reg_restarts=(), max_points=None)
    learner = ActiveLearner(reference_kernel(), budget=20, active_iters=1,
                            biased_sample=False, relearn_hyper=res0,
                            hyper_warm_steps=6, hyper_points=None,
                            mesh=make_mesh())
    post, history = learner.active_train(
        x[:40], y[:40], x[40:160], y[40:160], x[160:], y[160:],
        printer=None)
    assert len(history) == 1 and np.isfinite(history[0]["val_mse"])
    assert post.num_train == 60
    assert learner._hyper is not res0
    assert post.spec is learner.spec        # sharded refit got the new spec


def test_active_relearn_hyper_cold_start_and_ard_scaling():
    """relearn_hyper=True cold-learns on the initial split; with ARD the
    learner owns the feature scaling (raw inputs in, scaled Gram inside) —
    test() on raw x_val must match predicting manually scaled features."""
    x, y = _toy_data(220, seed=5)
    learner = ActiveLearner(reference_kernel(), budget=25, active_iters=1,
                            biased_sample=False, relearn_hyper=True,
                            hyper_warm_steps=6, hyper_points=None,
                            hyper_ard=True)
    # shrink the cold learn for test speed
    import nngp_tpu.gp.hyperopt as ho
    orig = ho.fit_kernel_hyperparams

    def quick(xx, yy, **kw):
        kw.setdefault("steps", 10)
        kw["reg_restarts"] = ()
        return orig(xx, yy, **kw)

    import unittest.mock as mock
    with mock.patch.object(ho, "fit_kernel_hyperparams", quick):
        post, history = learner.active_train(
            x[:40], y[:40], x[40:180], y[40:180], x[180:], y[180:],
            printer=None)
    assert learner._hyper is not None
    assert learner._hyper.feature_scale is not None      # ARD mode
    mean_raw, _ = post.predict_mean_std(learner._hscale(x[180:]))
    mse = learner.test(post, x[180:], y[180:], printer=None)
    manual = float(np.mean((np.asarray(mean_raw).ravel()
                            - y[180:].ravel()) ** 2))
    np.testing.assert_allclose(mse, manual, rtol=1e-12)


# ---------------------------------------------------------------- serving
def _toy_schema_files(tmp_path):
    """Synthetic 2-table schema + query files in the multi-join grammar."""
    ta = TableStats("ta", (
        ColumnStats("id", "numerical", 0, 100),
        ColumnStats("x", "numerical", -10, 10),
    ), chunk_size=8)
    tb = TableStats("tb", (
        ColumnStats("id", "numerical", 0, 100),
        ColumnStats("y", "numerical", 0, 1),
    ), chunk_size=8)
    qdir = tmp_path / "queries"
    qdir.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for _ in range(60):
        xu = rng.uniform(-10, 10)
        xl = rng.uniform(-10, xu)
        card = max(1, int(1000 * (xu - xl)))
        lines.append(f"ta,tb@x,{xu:.3f},{xl:.3f}@@ta,tb,id@{card}")
    (qdir / "join_query_2.txt").write_text("\n".join(lines) + "\n")
    return [ta, tb], str(qdir)


def test_estimator_predict_and_checkpoint_roundtrip(tmp_path):
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", data_path=None, train_query_path=qdir,
                    stats=stats, dtype=np.float64, verbose=False)
    est.load_model(verbose=False)
    lines = ["ta,tb@x,5.0,-5.0@@ta,tb,id",
             "ta,tb@@y,0.9,0.1@ta,tb,id"]
    mean, std = est.predict(lines)
    assert mean.shape == (2,) and std.shape == (2,)
    assert np.all(np.isfinite(mean)) and np.all(std >= 0)

    ckpt = tmp_path / "ckpt"
    est.save(str(ckpt))
    est2 = Estimator.restore(str(ckpt))
    mean2, std2 = est2.predict(lines)
    np.testing.assert_allclose(mean2, mean, rtol=1e-12)
    np.testing.assert_allclose(std2, std, rtol=1e-12)


def test_estimator_aux_threshold(tmp_path):
    stats, qdir = _toy_schema_files(tmp_path)
    import os
    with open(os.path.join(qdir, "join_query_aux.txt"), "w") as f:
        f.write("ta,tb@x,1.0,0.0@@ta,tb,id@500@200.0@0.1\n")   # kept (q_error)
        f.write("ta,tb@x,2.0,0.0@@ta,tb,id@900@1.0@0.0\n")     # dropped
    est_aux = Estimator("toy", None, qdir, stats=stats, use_aux=True,
                        dtype=np.float64, verbose=False)
    est_no = Estimator("toy", None, qdir, stats=stats, use_aux=False,
                       dtype=np.float64, verbose=False)
    assert est_aux.posterior.num_train == est_no.posterior.num_train + 1


def test_feedback_merge():
    infos = [
        PredInfo("q1", nngp_card=200.0, nngp_std=2.0, pg_card=1.0, true_card=100.0),
        PredInfo("q2", nngp_card=50.0, nngp_std=1.0, pg_card=1.0, true_card=-1.0),
    ]
    rows = ["ta,tb@x,1,0@@ta,tb,id@100\n", "ta,tb@x,2,0@@ta,tb,id@400\n"]
    lines = merge_query_res(infos, rows)
    assert len(lines) == 2
    q1 = lines[0].split("@")
    assert q1[-3] == "100"               # true card preserved
    assert float(q1[-2]) == pytest.approx(2.0)   # q_error = 200/100
    assert float(q1[-1]) == pytest.approx(2.0 / np.log2(200.0))
    # csv true_card <= 0 skips the consistency assert
    assert float(lines[1].split("@")[-2]) == pytest.approx(8.0)  # 400/50


def test_estimator_online_extend(tmp_path):
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False)
    n0 = est.posterior.num_train
    added = est.extend_with_lines([
        "ta,tb@x,3.0,1.0@@ta,tb,id@2000",
        "ta,tb@x,8.0,2.0@@ta,tb,id@6000",
    ])
    assert added == 2
    assert est.posterior.num_train == n0 + 2
    mean, std = est.predict(["ta,tb@x,3.0,1.0@@ta,tb,id"])
    # the freshly-taught point should now be predicted near its label
    assert abs(float(mean[0]) - np.log2(2000)) < 1.0


def test_checkpoint_preserves_custom_spec(tmp_path):
    """Regression: restore() used to default to reference_kernel(), silently
    mismatching checkpoints saved with a custom architecture."""
    from nngp_tpu.models.kernel_spec import KernelSpec, mlp
    stats, qdir = _toy_schema_files(tmp_path)
    spec = KernelSpec(mlp(depth=2, width=64, activation="erf"))
    est = Estimator("toy", None, qdir, stats=stats, spec=spec,
                    dtype=np.float64, verbose=False)
    lines = ["ta,tb@x,5.0,-5.0@@ta,tb,id"]
    mean, std = est.predict(lines)
    ckpt = tmp_path / "spec_ckpt"
    est.save(str(ckpt))
    est2 = Estimator.restore(str(ckpt))
    assert est2.spec == spec
    mean2, std2 = est2.predict(lines)
    np.testing.assert_allclose(mean2, mean, rtol=1e-12)
    np.testing.assert_allclose(std2, std, rtol=1e-12)


def test_extend_with_lines_rejects_bad_cards(tmp_path):
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False)
    before = est.posterior
    with pytest.raises(ValueError, match="card >= 1"):
        est.extend_with_lines(["ta,tb@x,3.0,1.0@@ta,tb,id@0"])
    assert est.posterior is before  # live model untouched


def test_estimator_distributed_mesh(tmp_path):
    """Estimator(mesh=...) serves from the row-sharded distributed posterior:
    predictions match the single-device estimator, checkpoints roundtrip
    through re-sharding, and extend_with_lines refits over the mesh."""
    from nngp_tpu.parallel import DistributedPosterior, make_mesh

    ta = TableStats("ta", (
        ColumnStats("id", "numerical", 0, 100),
        ColumnStats("x", "numerical", -10, 10),
    ), chunk_size=8)
    tb = TableStats("tb", (
        ColumnStats("id", "numerical", 0, 100),
        ColumnStats("y", "numerical", 0, 1),
    ), chunk_size=8)
    qdir = tmp_path / "queries"
    qdir.mkdir()
    rng = np.random.default_rng(3)
    lines = []
    for _ in range(61):  # ragged on purpose: pads to the p*b=32 quantum
        xu = rng.uniform(-10, 10)
        xl = rng.uniform(-10, xu)
        card = max(1, int(1000 * (xu - xl)))
        lines.append(f"ta,tb@x,{xu:.3f},{xl:.3f}@@ta,tb,id@{card}")
    (qdir / "join_query_2.txt").write_text("\n".join(lines) + "\n")

    mesh = make_mesh()
    est_d = Estimator("toy", None, str(qdir), stats=[ta, tb],
                      dtype=np.float64, verbose=False, mesh=mesh,
                      dist_block_size=4)
    est_s = Estimator("toy", None, str(qdir), stats=[ta, tb],
                      dtype=np.float64, verbose=False)
    assert isinstance(est_d.posterior, DistributedPosterior)

    test_lines = ["ta,tb@x,5.0,-5.0@@ta,tb,id",
                  "ta,tb@@y,0.9,0.1@ta,tb,id"]
    mean_d, std_d = est_d.predict(test_lines)
    mean_s, std_s = est_s.predict(test_lines)
    np.testing.assert_allclose(mean_d, mean_s, rtol=1e-8)
    np.testing.assert_allclose(std_d, std_s, rtol=1e-6, atol=1e-10)

    # checkpoint roundtrip re-shards over the mesh
    ckpt = tmp_path / "ckpt_dist"
    est_d.save(str(ckpt))
    with pytest.raises(ValueError, match="mesh"):
        Estimator.restore(str(ckpt))
    est_r = Estimator.restore(str(ckpt), mesh=mesh)
    mean_r, std_r = est_r.predict(test_lines)
    np.testing.assert_allclose(mean_r, mean_d, rtol=1e-12)
    np.testing.assert_allclose(std_r, std_d, rtol=1e-12)

    # online labeled feedback at a ragged size (61 + 29 = 90 -> pads to 96)
    new_lines = []
    for _ in range(29):
        xu = rng.uniform(-10, 10)
        xl = rng.uniform(-10, xu)
        card = max(1, int(1000 * (xu - xl)))
        new_lines.append(f"ta,tb@x,{xu:.3f},{xl:.3f}@@ta,tb,id@{card}")
    added = est_d.extend_with_lines(new_lines)
    assert added == 29
    assert est_d.posterior.num_train == 90
    mean_e, std_e = est_d.predict(test_lines)
    assert np.all(np.isfinite(mean_e)) and np.all(std_e >= 0)


def test_estimator_block_factor_checkpoint_and_extend(tmp_path, monkeypatch):
    """>28k fits hold the factor as BlockLowerTriangular column blocks;
    force that path at toy scale and check validate/save/restore/extend all
    speak the block form (the dense n x n never exists on disk either)."""
    import nngp_tpu.gp.posterior as P
    from nngp_tpu.ops.linalg import BlockLowerTriangular

    monkeypatch.setattr(P, "_FUSED_FIT_MIN_N", 16)
    monkeypatch.setattr(P, "_BLOCK_LAYOUT_MIN_N", 16)
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False)
    assert isinstance(est.posterior.l, BlockLowerTriangular)
    lines = ["ta,tb@x,5.0,-5.0@@ta,tb,id"]
    mean, std = est.predict(lines)

    ckpt = tmp_path / "ckpt_blocks"
    est.save(str(ckpt))
    est2 = Estimator.restore(str(ckpt))
    assert isinstance(est2.posterior.l, BlockLowerTriangular)
    mean2, std2 = est2.predict(lines)
    np.testing.assert_allclose(mean2, mean, rtol=1e-12)
    np.testing.assert_allclose(std2, std, rtol=1e-12)

    added = est2.extend_with_lines(["ta,tb@x,3.0,1.0@@ta,tb,id@2000"])
    assert added == 1
    assert isinstance(est2.posterior.l, BlockLowerTriangular)
    m3, _ = est2.predict(["ta,tb@x,3.0,1.0@@ta,tb,id"])
    assert abs(float(m3[0]) - np.log2(2000)) < 1.0


def test_restore_single_chip_checkpoint_rejects_mesh(tmp_path):
    """Passing mesh= for a checkpoint holding a single-chip posterior must
    fail loudly instead of silently serving single-chip."""
    from nngp_tpu.parallel import make_mesh
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False)
    ckpt = tmp_path / "ckpt_single"
    est.save(str(ckpt))
    with pytest.raises(ValueError, match="single-chip"):
        Estimator.restore(str(ckpt), mesh=make_mesh())


def test_estimator_ntk_kernel_type(tmp_path):
    """Serving with get='ntk' end to end: fit, predict, checkpoint
    round-trip (k_tt travels with the model), online extend."""
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    kernel_type="ntk", verbose=False)
    assert est.posterior.k_tt_nngp is not None
    lines = ["ta,tb@x,5.0,-5.0@@ta,tb,id"]
    mean, std = est.predict(lines)
    assert np.isfinite(mean).all() and (std >= 0).all()

    ckpt = tmp_path / "ckpt_ntk"
    est.save(str(ckpt))
    est2 = Estimator.restore(str(ckpt))
    assert est2.kernel_type == "ntk"
    m2, s2 = est2.predict(lines)
    np.testing.assert_allclose(m2, mean, rtol=1e-12)
    np.testing.assert_allclose(s2, std, rtol=1e-12)

    est2.extend_with_lines(["ta,tb@x,3.0,1.0@@ta,tb,id@2000"])
    m3, _ = est2.predict(["ta,tb@x,3.0,1.0@@ta,tb,id"])
    assert abs(float(m3[0]) - np.log2(2000)) < 1.0


def test_predict_rejects_blank_lines(tmp_path):
    """One result PER LINE is the contract: blank lines must fail loudly
    instead of silently shifting every later prediction."""
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False)
    with pytest.raises(ValueError, match="blank query line at index 1"):
        est.predict(["ta,tb@x,5.0,-5.0@@ta,tb,id", "   ",
                     "ta,tb@@y,0.9,0.1@ta,tb,id"])


def test_feedback_guards_degenerate_cards():
    """nngp_card=1 (log2=0) and true_card=0 yield infinite coef_var /
    q_error instead of ZeroDivisionError (the reference crashes)."""
    infos = [
        PredInfo("q1", nngp_card=1.0, nngp_std=2.0, pg_card=1.0,
                 true_card=10.0),
        PredInfo("q2", nngp_card=50.0, nngp_std=1.0, pg_card=1.0,
                 true_card=0.0),
    ]
    rows = ["ta,tb@x,1,0@@ta,tb,id@10\n", "ta,tb@x,2,0@@ta,tb,id@0\n"]
    lines = merge_query_res(infos, rows)
    assert float(lines[0].split("@")[-1]) == np.inf     # coef_var
    assert float(lines[1].split("@")[-2]) == np.inf     # q_error


def _cat_schema_files(tmp_path):
    """2-table schema with a categorical column (exercises chunk packing)."""
    ta = TableStats("ta", (
        ColumnStats("id", "numerical", 0, 100),
        ColumnStats("x", "numerical", -10, 10),
        ColumnStats("tag", "categorical", categories=tuple(range(12))),
    ), chunk_size=8)
    tb = TableStats("tb", (
        ColumnStats("id", "numerical", 0, 100),
        ColumnStats("y", "numerical", 0, 1),
    ), chunk_size=8)
    qdir = tmp_path / "queries"
    qdir.mkdir()
    rng = np.random.default_rng(7)
    lines = []
    for _ in range(60):
        xu = rng.uniform(-10, 10)
        xl = rng.uniform(-10, xu)
        tags = sorted(rng.choice(12, size=rng.integers(1, 4), replace=False))
        tag_s = ",".join(str(t) for t in tags)
        card = max(1, int(500 * (xu - xl) + 40 * len(tags)))
        lines.append(
            f"ta,tb@x,{xu:.3f},{xl:.3f}#tag,{tag_s}@@ta,tb,id@{card}")
    (qdir / "join_query_2.txt").write_text("\n".join(lines) + "\n")
    return [ta, tb], str(qdir)


def test_estimator_chunk_norm_native_parity_and_roundtrip(tmp_path):
    """chunk_norm: the native C++ encoder's raw output post-scaled must
    match the Python encoder exactly; predictions survive a checkpoint
    roundtrip; the flag changes the model (different features)."""
    stats, qdir = _cat_schema_files(tmp_path)
    est = Estimator("toy", data_path=None, train_query_path=qdir,
                    stats=stats, dtype=np.float64, verbose=False,
                    chunk_norm=True)
    lines = ["ta,tb@x,5.0,-5.0#tag,0,3@@ta,tb,id",
             "ta,tb@tag,7@y,0.9,0.1@ta,tb,id"]
    # native vs Python encode parity under the scale
    x_active = est.encode_lines(lines)
    parsed = [est.encoder.parse_line_without_card(l) for l in lines]
    x_py = est.encoder.encode_batch(parsed, dtype=est.dtype)
    np.testing.assert_allclose(x_active, x_py, rtol=0, atol=0)
    assert x_active.max() <= 1000.0

    mean, std = est.predict(lines)
    assert np.all(np.isfinite(mean)) and np.all(std >= 0)

    ckpt = tmp_path / "ckpt_cn"
    est.save(str(ckpt))
    est2 = Estimator.restore(str(ckpt))
    assert est2.chunk_norm is True
    mean2, std2 = est2.predict(lines)
    np.testing.assert_allclose(mean2, mean, rtol=1e-12)
    np.testing.assert_allclose(std2, std, rtol=1e-12)

    # raw (reference-parity) estimator gives a DIFFERENT model
    est_raw = Estimator("toy", data_path=None, train_query_path=qdir,
                        stats=stats, dtype=np.float64, verbose=False)
    x_raw = est_raw.encode_lines(lines)
    # features differ exactly on the chunk slots (factor 1000/2^8)
    changed = x_raw != x_active
    assert changed.any()
    np.testing.assert_allclose(x_active[changed],
                               x_raw[changed] * (1000.0 / 2.0 ** 8))
    # labeled extend keeps the scale consistent on both paths
    new_lines = ["ta,tb@x,2.0,-2.0#tag,1@@ta,tb,id@777"]
    added = est.extend_with_lines(new_lines)
    assert added == 1
    m3, s3 = est.predict(lines)
    assert np.all(np.isfinite(m3)) and np.all(s3 >= 0)


# ------------------------------------------------------------- nystrom tier
@pytest.mark.parametrize("kernel_type", ["nngp", "ntk"])
def test_estimator_nystrom_serves_and_roundtrips(tmp_path, kernel_type):
    """Estimator(nystrom_m=...) fits/serves/extends/checkpoints from the
    streaming Nystrom/DTC posterior (gp/nystrom.py). With m = n the tier
    equals the exact posterior, so predictions must track the exact
    Estimator closely."""
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False, kernel_type=kernel_type, nystrom_m=60)
    est.load_model(verbose=False)
    exact = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                      verbose=False, kernel_type=kernel_type)
    lines = ["ta,tb@x,5.0,-5.0@@ta,tb,id",
             "ta,tb@@y,0.9,0.1@ta,tb,id"]
    mean, std = est.predict(lines)
    me, se = exact.predict(lines)
    np.testing.assert_allclose(mean, me, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(std, se, rtol=1e-3, atol=1e-6)

    ckpt = tmp_path / f"ny_ckpt_{kernel_type}"
    est.save(str(ckpt))
    est2 = Estimator.restore(str(ckpt))
    assert est2.nystrom_m == 60
    mean2, std2 = est2.predict(lines)
    np.testing.assert_allclose(mean2, mean, rtol=1e-12)
    np.testing.assert_allclose(std2, std, rtol=1e-12)

    # online extension folds new labels into the streamed moments exactly
    n0 = est2.posterior.num_train
    added = est2.extend_with_lines([
        "ta,tb@x,3.0,1.0@@ta,tb,id@2000",
        "ta,tb@x,8.0,2.0@@ta,tb,id@6000",
    ])
    assert added == 2 and est2.posterior.num_train == n0 + 2
    m3, s3 = est2.predict(lines)
    assert np.all(np.isfinite(m3)) and np.all(s3 >= 0)


def test_estimator_nystrom_df64_moments_roundtrip(tmp_path):
    """Estimator(nystrom_moments='df64') serves (fp32 inputs), and the
    checkpoint round-trip carries the df moment TAILS — a restore that
    dropped c_lo/b_lo would silently downgrade every later extend to
    fp32 moment precision, so the tails must survive save/restore and
    the restored extend must match the unrestored one bit-for-bit."""
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float32,
                    verbose=False, nystrom_m=60, nystrom_moments="df64")
    est.load_model(verbose=False)
    assert est.posterior.moments == "df64"
    assert est.posterior.c_lo is not None
    lines = ["ta,tb@x,5.0,-5.0@@ta,tb,id",
             "ta,tb@@y,0.9,0.1@ta,tb,id"]
    mean, std = est.predict(lines)
    assert np.all(np.isfinite(mean)) and np.all(std >= 0)

    ckpt = tmp_path / "ny_df64_ckpt"
    est.save(str(ckpt))
    est2 = Estimator.restore(str(ckpt))
    assert est2.nystrom_moments == "df64"
    assert est2.posterior.moments == "df64"
    np.testing.assert_array_equal(np.asarray(est2.posterior.c_lo),
                                  np.asarray(est.posterior.c_lo))
    # the whitening-basis tails must survive too: a restore that dropped
    # them would round W to fp32 and break the deep rank cut
    # (gp/nystrom.NystromPosterior.w_solve_lo)
    assert est.posterior.w_solve_lo is not None
    np.testing.assert_array_equal(np.asarray(est2.posterior.w_solve_lo),
                                  np.asarray(est.posterior.w_solve_lo))
    fb = ["ta,tb@x,3.0,1.0@@ta,tb,id@2000"]
    est.extend_with_lines(list(fb))
    est2.extend_with_lines(list(fb))
    np.testing.assert_array_equal(np.asarray(est2.posterior.c_raw),
                                  np.asarray(est.posterior.c_raw))
    np.testing.assert_array_equal(np.asarray(est2.posterior.c_lo),
                                  np.asarray(est.posterior.c_lo))
    m2, s2 = est2.predict(lines)
    m1, s1 = est.predict(lines)
    np.testing.assert_allclose(m2, m1, rtol=1e-12)
    np.testing.assert_allclose(s2, s1, rtol=1e-12)


def test_estimator_nystrom_forget_inverts_extend(tmp_path):
    """forget_with_lines removes exactly what extend_with_lines added (the
    exact tier refuses with a clear error)."""
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False, nystrom_m=60)
    lines_q = ["ta,tb@x,5.0,-5.0@@ta,tb,id",
               "ta,tb@@y,0.9,0.1@ta,tb,id"]
    m0, s0 = est.predict(lines_q)
    fb = ["ta,tb@x,3.0,1.0@@ta,tb,id@2000",
          "ta,tb@x,8.0,2.0@@ta,tb,id@6000"]
    n0 = est.posterior.num_train
    est.extend_with_lines(fb)
    assert est.posterior.num_train == n0 + 2
    removed = est.forget_with_lines(fb)
    assert removed == 2 and est.posterior.num_train == n0
    m1, s1 = est.predict(lines_q)
    np.testing.assert_allclose(m1, m0, rtol=1e-8)
    np.testing.assert_allclose(s1, s0, rtol=1e-8)

    exact = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                      verbose=False)
    with pytest.raises(NotImplementedError, match="Nystrom"):
        exact.forget_with_lines(fb)


def test_estimator_nystrom_over_mesh_matches_single_device(tmp_path):
    """Estimator(nystrom_m=..., mesh=...) shards the moment panels over the
    mesh; serving output matches the single-device Nystrom tier, and a
    restore with mesh reattaches sharded streaming for extends."""
    from nngp_tpu.parallel import make_mesh
    stats, qdir = _toy_schema_files(tmp_path)
    mesh = make_mesh()
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False, nystrom_m=48, mesh=mesh)
    ref = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False, nystrom_m=48)
    lines = ["ta,tb@x,5.0,-5.0@@ta,tb,id",
             "ta,tb@@y,0.9,0.1@ta,tb,id"]
    mean, std = est.predict(lines)
    m0, s0 = ref.predict(lines)
    np.testing.assert_allclose(mean, m0, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(std, s0, rtol=1e-6, atol=1e-9)

    ckpt = tmp_path / "ny_mesh_ckpt"
    est.save(str(ckpt))
    est2 = Estimator.restore(str(ckpt), mesh=mesh)
    assert est2.posterior.mesh is mesh
    n0 = est2.posterior.num_train
    added = est2.extend_with_lines([
        "ta,tb@x,3.0,1.0@@ta,tb,id@2000",
        "ta,tb@x,8.0,2.0@@ta,tb,id@6000",
    ])
    assert added == 2 and est2.posterior.num_train == n0 + 2
    assert est2.posterior.mesh is mesh
    m3, s3 = est2.predict(lines)
    assert np.all(np.isfinite(m3)) and np.all(s3 >= 0)


def test_estimator_relearn_hyperparams_exact_and_nystrom(tmp_path):
    """relearn_hyperparams warm-recalibrates the kernel on a live server:
    exact tier pulls its own train rows (spec/ridge move, serving stays
    sane); Nystrom tier requires labeled_lines and refits on them."""
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False, learn_hyper=True, hyper_steps=15,
                    hyper_points=48)
    fb = [f"ta,tb@x,{u:.1f},{u - 3:.1f}@@ta,tb,id@{int(300 * u) + 1000}"
          for u in np.linspace(2.0, 9.0, 12)]
    est.extend_with_lines(fb)
    spec0, reg0 = est.spec, est.diag_reg
    n0 = est.posterior.num_train
    ev = est.relearn_hyperparams(steps=10, verbose=False)
    assert np.isfinite(ev)
    assert est.spec is not spec0            # relearned + refit
    assert est.diag_reg != reg0
    assert est.posterior.num_train == n0    # same train set, new kernel
    mean, std = est.predict(["ta,tb@x,5.0,-5.0@@ta,tb,id"])
    assert np.all(np.isfinite(mean)) and np.all(std >= 0)

    ny = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                   verbose=False, nystrom_m=40)
    with pytest.raises(ValueError, match="labeled_lines"):
        ny.relearn_hyperparams(verbose=False)
    train_lines = (qdir + "/join_query_2.txt")
    with open(train_lines) as fh:
        lines = [ln for ln in fh.read().splitlines() if ln.strip()]
    ev2 = ny.relearn_hyperparams(labeled_lines=lines + fb, steps=10,
                                 verbose=False)
    assert np.isfinite(ev2)
    assert ny.posterior.num_train == len(lines) + len(fb)
    m2, s2 = ny.predict(["ta,tb@x,5.0,-5.0@@ta,tb,id"])
    assert np.all(np.isfinite(m2)) and np.all(s2 >= 0)


def test_estimator_relearn_hyperparams_preserves_ard_scaling(tmp_path):
    """With an active ARD feature scale the relearn must round-trip raw
    units exactly: learn on raw features, reapply the NEW scale on refit,
    and keep every serving surface consistent."""
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False, learn_hyper=True, hyper_steps=12,
                    hyper_points=48, hyper_ard=True)
    s_old = est.feature_scale.copy()
    est.relearn_hyperparams(steps=8, verbose=False)
    s_new = est.feature_scale
    assert s_new is not None and s_new.shape == s_old.shape
    # serving encode applies the NEW scale; posterior was fit with it too
    lines = ["ta,tb@x,5.0,-5.0@@ta,tb,id"]
    x_enc = est.encode_lines(lines)
    mean, std = est.predict(lines)
    m_direct, _ = est.posterior.predict_mean_std(x_enc)
    np.testing.assert_allclose(np.asarray(mean).ravel(),
                               np.asarray(m_direct).ravel(), rtol=1e-8)
    assert np.all(np.isfinite(mean)) and np.all(std >= 0)


def test_estimator_learn_hyper_and_checkpoint(tmp_path):
    """Estimator(learn_hyper=True) fits with MLL-learned (w0, w, b, reg)
    (gp/hyperopt.py) and the learned spec survives checkpoint restore."""
    from nngp_tpu.models.kernel_spec import Dense

    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False, learn_hyper=True, hyper_steps=25,
                    hyper_points=48)
    denses = [l for l in est.spec.layers if isinstance(l, Dense)]
    # learned values moved off the reference defaults (w=1, b=0, reg=1e-3)
    assert denses[0].b_std > 0.0
    assert est.diag_reg != 1e-3
    lines = ["ta,tb@x,5.0,-5.0@@ta,tb,id"]
    mean, std = est.predict(lines)
    assert np.all(np.isfinite(mean)) and np.all(std >= 0)

    ckpt = tmp_path / "hyper_ckpt"
    est.save(str(ckpt))
    est2 = Estimator.restore(str(ckpt))
    assert [(l.w_std, l.b_std) for l in est2.spec.layers
            if isinstance(l, Dense)] == [(l.w_std, l.b_std) for l in denses]
    m2, s2 = est2.predict(lines)
    np.testing.assert_allclose(m2, mean, rtol=1e-12)
    np.testing.assert_allclose(s2, std, rtol=1e-12)


def test_estimator_ard_feature_scale_roundtrip(tmp_path):
    """Estimator(learn_hyper=True, hyper_ard=True) learns a per-feature
    input scale and applies it CONSISTENTLY on every surface: the fit, the
    serving encode, the online extend, and across checkpoint restore — a
    dropped scale on any one path would silently mis-scale its Gram."""
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False, learn_hyper=True, hyper_steps=20,
                    hyper_points=48, hyper_ard=True)
    raw = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False)
    s = est.feature_scale
    assert s is not None and s.shape == (raw.posterior.x_train.shape[1],)
    assert np.all(s > 0)
    lines = ["ta,tb@x,5.0,-5.0@@ta,tb,id"]
    # serving encode carries the learned scale (vs the unscaled estimator)
    np.testing.assert_allclose(est.encode_lines(lines),
                               raw.encode_lines(lines) * s, rtol=1e-12)
    mean, std = est.predict(lines)
    assert np.all(np.isfinite(mean)) and np.all(std >= 0)

    ckpt = tmp_path / "ard_ckpt"
    est.save(str(ckpt))
    est2 = Estimator.restore(str(ckpt))
    np.testing.assert_allclose(est2.feature_scale, s, rtol=1e-12)
    m2, s2 = est2.predict(lines)
    np.testing.assert_allclose(m2, mean, rtol=1e-12)
    np.testing.assert_allclose(s2, std, rtol=1e-12)
    # online extend encodes through the same scale: both estimators fold in
    # the same labeled line and keep agreeing exactly
    labeled = ["ta,tb@x,3.0,1.0@@ta,tb,id@2000"]
    est.extend_with_lines(labeled)
    est2.extend_with_lines(labeled)
    np.testing.assert_allclose(
        np.asarray(est2.posterior.x_train[-1]),
        np.asarray(est.posterior.x_train[-1]), rtol=1e-12)
    m3, _ = est.predict(lines)
    m4, _ = est2.predict(lines)
    np.testing.assert_allclose(m4, m3, rtol=1e-10)
    # hyper_ard without learn_hyper is a configuration error
    with pytest.raises(ValueError, match="learn_hyper"):
        Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                  verbose=False, hyper_ard=True)


def test_estimator_hyper_objective_auto_routes_to_dtc(tmp_path, monkeypatch):
    """Estimator(learn_hyper=True) learns against the evidence of the tier
    it will SERVE: nystrom_m set -> objective='dtc' (the exact-GP optimum
    measurably loses on the served Nystrom tier, BASELINE.md 90k row);
    exact posterior -> 'exact'; an explicit hyper_objective overrides."""
    import nngp_tpu.gp.hyperopt as hyperopt_mod

    stats, qdir = _toy_schema_files(tmp_path)
    seen = []
    real = hyperopt_mod.fit_kernel_hyperparams

    def spy(*a, **kw):
        seen.append(kw.get("objective", "exact"))
        return real(*a, **kw)

    monkeypatch.setattr(hyperopt_mod, "fit_kernel_hyperparams", spy)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False, learn_hyper=True, hyper_steps=10,
                    hyper_points=48, nystrom_m=16)
    assert seen == ["dtc"]
    mean, std = est.predict(["ta,tb@x,5.0,-5.0@@ta,tb,id"])
    assert np.all(np.isfinite(mean)) and np.all(std >= 0)
    Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
              verbose=False, learn_hyper=True, hyper_steps=10,
              hyper_points=48)
    assert seen == ["dtc", "exact"]
    Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
              verbose=False, learn_hyper=True, hyper_steps=10,
              hyper_points=48, nystrom_m=16, hyper_objective="exact")
    assert seen == ["dtc", "exact", "exact"]


def test_estimator_learn_hyper_guards(tmp_path):
    from nngp_tpu.models.kernel_spec import Dense, KernelSpec

    stats, qdir = _toy_schema_files(tmp_path)
    # non-mlp-shaped spec is rejected up front
    with pytest.raises(ValueError, match="mlp-shaped"):
        Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                  verbose=False, learn_hyper=True,
                  spec=KernelSpec((Dense(1, 1.0, 0.0),)))
    # fp32-unsafe feature magnitudes (raw packed chunks) are rejected with
    # a chunk_norm pointer instead of overflowing the squared Gram
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False)
    with pytest.raises(ValueError, match="chunk_norm"):
        est._learn_hyperparams(np.array([[2.0 ** 30]]), np.zeros((1, 1)),
                               steps=1, max_points=8, verbose=False)


def test_estimator_calibrate_and_conformal_intervals(tmp_path):
    """calibrate_uncertainty fits the MLE std scale + conformal score set on
    held-out lines; predict serves recalibrated std, predict_interval gives
    >= 1-alpha coverage, and both artifacts ride through checkpoints."""
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False)

    def make_lines(seed, n):
        rng = np.random.default_rng(seed)
        labeled, cards = [], []
        for _ in range(n):
            xu = rng.uniform(-10, 10)
            xl = rng.uniform(-10, xu)
            card = max(1, int(1000 * (xu - xl)))
            labeled.append(f"ta,tb@x,{xu:.3f},{xl:.3f}@@ta,tb,id@{card}")
            cards.append(card)
        return labeled, np.asarray(cards, np.float64)

    with pytest.raises(ValueError):
        est.predict_interval(["ta,tb@x,5.0,-5.0@@ta,tb,id"])

    cal_lines, _ = make_lines(101, 80)
    scale = est.calibrate_uncertainty(cal_lines, verbose=False)
    assert np.isfinite(scale) and scale > 0
    assert est.std_scale == scale

    test_labeled, test_cards = make_lines(202, 60)
    test_cardless = [l.rsplit("@", 1)[0] for l in test_labeled]
    mean_raw, std_raw = est._predict_raw(test_cardless)
    mean, std = est.predict(test_cardless)
    np.testing.assert_allclose(std, std_raw * scale, rtol=1e-12)
    np.testing.assert_allclose(mean, mean_raw, rtol=1e-12)

    alpha = 0.2
    m, lo, hi = est.predict_interval(test_cardless, alpha=alpha)
    assert np.all(lo <= m) and np.all(m <= hi)
    y_true = np.log2(test_cards)
    coverage = np.mean((y_true >= lo) & (y_true <= hi))
    assert coverage >= 1 - alpha - 0.1   # finite-n slack on 60 queries

    ckpt = tmp_path / "cal_ckpt"
    est.save(str(ckpt))
    est2 = Estimator.restore(str(ckpt))
    assert est2.std_scale == est.std_scale
    m2, lo2, hi2 = est2.predict_interval(test_cardless, alpha=alpha)
    np.testing.assert_allclose(lo2, lo, rtol=1e-10)
    np.testing.assert_allclose(hi2, hi, rtol=1e-10)
    mean2, std2 = est2.predict(test_cardless)
    np.testing.assert_allclose(std2, std, rtol=1e-10)


def test_estimator_preloaded_hyper_artifact(tmp_path):
    """Estimator(learn_hyper=<HyperoptResult>) installs an already-learned
    artifact (spec + ridge + ARD scale) without re-learning, serving
    identically to the estimator that learned it; a scale learned on the
    wrong feature layout is rejected loudly."""
    import dataclasses

    from nngp_tpu.gp.hyperopt import HyperoptResult

    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False, learn_hyper=True, hyper_steps=12,
                    hyper_points=48, hyper_ard=True)
    assert est.hyper_result is not None
    path = tmp_path / "hyper.json"
    est.hyper_result.save(str(path))

    res = HyperoptResult.load(str(path))
    est2 = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                     verbose=False, learn_hyper=res)
    assert est2.hyper_result is res
    np.testing.assert_array_equal(est2.feature_scale, est.feature_scale)
    assert est2.diag_reg == est.diag_reg
    lines = ["ta,tb@x,5.0,-5.0@@ta,tb,id"]
    m1, s1 = est.predict(lines)
    m2, s2 = est2.predict(lines)
    np.testing.assert_allclose(m2, m1, rtol=1e-12)
    np.testing.assert_allclose(s2, s1, rtol=1e-12)

    bad = dataclasses.replace(res, feature_scale=np.ones(3))
    with pytest.raises(ValueError, match="features"):
        Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                  verbose=False, learn_hyper=bad)


def test_estimator_grow_inducing(tmp_path):
    """Estimator.grow_inducing enlarges the Nystrom tier's capacity from
    the training log: m grows, predictions move toward the exact tier,
    the checkpoint round-trips the grown set, and the exact tier refuses
    with a clear error."""
    stats, qdir = _toy_schema_files(tmp_path)
    train_lines = [ln for ln in
                   (tmp_path / "queries" / "join_query_2.txt")
                   .read_text().splitlines() if ln.strip()]
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False, nystrom_m=12)
    est.load_model(verbose=False)
    lines_q = ["ta,tb@x,5.0,-5.0@@ta,tb,id",
               "ta,tb@@y,0.9,0.1@ta,tb,id"]
    exact = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                      verbose=False)
    me, _ = exact.predict(lines_q)
    m_small, _ = est.predict(lines_q)
    elbo0 = est.posterior.elbo()

    m_new = est.grow_inducing(train_lines, num_new=48, seed=0)
    assert m_new == 60 and est.nystrom_m == 60
    assert est.posterior.num_train == len(train_lines)
    assert est.posterior.elbo() >= elbo0 - 1e-6 * abs(elbo0)
    m_big, _ = est.predict(lines_q)
    # the uniform picks overlap the original 12, so the grown set is NOT
    # the whole train set — assert it moved decisively toward exact
    assert (np.abs(m_big - me).max() < 0.5 * np.abs(m_small - me).max())

    ckpt = tmp_path / "grow_ckpt"
    est.save(str(ckpt))
    est2 = Estimator.restore(str(ckpt))
    assert est2.nystrom_m == 60
    m2, _ = est2.predict(lines_q)
    np.testing.assert_allclose(m2, m_big, rtol=1e-12)

    with pytest.raises(NotImplementedError, match="Nystrom"):
        exact.grow_inducing(train_lines)


def test_artifact_kernel_type_mismatch_rejected(tmp_path):
    """An artifact that maximized the ntk evidence cannot install into an
    nngp server (and vice versa) — silent wrong-model hypers degrade every
    prediction with no other diagnostic."""
    import dataclasses as _dc
    from nngp_tpu.gp.hyperopt import HyperoptResult

    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False, learn_hyper=True, hyper_steps=5,
                    hyper_points=32)
    bad = _dc.replace(est.hyper_result, get="ntk")
    with pytest.raises(ValueError, match="ntk"):
        Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                  verbose=False, learn_hyper=bad)
    # scalar artifact learned on a different feature width is rejected too
    bad2 = _dc.replace(est.hyper_result, num_features=3)
    with pytest.raises(ValueError, match="features"):
        Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                  verbose=False, learn_hyper=bad2)
    # hyper_ard=True with a scalar artifact must not silently vanish
    with pytest.raises(ValueError, match="scalar"):
        Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                  verbose=False, learn_hyper=est.hyper_result,
                  hyper_ard=True)


def test_relearn_rolls_back_on_any_failure(tmp_path):
    """A tunnel outage / OOM mid-refit (any exception, not just a NaN
    factor) must leave the OLD spec/ridge/scale/posterior installed — a
    half-installed relearn serves silently wrong numbers."""
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False)
    old = (est.spec, est.diag_reg, est.feature_scale, est.posterior)
    orig_fit = est._fit

    def boom(x, y):
        raise RuntimeError("tunnel went away")

    est._fit = boom
    with pytest.raises(RuntimeError, match="tunnel"):
        est.relearn_hyperparams(steps=3, max_points=32, verbose=False)
    est._fit = orig_fit
    assert (est.spec, est.diag_reg, est.feature_scale,
            est.posterior) == old
    # and the server still serves
    m, s = est.predict(["ta,tb@x,5.0,-5.0@@ta,tb,id"])
    assert np.isfinite(m).all() and np.isfinite(s).all()


# ---------------------------------------------------------------------------
# Prediction memo / within-batch dedup
# ---------------------------------------------------------------------------

def _counting_bucketed(est):
    """Wrap est._bucketed_predict to count device dispatches + rows."""
    calls = {"n": 0, "rows": 0}
    orig = est._bucketed_predict

    def wrapped(x):
        calls["n"] += 1
        calls["rows"] += x.shape[0]
        return orig(x)

    est._bucketed_predict = wrapped
    return calls


def test_predict_dedup_matches_plain_and_skips_repeats(tmp_path):
    """Duplicate lines in a batch are predicted once and repeats across
    calls never reach the device — with bit-identical results to the
    uncached path (row-wise predict is batch-shape independent)."""
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False)
    plain = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                      verbose=False, predict_cache_size=0)
    uniq = ["ta,tb@x,5.0,-5.0@@ta,tb,id",
            "ta,tb@@y,0.9,0.1@ta,tb,id",
            "ta,tb@x,2.0,0.0@@ta,tb,id"]
    batch = [uniq[0], uniq[1], uniq[0], uniq[2], uniq[1], uniq[0]]
    m_ref, s_ref = plain._bucketed_predict(plain.encode_lines(batch))

    calls = _counting_bucketed(est)
    m, s = est.predict(batch)
    np.testing.assert_array_equal(m, m_ref)
    np.testing.assert_array_equal(s, s_ref)
    assert calls["n"] == 1 and len(est._pred_cache) == 3

    # repeat call: pure cache, zero dispatches, same answers
    m2, s2 = est.predict(batch)
    assert calls["n"] == 1
    np.testing.assert_array_equal(m2, m)
    np.testing.assert_array_equal(s2, s)

    # a mixed batch only dispatches the genuinely new line
    m3, _ = est.predict([uniq[0], "ta,tb@x,9.0,8.0@@ta,tb,id"])
    assert calls["n"] == 2
    assert m3[0] == m[0]


def test_predict_cache_invalidated_on_posterior_change(tmp_path):
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False)
    line = "ta,tb@x,3.0,1.0@@ta,tb,id"
    m0, _ = est.predict([line])
    assert len(est._pred_cache) == 1
    est.extend_with_lines([line + "@2000"])
    assert len(est._pred_cache) == 0           # stale memo dropped
    m1, _ = est.predict([line])
    assert abs(float(m1[0]) - np.log2(2000)) < 1.0
    assert m1[0] != m0[0]                      # new model, new answer


def test_predict_cache_capacity_and_disable(tmp_path):
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False, predict_cache_size=2)
    lines = [f"ta,tb@x,{v}.0,0.0@@ta,tb,id" for v in range(1, 5)]
    est.predict(lines)
    assert len(est._pred_cache) == 2           # bounded, oldest evicted

    est0 = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                     verbose=False, predict_cache_size=0)
    calls = _counting_bucketed(est0)
    est0.predict([lines[0], lines[0], lines[1]])
    assert len(est0._pred_cache) == 0          # nothing retained
    assert calls["rows"] >= 2                  # but dedup still batched once
    assert calls["n"] == 1
    est0.predict([lines[0]])
    assert calls["n"] == 2                     # cap=0 really disables memo


def test_predict_cache_respects_recalibration(tmp_path):
    """The memo stores RAW std — a later calibrate_uncertainty must rescale
    cached entries on the next predict, not serve the old scale."""
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False)
    line = "ta,tb@x,5.0,-5.0@@ta,tb,id"
    _, s_raw = est.predict([line])
    est.std_scale = 2.5                        # stand-in for calibrate
    _, s_cal = est.predict([line])
    np.testing.assert_allclose(s_cal, 2.5 * s_raw)


def test_warmup_precompiles_buckets_without_side_effects(tmp_path):
    """warmup() must touch every power-of-two bucket through the real
    predict path and leave the estimator's state (posterior, memo, drift
    monitor) untouched — it exists to pay serving compiles before traffic
    (serve_demo --listen runs it before accepting connections)."""
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False)
    est.load_model(verbose=False)
    lines = ["ta,tb@x,5.0,-5.0@@ta,tb,id"]
    before_mean, before_std = est.predict(lines)
    post_before = est.posterior

    seen = []
    orig = est._bucketed_predict

    def spy(x):
        seen.append(x.shape[0])
        return orig(x)

    est._bucketed_predict = spy
    buckets = est.warmup(max_batch=256, verbose=False)
    est._bucketed_predict = orig

    assert buckets == [64, 128, 256]
    assert seen == [64, 128, 256]
    assert est.posterior is post_before            # read-only
    mean, std = est.predict(lines)                 # predictions unchanged
    np.testing.assert_allclose(mean, before_mean, rtol=1e-12)
    np.testing.assert_allclose(std, before_std, rtol=1e-12)


def test_active_padded_rounds_match_dense():
    """pad_acquisitions: shape-stable rounds (fit_gp pad_to + in-place
    extends) must produce the same posterior trajectory as the dense
    incremental learner — identical selections (same seed) and matching
    val predictions — while the factor storage never changes shape."""
    x, y = _toy_data(300, seed=3)
    common = dict(budget=40, active_iters=3, biased_sample=False,
                  refit="incremental", seed=11)
    dense = ActiveLearner(reference_kernel(), **common)
    padded = ActiveLearner(reference_kernel(), pad_acquisitions=True,
                           **common)
    post_d, hist_d = dense.active_train(
        x[:30], y[:30], x[30:240], y[30:240], x[240:], y[240:], printer=None)
    post_p, hist_p = padded.active_train(
        x[:30], y[:30], x[30:240], y[30:240], x[240:], y[240:], printer=None)
    assert post_p.n_real is not None
    assert post_p.num_padded == 30 + 3 * 40      # allocated once up front
    assert post_p.num_train == post_d.num_train == 150
    for hd, hp in zip(hist_d, hist_p):
        assert hd["num_train"] == hp["num_train"]
        np.testing.assert_allclose(hp["val_mse"], hd["val_mse"],
                                   rtol=1e-6, atol=1e-9)
    m_d, s_d = post_d.predict_mean_std(jnp.asarray(x[240:]))
    m_p, s_p = post_p.predict_mean_std(jnp.asarray(x[240:]))
    np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_d),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_d),
                               rtol=1e-5, atol=1e-9)


def test_active_padded_guards():
    import pytest as _pytest
    with _pytest.raises(ValueError, match="pad_acquisitions"):
        ActiveLearner(reference_kernel(), nystrom_m=32,
                      pad_acquisitions=True)
    with _pytest.raises(ValueError, match="pad_acquisitions"):
        ActiveLearner(reference_kernel(), kernel_type="ntk",
                      pad_acquisitions=True)


def test_estimator_pad_slots_online_serving(tmp_path):
    """Estimator(pad_slots=...): online extends bucket into in-place
    appends (no shape change), parity with the dense estimator, and the
    padded posterior survives a checkpoint round-trip with its remaining
    slots usable."""
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False, pad_slots=200)
    ref = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False)
    n0 = est.posterior.num_train
    cap = est.posterior.num_padded
    assert cap == n0 + 200 and est.posterior.n_real is not None
    lines = ["ta,tb@x,3.0,1.0@@ta,tb,id@2000",
             "ta,tb@x,8.0,2.0@@ta,tb,id@6000",
             "ta,tb@x,6.0,-1.0@@ta,tb,id@4500"]
    est.extend_with_lines(lines)
    ref.extend_with_lines(lines)
    assert est.posterior.num_train == n0 + 3
    assert est.posterior.num_padded == cap          # no shape change
    q = ["ta,tb@x,3.0,1.0@@ta,tb,id", "ta,tb@x,7.5,0.5@@ta,tb,id"]
    m_p, s_p = est.predict(q)
    m_d, s_d = ref.predict(q)
    np.testing.assert_allclose(m_p, m_d, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(s_p, s_d, rtol=1e-7, atol=1e-9)

    ckpt = tmp_path / "padded_ckpt"
    est.save(str(ckpt))
    est2 = Estimator.restore(str(ckpt))
    assert est2.posterior.num_train == n0 + 3
    assert est2.posterior.num_padded == cap         # padding survived
    m_r, s_r = est2.predict(q)
    np.testing.assert_allclose(m_r, m_p, rtol=1e-12)
    np.testing.assert_allclose(s_r, s_p, rtol=1e-12)
    # restored estimator keeps bucket-extending into the remaining slots
    est2.extend_with_lines(["ta,tb@x,4.0,0.0@@ta,tb,id@3000"])
    assert est2.posterior.num_train == n0 + 4
    assert est2.posterior.num_padded == cap

    # relearn on a padded posterior must read only the REAL rows
    est2.relearn_hyperparams(steps=5, verbose=False)
    assert est2.posterior.num_train == n0 + 4


def test_estimator_pad_slots_guards(tmp_path):
    stats, qdir = _toy_schema_files(tmp_path)
    with pytest.raises(ValueError, match="pad_slots"):
        Estimator("toy", None, qdir, stats=stats, verbose=False,
                  nystrom_m=32, pad_slots=100)
    with pytest.raises(ValueError, match="pad_slots"):
        Estimator("toy", None, qdir, stats=stats, verbose=False,
                  kernel_type="ntk", pad_slots=100)


def test_estimator_calibrate_frac_holdout(tmp_path):
    """Estimator(calibrate_frac=...) holds out a seeded fraction of the
    training queries, fits on the rest, and auto-calibrates: the MLE std
    temperature applies to every later predict, the conformal score set
    enables predict_interval without an explicit calibrate call, and both
    artifacts ride checkpoints."""
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False, calibrate_frac=0.2)
    base = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                     verbose=False)
    # the holdout really is excluded from the fit
    assert est.posterior.num_train < base.posterior.num_train
    assert est.std_scale != 1.0
    assert est._conformal_scores is not None
    lines = ["ta,tb@x,5.0,-5.0@@ta,tb,id"]
    _, std_cal = est.predict(lines)
    mean, lo, hi = est.predict_interval(lines, alpha=0.2)
    assert np.all(lo <= mean) and np.all(mean <= hi)

    ckpt = tmp_path / "cal_ckpt"
    est.save(str(ckpt))
    est2 = Estimator.restore(str(ckpt))
    assert est2.std_scale == pytest.approx(est.std_scale)
    m2, lo2, hi2 = est2.predict_interval(lines, alpha=0.2)
    np.testing.assert_allclose(lo2, lo, rtol=1e-12)
    np.testing.assert_allclose(hi2, hi, rtol=1e-12)


def test_estimator_quality_best_routes_decision_table(tmp_path):
    """quality='best' fills unset flags from the measured decision table
    (BASELINE.md): chunk_norm on, ARD evidence-learned hypers, calibration
    holdout — while explicit flags still win."""
    import unittest.mock as mock
    import nngp_tpu.gp.hyperopt as ho
    stats, qdir = _toy_schema_files(tmp_path)
    orig = ho.fit_kernel_hyperparams

    def quick(xx, yy, **kw):
        kw["steps"] = 5
        kw["reg_restarts"] = ()
        return orig(xx, yy, **kw)

    with mock.patch.object(ho, "fit_kernel_hyperparams", quick):
        est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                        verbose=False, quality="best", hyper_points=48)
    assert est.chunk_norm is True
    assert est.hyper_result is not None
    assert est.feature_scale is not None        # ARD mode
    assert est.std_scale != 1.0                 # auto-calibrated
    assert est._conformal_scores is not None
    lines = ["ta,tb@x,5.0,-5.0@@ta,tb,id"]
    mean, std = est.predict(lines)
    assert np.all(np.isfinite(mean)) and np.all(std > 0)
    # a checkpoint round-trips the whole routed configuration
    ckpt = tmp_path / "best_ckpt"
    est.save(str(ckpt))
    est2 = Estimator.restore(str(ckpt))
    m2, s2 = est2.predict(lines)
    np.testing.assert_allclose(m2, mean, rtol=1e-12)
    np.testing.assert_allclose(s2, std, rtol=1e-12)

    # explicit flags beat the bundle; invalid mode fails loudly
    with mock.patch.object(ho, "fit_kernel_hyperparams", quick):
        est_o = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                          verbose=False, quality="best", chunk_norm=False,
                          calibrate_frac=0.0, hyper_points=48)
    assert est_o.chunk_norm is False
    assert est_o.std_scale == 1.0
    with pytest.raises(ValueError, match="quality"):
        Estimator("toy", None, qdir, stats=stats, verbose=False,
                  quality="fastest")


def test_estimator_nystrom_df64_ntk_keeps_w_kmm_lo(tmp_path):
    """NTK df64 tier: the SECOND basis tail (w_kmm_lo — the NTK covariance
    mixes the solve basis and the kmm basis) must be live and survive
    save/restore; a restore dropping only w_kmm_lo would silently round
    that basis to fp32 and degrade deep-cut NTK serving."""
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float32,
                    verbose=False, nystrom_m=60, nystrom_moments="df64",
                    kernel_type="ntk")
    assert est.posterior.w_kmm_lo is not None
    lines = ["ta,tb@x,5.0,-5.0@@ta,tb,id",
             "ta,tb@@y,0.9,0.1@ta,tb,id"]
    mean, std = est.predict(lines)
    assert np.all(np.isfinite(mean)) and np.all(std >= 0)
    ckpt = tmp_path / "ny_df64_ntk_ckpt"
    est.save(str(ckpt))
    est2 = Estimator.restore(str(ckpt))
    assert est2.posterior.w_kmm_lo is not None
    np.testing.assert_array_equal(np.asarray(est2.posterior.w_kmm_lo),
                                  np.asarray(est.posterior.w_kmm_lo))
    m2, s2 = est2.predict(lines)
    np.testing.assert_allclose(m2, mean, rtol=1e-12)
    np.testing.assert_allclose(s2, std, rtol=1e-12)


def test_estimator_nystrom_df64_over_mesh_matches_single_device(tmp_path):
    """mesh + nystrom_moments='df64' together: the DF-pair moment deltas
    ride shard_map in_specs as pytree leaves and psum over the mesh — fit,
    extend, and predict must match the single-device df64 tier (rtol 1e-6,
    the established psum reduction-order jitter tolerance)."""
    from nngp_tpu.parallel import make_mesh
    stats, qdir = _toy_schema_files(tmp_path)
    mesh = make_mesh()
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float32,
                    verbose=False, nystrom_m=48, nystrom_moments="df64",
                    mesh=mesh)
    ref = Estimator("toy", None, qdir, stats=stats, dtype=np.float32,
                    verbose=False, nystrom_m=48, nystrom_moments="df64")
    assert est.posterior.moments == "df64"
    lines = ["ta,tb@x,5.0,-5.0@@ta,tb,id",
             "ta,tb@@y,0.9,0.1@ta,tb,id"]
    mean, std = est.predict(lines)
    m0, s0 = ref.predict(lines)
    np.testing.assert_allclose(mean, m0, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(std, s0, rtol=1e-6, atol=1e-8)
    fb = ["ta,tb@x,3.0,1.0@@ta,tb,id@2000"]
    est.extend_with_lines(list(fb))
    ref.extend_with_lines(list(fb))
    m1, s1 = est.predict(lines)
    m2, s2 = ref.predict(lines)
    np.testing.assert_allclose(m1, m2, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(s1, s2, rtol=1e-6, atol=1e-8)


def test_estimator_tier_auto_routing(tmp_path):
    """tier='auto' follows the capability ladder: exact while n fits the
    single-chip exact tier, Nystrom (auto_nystrom_m) beyond — and composes
    with quality='best' (df64 moments arrive even though the tier was not
    known when the quality bundle resolved)."""
    stats, qdir = _toy_schema_files(tmp_path)
    # small n -> exact
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False, tier="auto")
    assert est.nystrom_m is None and hasattr(est.posterior, "l")
    # force the ladder's upper branch with a tiny exact_max_n
    est_ny = Estimator("toy", None, qdir, stats=stats, dtype=np.float32,
                       verbose=False, tier="auto", exact_max_n=10,
                       auto_nystrom_m=32)
    assert est_ny.nystrom_m == 32
    assert est_ny.posterior.num_inducing <= 32
    lines = ["ta,tb@x,5.0,-5.0@@ta,tb,id"]
    mean, std = est_ny.predict(lines)
    assert np.all(np.isfinite(mean)) and np.all(std >= 0)
    # quality='best' routes df64 moments once the tier resolves to Nystrom
    import unittest.mock as mock
    import nngp_tpu.gp.hyperopt as ho
    orig = ho.fit_kernel_hyperparams

    def quick(xx, yy, **kw):
        kw["steps"] = 5
        kw["reg_restarts"] = ()
        return orig(xx, yy, **kw)

    with mock.patch.object(ho, "fit_kernel_hyperparams", quick):
        est_b = Estimator("toy", None, qdir, stats=stats, dtype=np.float32,
                          verbose=False, tier="auto", exact_max_n=10,
                          auto_nystrom_m=32, quality="best",
                          hyper_points=48, calibrate_frac=0.0)
    assert est_b.nystrom_moments == "df64"
    assert est_b.posterior.moments == "df64"
    # explicit tiers validate their requirements
    with pytest.raises(ValueError, match="mesh"):
        Estimator("toy", None, qdir, stats=stats, verbose=False,
                  tier="distributed")
    with pytest.raises(ValueError, match="single-chip"):
        from nngp_tpu.parallel import make_mesh
        Estimator("toy", None, qdir, stats=stats, verbose=False,
                  tier="exact", mesh=make_mesh())
    with pytest.raises(ValueError, match="tier"):
        Estimator("toy", None, qdir, stats=stats, verbose=False,
                  tier="warp")
    # tier='nystrom' without nystrom_m uses auto_nystrom_m
    est_n2 = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                       verbose=False, tier="nystrom", auto_nystrom_m=24)
    assert est_n2.nystrom_m == 24
