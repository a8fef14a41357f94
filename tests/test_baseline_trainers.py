"""Baseline trainer / DKL / baseline-active-learner behavioral tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from nngp_tpu.active.baseline_learner import BaselineActiveLearner
from nngp_tpu.baselines.trainer import (
    compute_uncertainty,
    krr_train_and_test,
    magnitude_class,
    sklearn_gp_train_and_test,
    train_deep_ensemble,
    train_density,
    train_mc_dropout,
    train_multitask,
)
from nngp_tpu.models.dkl import predict_dkl, train_dkl


def _task(n=400, d=6, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, (n, d)).astype(np.float32)
    y = (3 * x[:, :1] + x[:, 1:2] ** 2 + 0.02 * rng.standard_normal((n, 1)))
    return x, y * 10  # log2-card-ish scale


def test_magnitude_class_matches_reference_formula():
    import math
    ys = np.array([0.1, 3.0, 9.97, 33.2, 40.0])
    got = magnitude_class(ys, max_classes=10)
    want = []
    for y in ys:
        idx = math.ceil(math.log(math.pow(2, y), 10))
        want.append(min(idx, 9))
    np.testing.assert_array_equal(got, want)


def test_uncertainty_functions():
    logp = np.log(np.array([[0.7, 0.2, 0.1], [0.34, 0.33, 0.33]]))
    reg = np.array([1.0, 2.0])
    ent = compute_uncertainty("entropy", logp, reg)
    assert ent[1] > ent[0]                       # uniform-ish is more uncertain
    conf = compute_uncertainty("confident", logp, reg)
    assert conf[1] > conf[0]
    marg = compute_uncertainty("margin", logp, reg)
    assert marg[0] > marg[1]                     # margin is top1-top2 gap
    cons = compute_uncertainty("consist", logp, np.array([33.2, 3.0]))
    assert cons.shape == (2,)


def test_multitask_trainer_learns():
    x, y = _task()
    model, params = train_multitask(x, y, num_hid=64, epochs=80, lr=3e-3,
                                    batch_size=64, verbose=None)
    reg, log_probs = model.apply(params, jnp.asarray(x))
    mse = float(np.mean((np.asarray(reg) - y) ** 2))
    assert mse < np.var(y)  # beats predicting the mean
    assert np.exp(np.asarray(log_probs)).sum(1) == pytest.approx(
        np.ones(x.shape[0]), rel=1e-4)


def test_density_and_ensemble_and_mcdropout_train():
    x, y = _task(n=300)
    m, p = train_density(x, y, num_hid=32, epochs=15, verbose=None)
    mu, s = m.apply(p, jnp.asarray(x))
    assert np.all(np.asarray(s) > 0)

    # NLL training has a slow start at large target scale (sigma inflates
    # before mu moves — inherent to the reference's loss too); test the
    # learning behavior at a moderate scale.
    ys = y / 5.0
    ens, ep = train_deep_ensemble(x, ys, num_models=3, num_hid=32, epochs=50,
                                  lr=3e-3, verbose=None)
    mean, std = ens.predict(ep, jnp.asarray(x))
    assert np.mean((np.asarray(mean) - ys.ravel()) ** 2) < np.var(ys)

    mc, mp = train_mc_dropout(x, y, num_hid=32, num_samples=8, epochs=10,
                              verbose=None)
    mean, std = mc.predict(mp, jnp.asarray(x), __import__("jax").random.PRNGKey(0))
    assert np.all(np.asarray(std) >= 0)


def test_dkl_trains_and_predicts():
    x, y = _task(n=150)
    params = train_dkl(x, y, hid_dim=32, epochs=20, verbose=None)
    mean, std = predict_dkl(params, x, y, x[:20])
    assert mean.shape == (20,) and std.shape == (20,)
    mse = float(np.mean((np.asarray(mean) - y[:20].ravel()) ** 2))
    assert mse < np.var(y)


def test_sklearn_baselines():
    x, y = _task(n=120)
    mean, std = sklearn_gp_train_and_test(x, y, x[:10])
    assert mean.shape == (10,) and np.all(std >= 0)
    pred = krr_train_and_test(x, y, x[:10])
    assert pred.shape == (10,)


@pytest.mark.parametrize("model_type", ["DNN", "DeepEnsemble"])
def test_baseline_active_learner(model_type):
    x, y = _task(n=360)
    learner = BaselineActiveLearner(
        model_type=model_type, budget=40, active_iters=2, epochs=8,
        active_epochs=6, num_hid=32, batch_size=64)
    model, params, history = learner.active_train(
        x[:40], y[:40], x[40:300], y[40:300], x[300:], y[300:], printer=None)
    assert len(history) == 3
    assert history[-1]["num_train"] == 40 + 2 * 40


def test_xgb_branch_sklearn_fallback():
    """The XGB dispatcher branch must EXECUTE in this image: xgboost is
    absent, so the sklearn HistGradientBoostingRegressor fallback carries
    the branch (same histogram-GBT family, squared-error objective,
    n_estimators -> max_iter). Also pins the strict mode's clean raise."""
    from nngp_tpu.baselines.trainer import xgb_train_and_test
    x, y = _task(n=300)
    pred = xgb_train_and_test(x[:200], y[:200], x[200:])
    assert pred.shape == (100,)
    assert np.all(np.isfinite(pred))
    # 32 boosting rounds on a smooth 2-feature target: must beat the
    # predict-the-mean baseline by a wide margin
    mse = float(np.mean((pred - y[200:].ravel()) ** 2))
    var = float(np.var(y[200:].ravel()))
    assert mse < 0.5 * var
    # deterministic under the pinned seed
    pred2 = xgb_train_and_test(x[:200], y[:200], x[200:])
    np.testing.assert_array_equal(pred, pred2)
    try:
        import xgboost  # noqa: F401
        have_xgb = True
    except ImportError:
        have_xgb = False
    if not have_xgb:
        with pytest.raises(RuntimeError, match="xgboost is not installed"):
            xgb_train_and_test(x[:200], y[:200], x[200:],
                               allow_sklearn_fallback=False)
