"""Split / q-error parity tests: the split must reproduce the reference's
stdlib-random index math exactly (same seed -> same member sets)."""

import random

import numpy as np

from nngp_tpu.eval import (
    PredictionStatistics,
    qerror_profile,
    symmetric_qerror,
    train_test_val_split,
)
from nngp_tpu.eval.calibration import calibration_table
from nngp_tpu.featurize.parser import QueryInfo


def _reference_split(x, y, train_frac=0.6, test_frac=0.2, seed=10):
    """Literal port of /root/reference/util.py:271-293."""
    num = x.shape[0]
    num_train, num_test = int(train_frac * num), int(test_frac * num)
    indices = list(range(num))
    random.seed(seed)
    random.shuffle(indices)
    x, y = x[indices, :], y[indices, :]
    return (x[:num_train], y[:num_train],
            x[num_train:num_train + num_test], y[num_train:num_train + num_test],
            x[num_train + num_test:], y[num_train + num_test:])


def test_split_matches_reference_index_math():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((103, 4))
    y = rng.standard_normal((103, 1))
    xt, yt, _, xs, ys, _, xv, yv, _ = train_test_val_split(x, y)
    rt = _reference_split(x, y)
    np.testing.assert_array_equal(xt, rt[0])
    np.testing.assert_array_equal(ys, rt[3])
    np.testing.assert_array_equal(xv, rt[4])


def test_split_is_deterministic():
    x = np.arange(40).reshape(20, 2).astype(float)
    y = np.arange(20).reshape(20, 1).astype(float)
    a = train_test_val_split(x, y)
    b = train_test_val_split(x, y)
    np.testing.assert_array_equal(a[0], b[0])


def test_qerror_profile_and_symmetric():
    errors = np.log2([2.0, 0.5, 1.0, 8.0])  # ratios 2, .5, 1, 8
    prof = qerror_profile(errors)
    assert prof["min"] == 0.5 and prof["max"] == 8.0
    assert prof["median"] == 1.5
    np.testing.assert_allclose(symmetric_qerror(errors), [2.0, 2.0, 1.0, 8.0])


def test_partitioned_details_and_merge():
    stat = PredictionStatistics()
    infos = [QueryInfo(1, 0, p, False, False) for p in
             [1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7]]
    errors = np.zeros(len(infos))
    out = stat.get_prediction_details(errors, infos, "num_predicates", printer=None)
    # 7 groups > 6 -> pairwise merge -> 4 buckets (1+2, 3+4, 5+6, 7)
    assert len(out) == 4
    assert sum(p["count"] for p in out.values()) == len(infos)


def test_partition_indices():
    stat = PredictionStatistics()
    infos = [QueryInfo(2, 1, 3, True, False), QueryInfo(1, 0, 1, False, False),
             QueryInfo(2, 1, 5, True, False)]
    parts = stat.get_partitioned_indices(infos, "num_table")
    assert parts[(1,)] == [1] and parts[(2,)] == [0, 2]


def test_calibration_table_matches_direct_norm_interval():
    rng = np.random.default_rng(5)
    mu = rng.standard_normal(200)
    sd = np.abs(rng.standard_normal(200)) + 0.1
    y = mu + sd * rng.standard_normal(200)
    table = calibration_table(y, mu, sd, num_intervals=4)
    from scipy import stats as sps
    for level, observed in table.items():
        if level == 0.0:
            continue
        lo, hi = sps.norm.interval(level, loc=mu, scale=sd)
        want = float(np.mean((y >= lo) & (y <= hi)))
        assert abs(observed - want) < 1e-12


def test_uneven_train_test_split_skews_composition():
    from nngp_tpu.eval.splits import uneven_train_test_split
    rng = np.random.default_rng(0)
    x = rng.standard_normal((200, 3))
    y = rng.standard_normal((200, 1))
    infos = [QueryInfo(1, 0, p, False, False)
             for p in ([1] * 100 + [2] * 100)]
    (x_tr, y_tr, infos_tr, x_te, y_te, infos_te, *_rest) = \
        uneven_train_test_split(x, y, infos, "num_predicates",
                                train_frac=0.6, skew_ratio=0.2)
    n1 = sum(1 for i in infos_tr if i.num_predicates == 1)
    n2 = sum(1 for i in infos_tr if i.num_predicates == 2)
    # 60 candidates per partition; ratios 0.2 / 0.8 -> 12 vs 48
    assert n1 == 12 and n2 == 48
    assert len(infos_te) == 80


def test_calibration_zero_std_at_full_confidence():
    """p=1.0 (z=inf) must contain every query, including exact-zero-std
    ones (inf * 0 = NaN used to drop them)."""
    from nngp_tpu.eval.calibration import calibration_table
    table = calibration_table(
        y_true=[1.0, 2.0], means=[1.0, 5.0], stds=[0.0, 1.0])
    assert table[1.0] == 1.0


def test_fit_std_scale_recovers_true_miscalibration():
    """y ~ N(mu, (c*std)^2) with reported std: the closed-form MLE scale
    recovers c."""
    from nngp_tpu.eval.calibration import calibration_mae, calibration_table, fit_std_scale
    rng = np.random.default_rng(3)
    n = 20000
    mu = rng.normal(0, 5, n)
    sd = rng.uniform(0.5, 2.0, n)
    c_true = 2.5
    y = mu + c_true * sd * rng.standard_normal(n)
    c = fit_std_scale(y, mu, sd)
    assert abs(c - c_true) < 0.05
    # recalibration repairs the expected-vs-observed table
    mae_before = calibration_mae(calibration_table(y, mu, sd))
    mae_after = calibration_mae(calibration_table(y, mu, c * sd))
    assert mae_after < 0.02 < mae_before
    # degenerate inputs
    assert fit_std_scale([], [], []) == 1.0


def test_conformal_interval_coverage_distribution_free():
    """Split-conformal intervals cover >= 1-alpha on exchangeable data even
    when the residuals are decidedly non-Gaussian (shifted exponential)."""
    from nngp_tpu.eval.calibration import conformal_quantile, conformal_scores
    rng = np.random.default_rng(7)
    n_cal, n_test = 2000, 4000
    mu = rng.normal(0, 3, n_cal + n_test)
    sd = rng.uniform(0.5, 2.0, n_cal + n_test)
    noise = rng.exponential(1.0, n_cal + n_test) - 1.0   # skewed, heavy tail
    y = mu + sd * noise
    scores = conformal_scores(y[:n_cal], mu[:n_cal], sd[:n_cal])
    for alpha in (0.2, 0.1):
        qhat = conformal_quantile(scores, alpha)
        inside = np.abs(y[n_cal:] - mu[n_cal:]) <= qhat * sd[n_cal:]
        cov = inside.mean()
        assert cov >= 1 - alpha - 0.02          # guarantee (finite slack)
        assert cov <= 1 - alpha + 0.05          # not vacuously wide


def test_conformal_quantile_small_n_and_validation():
    from nngp_tpu.eval.calibration import conformal_quantile
    import pytest
    # n too small for the requested alpha: ceil((n+1)(1-alpha)) > n -> inf
    assert conformal_quantile(np.array([1.0]), alpha=0.1) == float("inf")
    assert conformal_quantile(np.array([]), alpha=0.5) == float("inf")
    # n=19, alpha=0.1 -> k=18 <= 19: finite
    q = conformal_quantile(np.arange(1.0, 20.0), alpha=0.1)
    assert q == 18.0
    with pytest.raises(ValueError):
        conformal_quantile(np.array([1.0]), alpha=0.0)
