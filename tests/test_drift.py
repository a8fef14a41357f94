"""Workload-drift detection: DriftMonitor unit behavior + the serving
record_feedback loop.

The reference has no drift signal at all — its aux-feedback tool thresholds
per-query q-error offline (/root/reference/neuroestimator/
merge_subquery_card.py:56-58); these tests pin down the sequential detector
that closes that loop online.
"""

import numpy as np
import pytest

from nngp_tpu.serve.drift import DriftMonitor, _EXPECTED_ABS_Z
from nngp_tpu.serve.estimator import Estimator
from tests.test_active_serve import _toy_schema_files


# ---------------------------------------------------------------- unit
def _healthy_stream(rng, n):
    """|z| draws from a correctly-specified posterior: |N(0,1)|."""
    return np.abs(rng.standard_normal(n))


def test_no_alarm_on_healthy_stream():
    mon = DriftMonitor()
    rng = np.random.default_rng(0)
    assert not mon.update(_healthy_stream(rng, 5000))
    # PH statistic stays far from threshold on a stationary stream
    assert mon.stat < mon.threshold / 2


def test_alarm_on_sustained_shift():
    mon = DriftMonitor()
    rng = np.random.default_rng(1)
    mon.update(_healthy_stream(rng, 500))          # establish baseline
    assert not mon.drift
    # workload shift: residuals now ~3x the predicted std
    shifted = 3.0 * np.abs(rng.standard_normal(200))
    assert mon.update(shifted)


def test_shift_below_delta_is_ignored():
    """Shifts smaller than the slack never alarm, however long they last
    (deterministic stream so the delta semantics are tested exactly)."""
    mon = DriftMonitor(delta=0.15, warmup=32)
    mon.update(np.full(32, 0.8))                   # baseline = 0.8 exactly
    assert not mon.update(np.full(20000, 0.9))     # +0.10 shift < delta
    assert mon.stat == 0.0                         # every increment negative


def test_no_alarm_during_warmup():
    """Even a wild stream cannot alarm before the baseline is frozen."""
    mon = DriftMonitor(warmup=128)
    assert not mon.update(np.full(127, 50.0))
    assert mon._baseline is None
    # ...but it CAN alarm immediately after warmup completes (the huge
    # warmup values set a huge baseline, so feed a calibrated prefix).
    mon2 = DriftMonitor(warmup=64, threshold=5.0)
    rng = np.random.default_rng(3)
    mon2.update(_healthy_stream(rng, 64))
    assert mon2._baseline is not None
    assert mon2.update(np.full(100, 10.0))


def test_alarm_latches_until_reset():
    mon = DriftMonitor(warmup=32, threshold=5.0)
    rng = np.random.default_rng(4)
    mon.update(_healthy_stream(rng, 32))
    assert mon.update(np.full(100, 10.0))
    # back to healthy data: still latched
    assert mon.update(_healthy_stream(rng, 500))
    mon.reset()
    assert not mon.drift and mon.n == 0
    # and the reset detector re-warms before it can alarm again
    assert not mon.update(_healthy_stream(rng, 10))
    assert mon._baseline is None


def test_nonfinite_observations_skipped():
    mon = DriftMonitor(warmup=4)
    mon.update([0.8, np.nan, np.inf, 0.7, -np.inf, 0.9, 0.8])
    assert mon.n == 4                              # only finite folded
    assert mon._baseline == pytest.approx(np.mean([0.8, 0.7, 0.9, 0.8]))


def test_expected_abs_z_constant():
    assert _EXPECTED_ABS_Z == pytest.approx(np.sqrt(2 / np.pi))


# ---------------------------------------------------------------- serving
def _labeled(lines_with_card):
    return [f"ta,tb@x,{hi:.3f},{lo:.3f}@@ta,tb,id@{card}"
            for hi, lo, card in lines_with_card]


def _workload(rng, n, card_fn):
    """Fresh labeled queries from the toy schema's true generator
    (card = 1000*(hi-lo)) or a shifted card_fn."""
    out = []
    for _ in range(n):
        hi = rng.uniform(-10, 10)
        lo = rng.uniform(-10, hi)
        out.append((hi, lo, max(1, int(card_fn(hi, lo)))))
    return _labeled(out)


def test_record_feedback_healthy_then_drift(tmp_path):
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False)
    rng = np.random.default_rng(0)
    in_dist = _workload(rng, 200, lambda hi, lo: 1000 * (hi - lo))
    rep = est.record_feedback(in_dist)
    assert not rep.drift and rep.action is None
    assert rep.n_observed == 200
    assert np.isfinite(rep.mean_abs_z) and np.isfinite(rep.median_q_error)

    # the workload shifts: true cards now 100x the trained relationship
    shifted = _workload(rng, 300, lambda hi, lo: 1e5 * (hi - lo))
    rep2 = est.record_feedback(shifted)
    assert rep2.drift
    assert rep2.action == "relearn_hyperparams"    # exact tier routing
    assert rep2.n_observed == 500
    assert rep2.ph_stat > rep2.threshold

    # remediation contract: caller acts, then resets
    est.drift_monitor.reset()
    rep3 = est.record_feedback(_workload(rng, 150,
                                         lambda hi, lo: 1000 * (hi - lo)))
    assert not rep3.drift and rep3.n_observed == 150


def test_record_feedback_routes_nystrom_to_grow(tmp_path):
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False, nystrom_m=40)
    rng = np.random.default_rng(1)
    est.record_feedback(_workload(rng, 200, lambda hi, lo: 1000 * (hi - lo)))
    rep = est.record_feedback(_workload(rng, 300,
                                        lambda hi, lo: 1e5 * (hi - lo)))
    assert rep.drift and rep.action == "grow_inducing"


def test_record_feedback_monitor_not_checkpointed(tmp_path):
    """A restored estimator starts with a fresh (None) monitor — drift
    state is about the LIVE stream, not the saved model."""
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False)
    rng = np.random.default_rng(2)
    est.record_feedback(_workload(rng, 150, lambda hi, lo: 1000 * (hi - lo)))
    assert est.drift_monitor is not None and est.drift_monitor.n == 150
    ckpt = tmp_path / "ckpt"
    est.save(str(ckpt))
    est2 = Estimator.restore(str(ckpt))
    assert est2.drift_monitor is None
    rep = est2.record_feedback(_workload(rng, 10,
                                         lambda hi, lo: 1000 * (hi - lo)))
    assert rep.n_observed == 10
