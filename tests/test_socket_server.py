"""TCP serving front-end: protocol, cross-connection batching, conformal
intervals, per-line error isolation (serve/socket_server.py)."""

import json
import socket
import threading

import numpy as np

from nngp_tpu.serve import Estimator, EstimatorSocketServer

from tests.test_active_serve import _toy_schema_files


class _StubEstimator:
    """predict(lines) -> mean = len(line), std = 1; raises on 'bad' lines
    so the batcher's bisection has something to isolate."""

    def __init__(self):
        self.calls = 0

    def predict(self, lines):
        self.calls += 1
        if any("bad" in ln for ln in lines):
            raise ValueError("malformed line")
        return (np.asarray([float(len(ln)) for ln in lines]),
                np.ones(len(lines)))


def _client(host, port, lines, timeout=60.0):
    with socket.create_connection((host, port), timeout=timeout) as sk:
        f = sk.makefile("rwb")
        f.write(("".join(ln + "\n" for ln in lines)).encode())
        f.flush()
        sk.shutdown(socket.SHUT_WR)
        return [json.loads(raw.decode()) for raw in f]


def test_socket_server_pipelined_multi_client():
    stub = _StubEstimator()
    with EstimatorSocketServer(stub, port=0, quiet_gap_ms=5.0) as srv:
        per_client = [[f"q{c}_{i}" + "x" * c for i in range(40)]
                      for c in range(6)]
        results = [None] * 6

        def run(c):
            results[c] = _client(srv.host, srv.port, per_client[c])

        threads = [threading.Thread(target=run, args=(c,)) for c in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        for c in range(6):
            assert len(results[c]) == 40
            # responses in request order, mean == len(line)
            for resp, ln in zip(results[c], per_client[c]):
                assert resp["mean"] == float(len(ln))
                assert resp["std"] == 1.0
                assert resp["card"] == 2.0 ** float(len(ln))
        st = srv.stats()
        assert st["requests"] == 240
        # cross-connection coalescing: far fewer dispatches than requests
        assert st["batches"] < 240


def test_socket_server_isolates_bad_lines():
    stub = _StubEstimator()
    with EstimatorSocketServer(stub, port=0) as srv:
        lines = ["good_1", "this_is_bad", "good_22"]
        out = _client(srv.host, srv.port, lines)
    assert out[0]["mean"] == float(len("good_1"))
    assert "error" in out[1] and "ValueError" in out[1]["error"]
    assert out[2]["mean"] == float(len("good_22"))


def test_socket_server_real_estimator_with_intervals(tmp_path):
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", data_path=None, train_query_path=qdir,
                    stats=stats, dtype=np.float64, verbose=False)
    est.load_model(verbose=False)
    # calibrate on held-out labeled lines -> conformal scores for intervals
    held = [f"ta,tb@x,{u:.3f},{u - 2:.3f}@@ta,tb,id@{max(1, int(900 * 2))}"
            for u in np.linspace(-6, 6, 25)]
    est.calibrate_uncertainty(held, verbose=False)

    with EstimatorSocketServer(est, port=0, alpha=0.2) as srv:
        out = _client(srv.host, srv.port,
                      ["ta,tb@x,5.0,-5.0@@ta,tb,id",
                       "ta,tb@@y,0.9,0.1@ta,tb,id"])
    assert len(out) == 2
    for resp in out:
        assert np.isfinite(resp["mean"]) and resp["std"] >= 0
        assert resp["lo"] <= resp["mean"] <= resp["hi"]
        assert resp["card_lo"] <= resp["card"] <= resp["card_hi"]
    # parity with the in-process API
    mean, _ = est.predict(["ta,tb@x,5.0,-5.0@@ta,tb,id"])
    assert abs(out[0]["mean"] - float(mean[0])) < 1e-9


# -------------------------------------------------- over-the-wire feedback
def test_is_labeled_grammar_split():
    from nngp_tpu.serve.socket_server import _is_labeled
    assert _is_labeled("ta,tb@x,5.0,1.0@@ta,tb,id@1234")       # multi-join
    assert _is_labeled("t@x,5.0,1.0@77")                       # single-table
    assert not _is_labeled("ta,tb@x,5.0,1.0@@ta,tb,id")        # card-less
    assert not _is_labeled("t@x,5.0,1.0")                      # card-less
    assert not _is_labeled("t@x,5.0,1.0@")                     # empty tail


def _mk_lines(rng, n, lo_scale=1.0, labeled=True):
    out = []
    for _ in range(n):
        xu = rng.uniform(-10, 10)
        xl = rng.uniform(-10, xu)
        card = max(1, int(lo_scale * 1000 * (xu - xl)))
        base = f"ta,tb@x,{xu:.3f},{xl:.3f}@@ta,tb,id"
        out.append(f"{base}@{card}" if labeled else base)
    return out


def test_feedback_online_learns_over_the_wire(tmp_path):
    """Labeled lines sent over TCP must ack immediately, reach the drift
    monitor AND extend the posterior (feedback_mode='online'); card-less
    lines on the same connection keep serving normally."""
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False)
    est.load_model(verbose=False)
    n0 = est.posterior.num_train
    rng = np.random.default_rng(3)
    labeled = _mk_lines(rng, 40)
    queries = _mk_lines(rng, 5, labeled=False)
    with EstimatorSocketServer(est, port=0, feedback_mode="online",
                               feedback_batch=16,
                               feedback_flush_s=0.2) as srv:
        replies = _client(srv.host, srv.port,
                          labeled + queries + ["\\stats"])
        assert len(replies) == 46
        for r in replies[:40]:
            assert r == {"feedback": "queued", "mode": "online"}
        for r in replies[40:45]:
            assert "mean" in r and "std" in r
        assert "qps" in replies[45] and "feedback_lines" in replies[45]
        # the worker flushes on its own clock
        import time as _t
        deadline = _t.monotonic() + 30
        while (est.posterior.num_train < n0 + 40
               and _t.monotonic() < deadline):
            _t.sleep(0.1)
        st = srv.stats()
    assert est.posterior.num_train == n0 + 40       # extended online
    assert st["feedback_lines"] == 40
    assert st["extends"] >= 1
    assert est.drift_monitor is not None and est.drift_monitor.n == 40
    assert st["feedback_errors"] == 0


def test_feedback_auto_remediates_on_drift(tmp_path):
    """auto mode: a workload shift big enough to alarm the drift monitor
    must trigger the report's remediation (relearn on the exact tier) and
    reset the monitor — all in the background worker."""
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False)
    est.load_model(verbose=False)
    rng = np.random.default_rng(4)
    healthy = _mk_lines(rng, 150)               # > the 128-sample warmup
    drifted = _mk_lines(rng, 150, lo_scale=4.0)
    relearns = {"n": 0}
    orig = est.relearn_hyperparams

    def spy_relearn(*a, **k):
        relearns["n"] += 1
        return orig(steps=10, verbose=False)

    est.relearn_hyperparams = spy_relearn
    with EstimatorSocketServer(est, port=0, feedback_mode="auto",
                               feedback_batch=512,
                               feedback_flush_s=0.2) as srv:
        _client(srv.host, srv.port, healthy)
        import time as _t
        deadline = _t.monotonic() + 60
        while srv.stats().get("feedback_lines", 0) < 150 \
                and _t.monotonic() < deadline:
            _t.sleep(0.1)
        _client(srv.host, srv.port, drifted)
        deadline = _t.monotonic() + 120
        while srv.stats().get("remediations", 0) < 1 \
                and _t.monotonic() < deadline:
            _t.sleep(0.2)
        st = srv.stats()
    assert st["drift_alarms"] >= 1
    assert st["remediations"] >= 1
    assert relearns["n"] >= 1
    assert est.drift_monitor.drift is False          # reset after remediation
    assert st["feedback_errors"] == 0


def test_feedback_bad_line_costs_only_itself(tmp_path):
    """One malformed labeled line (numeric tail -> routed as feedback, but
    its predicate fails to encode) must not discard the valid labels
    sharing its flush window."""
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False)
    est.load_model(verbose=False)
    n0 = est.posterior.num_train
    rng = np.random.default_rng(7)
    good = _mk_lines(rng, 10)
    # labeled by its numeric tail, but the predicate names a column the
    # schema does not have -> encode fails for this line alone
    bad = "ta,tb@zz,5.0,1.0@@ta,tb,id@125"
    with EstimatorSocketServer(est, port=0, feedback_mode="online",
                               feedback_batch=32,
                               feedback_flush_s=0.2) as srv:
        replies = _client(srv.host, srv.port, good[:5] + [bad] + good[5:])
        assert all(r.get("feedback") == "queued" for r in replies)
        import time as _t
        deadline = _t.monotonic() + 30
        while (est.posterior.num_train < n0 + 10
               and _t.monotonic() < deadline):
            _t.sleep(0.1)
        st = srv.stats()
    assert est.posterior.num_train == n0 + 10   # the 10 good lines landed
    assert st["feedback_lines"] == 10
    assert st["feedback_errors"] == 1           # the bad one, alone

def test_feedback_recalibrates_conformal_on_next_heldout_batch(tmp_path):
    """After a remediation moves the posterior, the conformal scores must be
    refreshed on the NEXT feedback batch BEFORE that batch is folded into
    training (split conformal requires held-out lines): the recal call must
    observe num_train as it was BEFORE the batch's extend."""
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False)
    est.load_model(verbose=False)
    rng = np.random.default_rng(6)
    est.calibrate_uncertainty(_mk_lines(rng, 30), verbose=False)
    scores0 = np.array(est._conformal_scores)

    recals = []
    orig_cal = est.calibrate_uncertainty

    def spy_cal(lines, **k):
        recals.append((len(lines), est.posterior.num_train))
        return orig_cal(lines, verbose=False)

    est.calibrate_uncertainty = spy_cal
    est.relearn_hyperparams = (            # cheap remediation stand-in
        lambda *a, **k: 0.0)

    healthy = _mk_lines(rng, 150)
    drifted = _mk_lines(rng, 150, lo_scale=4.0)
    after = _mk_lines(rng, 20)
    with EstimatorSocketServer(est, port=0, feedback_mode="auto",
                               feedback_batch=512,
                               feedback_flush_s=0.2) as srv:
        import time as _t
        _client(srv.host, srv.port, healthy)
        deadline = _t.monotonic() + 60
        while srv.stats().get("feedback_lines", 0) < 150 \
                and _t.monotonic() < deadline:
            _t.sleep(0.1)
        _client(srv.host, srv.port, drifted)
        deadline = _t.monotonic() + 120
        while srv.stats().get("remediations", 0) < 1 \
                and _t.monotonic() < deadline:
            _t.sleep(0.2)
        n_before_after_batch = est.posterior.num_train
        _client(srv.host, srv.port, after)
        deadline = _t.monotonic() + 60
        while not recals and _t.monotonic() < deadline:
            _t.sleep(0.1)
        st = srv.stats()
    assert st["remediations"] >= 1
    assert len(recals) == 1                  # exactly one deferred refresh
    n_lines, n_train_at_recal = recals[0]
    assert n_lines == 20                     # the post-remediation batch
    # recal ran BEFORE that batch extended the posterior (held-out)
    assert n_train_at_recal == n_before_after_batch
    assert est._conformal_scores is not None
    assert len(est._conformal_scores) == 20  # refreshed, not the old 30
    assert not np.array_equal(np.array(est._conformal_scores), scores0)


def test_feedback_growth_skipped_without_train_log(tmp_path):
    """Nystrom tier in auto mode WITHOUT a train log: drift must count a
    remediations_skipped, reset the monitor (no alarm latch-loop), and keep
    serving — never crash the worker."""
    stats, qdir = _toy_schema_files(tmp_path)
    est = Estimator("toy", None, qdir, stats=stats, dtype=np.float64,
                    verbose=False, nystrom_m=40)
    est.load_model(verbose=False)
    m0 = est.posterior.num_inducing
    rng = np.random.default_rng(8)
    healthy = _mk_lines(rng, 150)
    drifted = _mk_lines(rng, 150, lo_scale=4.0)
    with EstimatorSocketServer(est, port=0, feedback_mode="auto",
                               feedback_batch=512,
                               feedback_flush_s=0.2) as srv:
        import time as _t
        _client(srv.host, srv.port, healthy)
        deadline = _t.monotonic() + 60
        while srv.stats().get("feedback_lines", 0) < 150 \
                and _t.monotonic() < deadline:
            _t.sleep(0.1)
        _client(srv.host, srv.port, drifted)
        deadline = _t.monotonic() + 120
        while srv.stats().get("remediations_skipped", 0) < 1 \
                and _t.monotonic() < deadline:
            _t.sleep(0.2)
        st = srv.stats()
        # serving still answers card-less queries after the skip
        replies = _client(srv.host, srv.port, _mk_lines(rng, 3,
                                                        labeled=False))
    assert st["drift_alarms"] >= 1
    assert st["remediations_skipped"] >= 1
    assert st["remediations"] == 0
    assert est.posterior.num_inducing == m0      # nothing grew
    assert est.drift_monitor.drift is False      # reset: no latch loop
    assert all("mean" in r for r in replies)
    assert st["feedback_errors"] == 0
