"""Continuous-batching serving front-end (nngp_tpu/serve/streaming.py):
per-request results must match direct batch predict, requests must coalesce
into far fewer device batches, and errors must propagate to waiters."""

import threading
import time

import numpy as np
import pytest

from nngp_tpu.featurize.stats import ColumnStats, TableStats
from nngp_tpu.serve.estimator import Estimator
from nngp_tpu.serve.streaming import StreamingBatcher


def _toy_estimator(tmp_path):
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
    return Estimator("toy", None, str(qdir), stats=[ta, tb],
                     dtype=np.float64, verbose=False)


def _request_lines(n, seed=1):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        xu = rng.uniform(-10, 10)
        xl = rng.uniform(-10, xu)
        out.append(f"ta,tb@x,{xu:.3f},{xl:.3f}@@ta,tb,id")
    return out


def test_streaming_matches_direct_predict(tmp_path):
    est = _toy_estimator(tmp_path)
    lines = _request_lines(50)
    want_mean, want_std = est.predict(lines)
    with StreamingBatcher(est.predict, max_wait_ms=20.0) as server:
        futs = [server.submit(l) for l in lines]
        got = [f.result(timeout=30) for f in futs]
        st = server.stats()
    got_mean = np.asarray([m for m, _ in got])
    got_std = np.asarray([s for _, s in got])
    np.testing.assert_allclose(got_mean, want_mean, rtol=1e-10)
    np.testing.assert_allclose(got_std, want_std, rtol=1e-10, atol=1e-12)
    # coalescing: 50 requests must not take 50 device batches
    assert st["batches"] < 10
    assert st["requests"] == 50


def test_streaming_concurrent_clients(tmp_path):
    est = _toy_estimator(tmp_path)
    lines = _request_lines(20, seed=2)
    want_mean, _ = est.predict(lines)
    results = {}
    with StreamingBatcher(est.predict, max_wait_ms=10.0) as server:
        def client(cid):
            m, s = server.predict(lines)
            results[cid] = m

        threads = [threading.Thread(target=client, args=(c,))
                   for c in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        st = server.stats()
    for cid in range(6):
        np.testing.assert_allclose(results[cid], want_mean, rtol=1e-10)
    assert st["requests"] == 6 * 20
    assert st["batches"] < 6 * 20  # genuinely coalesced across clients
    assert st["p95_latency_ms"] >= st["p50_latency_ms"] >= 0.0


def test_streaming_max_batch_and_error_propagation():
    calls = []

    def ok_fn(items):
        calls.append(len(items))
        v = np.arange(len(items), dtype=float)
        return v, v + 0.5

    with StreamingBatcher(ok_fn, max_batch=8, max_wait_ms=50.0) as server:
        futs = [server.submit(i) for i in range(20)]
        out = [f.result(timeout=30) for f in futs]
    assert all(b <= 8 for b in calls)
    assert out[0] == (0.0, 0.5)

    def boom(items):
        raise RuntimeError("device on fire")

    server = StreamingBatcher(boom, max_wait_ms=1.0)
    fut = server.submit("q")
    with pytest.raises(RuntimeError, match="device on fire"):
        fut.result(timeout=30)
    server.close()
    with pytest.raises(RuntimeError, match="closed"):
        server.submit("q2")


def test_streaming_drains_queue_on_close():
    seen = []

    def slow_fn(items):
        time.sleep(0.05)
        seen.extend(items)
        v = np.zeros(len(items))
        return v, v

    server = StreamingBatcher(slow_fn, max_wait_ms=1.0)
    futs = [server.submit(i) for i in range(30)]
    server.close(timeout=30)
    assert all(f.done() for f in futs)
    assert sorted(seen) == list(range(30))


def test_streaming_rejects_length_mismatch():
    """predict_fn silently dropping items (e.g. blank lines) must not
    mis-align results: the dropped item fails, the others are recovered by
    the per-item retry instead of inheriting a neighbor's prediction."""
    def dropping_fn(items):
        kept = [i for i in items if i != "blank"]
        v = np.arange(len(kept), dtype=float)
        return v, v

    with StreamingBatcher(dropping_fn, max_wait_ms=20.0) as server:
        futs = [server.submit(x) for x in ["a", "blank", "b"]]
        assert futs[0].result(timeout=30) == (0.0, 0.0)
        assert futs[2].result(timeout=30) == (0.0, 0.0)
        with pytest.raises(ValueError, match="0 results"):
            futs[1].result(timeout=30)


def test_bad_request_does_not_poison_batch():
    """A malformed item in a coalesced batch fails ONLY its own future;
    the rest of the batch is retried individually and succeeds."""
    def predict(items):
        if any(it == "bad" for it in items):
            raise ValueError("malformed query line")
        vals = np.arange(len(items), dtype=float)
        return vals, vals + 0.5

    with StreamingBatcher(predict, max_batch=16, max_wait_ms=30.0) as srv:
        futs = [srv.submit("ok1"), srv.submit("bad"), srv.submit("ok2")]
        results = []
        for f in futs:
            try:
                results.append(f.result(timeout=30))
            except ValueError as e:
                results.append(e)
    assert isinstance(results[1], ValueError)
    assert results[0] == (0.0, 0.5) and results[2] == (0.0, 0.5)


def test_concurrent_soak_with_random_failures():
    """Many client threads, randomly interleaved malformed requests: every
    future resolves, good requests get exactly their own prediction (value
    encodes the item), bad ones get the error."""
    import threading

    def predict(items):
        if any(it < 0 for it in items):
            raise ValueError("bad item")
        vals = np.asarray([float(it) for it in items])
        return vals, vals * 0.1

    rng = np.random.default_rng(0)
    requests = [int(v) if ok else -1
                for v, ok in zip(rng.integers(1, 1000, 400),
                                 rng.random(400) > 0.1)]
    results = [None] * len(requests)

    with StreamingBatcher(predict, max_batch=32, max_wait_ms=2.0) as srv:
        def client(lo, hi):
            futs = [(i, srv.submit(requests[i])) for i in range(lo, hi)]
            for i, f in futs:
                try:
                    results[i] = f.result(timeout=60)
                except ValueError:
                    results[i] = "error"

        threads = [threading.Thread(target=client, args=(i * 50, (i + 1) * 50))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

    for req, res in zip(requests, results):
        if req < 0:
            assert res == "error"
        else:
            assert res == (float(req), float(req) * 0.1)


def test_cancelled_future_does_not_kill_dispatcher():
    """A client cancelling its Future mid-flight must not raise
    InvalidStateError out of the dispatcher thread — later requests would
    hang forever on a dead daemon."""
    import time as _t

    def predict(items):
        if any(it == "bad" for it in items):
            raise ValueError("boom")
        _t.sleep(0.05)                       # window for the cancel
        v = np.asarray([float(i) for i in items])
        return v, v

    with StreamingBatcher(predict, max_batch=8, max_wait_ms=2.0) as srv:
        f1 = srv.submit(1.0)
        f2 = srv.submit("bad")
        f3 = srv.submit(3.0)
        f1.cancel()                           # may or may not win the race
        # dispatcher must survive and still serve fresh requests
        for _ in range(3):
            assert srv.submit(7.0).result(timeout=30) == (7.0, 7.0)
        with pytest.raises(ValueError):
            f2.result(timeout=30)
        assert f3.result(timeout=30) == (3.0, 3.0)


def test_quiet_gap_burst_capture_and_trickle_latency():
    """Policy semantics (round 3): a rapid burst coalesces into one batch
    (the queue never stays quiet for quiet_gap_ms), while an isolated
    request ships after ~the quiet gap, NOT the full SLO window."""
    import time as _t

    def predict(items):
        v = np.asarray([float(i) for i in items])
        return v, v

    # burst: submit everything before the dispatcher can drain it
    with StreamingBatcher(predict, max_batch=256, quiet_gap_ms=50.0,
                          max_wait_ms=500.0) as srv:
        futs = [srv.submit(float(i)) for i in range(100)]
        for i, f in enumerate(futs):
            assert f.result(timeout=30) == (float(i), float(i))
        assert srv.stats()["batches"] == 1

    # trickle: one lone request must not wait out the 10 s SLO
    with StreamingBatcher(predict, max_batch=256, quiet_gap_ms=5.0,
                          max_wait_ms=10_000.0) as srv:
        t0 = _t.monotonic()
        assert srv.submit(4.0).result(timeout=30) == (4.0, 4.0)
        assert _t.monotonic() - t0 < 2.0


def test_stats_latency_decomposition():
    """Per-item latency decomposes into queue wait (enqueue -> ship) plus
    service (ship -> resolved); the decomposition quantiles back the
    BASELINE.md tail-latency ledger and must roughly reconstruct the
    total (same 65536-item window)."""
    import time as _t

    def slow_predict(rows):
        _t.sleep(0.02)                      # visible service component
        v = np.asarray([float(np.sum(r)) for r in rows])
        return v, np.abs(v) + 1.0

    with StreamingBatcher(slow_predict, max_batch=64,
                          quiet_gap_ms=1.0) as srv:
        futs = [srv.submit(np.full(3, i, np.float32)) for i in range(100)]
        for f in futs:
            f.result(timeout=30)
        st = srv.stats()
    for key in ("p50_queue_wait_ms", "p95_queue_wait_ms",
                "p50_service_ms", "p95_service_ms"):
        assert key in st and st[key] >= 0.0
    # service includes the 20 ms sleep; queue wait is bounded by the SLO
    assert st["p50_service_ms"] >= 20.0
    # components cannot exceed the total at matching quantiles by much:
    # p95(total) >= p95(wait) and >= p95(service) up to window jitter
    assert st["p95_latency_ms"] >= st["p95_service_ms"] - 1.0
    assert st["p95_latency_ms"] >= st["p95_queue_wait_ms"] - 1.0


def test_pipelined_mode_correctness_and_overlap():
    """dispatch_fn/fetch_fn mode: same results as synchronous mode, and
    the single-thread software pipeline overlaps batch k+1's 'compute'
    with batch k's fetch (simulated: dispatch is instant, fetch sleeps —
    wall-clock for 2 batches must stay well under 2x the serial cost
    would be with compute serialized behind each fetch)."""
    import time as _t

    def dispatch(rows):
        v = np.asarray([float(np.sum(r)) for r in rows])
        return v

    def fetch(v):
        _t.sleep(0.03)                      # the tunnel roundtrip
        return v, np.abs(v) + 1.0

    with StreamingBatcher(dispatch_fn=dispatch, fetch_fn=fetch,
                          max_batch=8, quiet_gap_ms=1.0) as srv:
        futs = [srv.submit(np.full(2, i, np.float32)) for i in range(32)]
        out = [f.result(timeout=30) for f in futs]
        st = srv.stats()
    for i, (m, s) in enumerate(out):
        assert m == 2.0 * i and s == abs(m) + 1.0
    assert st["requests"] == 32 and st["batches"] >= 4
    assert st["p95_service_ms"] >= 30.0     # includes the fetch sleep


def test_pipelined_mode_validation_requires_pair():
    with pytest.raises(ValueError, match="BOTH"):
        StreamingBatcher(lambda r: (r, r), dispatch_fn=lambda r: r)
    with pytest.raises(ValueError, match="predict_fn"):
        StreamingBatcher()


def test_pipelined_mode_bisects_bad_item():
    """A poisoned item in a pipelined batch is isolated by bisection via
    the composed synchronous path; good items still resolve."""
    def dispatch(rows):
        return rows

    def fetch(rows):
        vals = []
        for r in rows:
            if float(r[0]) == 13.0:
                raise ValueError("poisoned")
            vals.append(float(np.sum(r)))
        v = np.asarray(vals)
        return v, v + 1.0

    with StreamingBatcher(dispatch_fn=dispatch, fetch_fn=fetch,
                          max_batch=64, quiet_gap_ms=1.0) as srv:
        futs = [srv.submit(np.full(2, i, np.float32)) for i in range(20)]
        results = []
        for i, f in enumerate(futs):
            if i == 13:
                with pytest.raises(ValueError, match="poisoned"):
                    f.result(timeout=30)
            else:
                results.append((i, f.result(timeout=30)))
    for i, (m, s) in results:
        assert m == 2.0 * i and s == m + 1.0


def test_backlog_ship_policy():
    """backlog_ship=True skips the capture wait when the dispatcher wakes
    to a non-empty queue after serving a batch, but an idle wake still
    takes the capture path (burst absorption unchanged)."""
    import time as _t
    calls = []

    def predict(rows):
        calls.append(len(rows))
        _t.sleep(0.02)                      # service window builds backlog
        v = np.asarray([float(np.sum(r)) for r in rows])
        return v, v + 1.0

    with StreamingBatcher(predict, max_batch=4096, backlog_ship=True,
                          quiet_gap_ms=2.0, max_wait_ms=25.0) as srv:
        # idle-wake burst: one batch (capture path still active)
        futs = [srv.submit(np.full(2, i, np.float32)) for i in range(500)]
        for f in futs:
            f.result(timeout=30)
        burst_batches = len(calls)
        # sustained trickle during service: backlog ships without the
        # SLO wait — total wall must be well under batches * max_wait
        t0 = _t.perf_counter()
        futs = []
        for i in range(200):
            futs.append(srv.submit(np.full(2, i, np.float32)))
            _t.sleep(0.0002)
        for f in futs:
            f.result(timeout=30)
        wall = _t.perf_counter() - t0
        st = srv.stats()
    assert burst_batches <= 3               # burst still coalesces
    assert st["requests"] == 700
    # sustained phase: ~0.04s submit + a few 20ms services; with the
    # 25 ms SLO wait per batch it would exceed ~0.2 s easily
    assert wall < 1.0
