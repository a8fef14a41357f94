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
