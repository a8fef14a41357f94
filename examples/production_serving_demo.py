"""End-to-end production serving lifecycle in one runnable script.

The reference stops at `est.predict(query_lines)` behind an out-of-repo
PostgreSQL plugin (`/root/reference/neuroestimator/README.md`). This demo
walks the FULL operations story this framework adds around that API, on a
tiny synthetic schema so it runs in ~a minute on CPU (`JAX_PLATFORMS=cpu`)
and unchanged on the TPU:

  1.  fit + checkpoint            Estimator(...).load_model() / save()
  2.  restart from disk           Estimator.restore()  (no refit)
  3.  bucket warmup               est.warmup()  (no mid-traffic compiles)
  4.  TCP serving                 EstimatorSocketServer + a socket client
  5.  uncertainty calibration     est.calibrate_uncertainty(feedback)
  6.  conformal intervals         est.predict_interval(lines)
  7.  online extension            est.extend_with_lines(feedback)
  8.  drift watch + remediation   est.record_feedback() -> DriftReport
  9.  hyper relearning            est.relearn_hyperparams()

Run: PYTHONPATH=. JAX_PLATFORMS=cpu python examples/production_serving_demo.py
"""
import json
import os
import socket
import tempfile

import numpy as np

from nngp_tpu.featurize.stats import ColumnStats, TableStats
from nngp_tpu.serve import Estimator, EstimatorSocketServer


def make_workload(tmp):
    """2-table schema + labeled queries in the serving grammar."""
    ta = TableStats("ta", (ColumnStats("id", "numerical", 0, 100),
                           ColumnStats("x", "numerical", -10, 10)),
                    chunk_size=8)
    tb = TableStats("tb", (ColumnStats("id", "numerical", 0, 100),
                           ColumnStats("y", "numerical", 0, 1)),
                    chunk_size=8)
    qdir = os.path.join(tmp, "queries")
    os.makedirs(qdir)
    rng = np.random.default_rng(0)

    def line(lo_scale=1.0):
        xu = rng.uniform(-10, 10)
        xl = rng.uniform(-10, xu)
        card = max(1, int(lo_scale * 1000 * (xu - xl)))
        return f"ta,tb@x,{xu:.3f},{xl:.3f}@@ta,tb,id@{card}"

    with open(os.path.join(qdir, "join_query_2.txt"), "w") as f:
        f.write("\n".join(line() for _ in range(120)) + "\n")
    # held-out labeled feedback (same distribution; > the drift
    # monitor's 128-observation baseline warmup) + a DRIFTED batch
    # (the true cardinality function changed by 4x)
    feedback = [line() for _ in range(150)]
    drifted = [line(lo_scale=4.0) for _ in range(150)]
    return [ta, tb], qdir, feedback, drifted


def main():
    tmp = tempfile.mkdtemp(prefix="nngp_demo_")
    stats, qdir, feedback, drifted = make_workload(tmp)

    # -- 1. fit + checkpoint ------------------------------------------------
    est = Estimator("demo", data_path=None, train_query_path=qdir,
                    stats=stats, dtype=np.float64, verbose=False)
    est.load_model(verbose=False)
    ckpt = os.path.join(tmp, "ckpt")
    est.save(ckpt)
    print(f"[1] fitted on {est.posterior.num_train} queries; "
          f"checkpoint -> {ckpt}")

    # -- 2. a server restart is a file load, not a refit --------------------
    est = Estimator.restore(ckpt)
    print("[2] restored from checkpoint")

    # -- 3. pre-compile every serving bucket BEFORE traffic -----------------
    est.warmup(max_batch=128, verbose=False)
    print("[3] buckets warm (64, 128)")

    # -- 4. TCP serving: newline queries in, JSON estimates out -------------
    test_lines = ["ta,tb@x,5.0,-5.0@@ta,tb,id", "ta,tb@@y,0.9,0.1@ta,tb,id"]
    with EstimatorSocketServer(est, port=0) as srv:
        with socket.create_connection((srv.host, srv.port)) as c:
            c.sendall(("\n".join(test_lines) + "\n").encode())
            buf = b""
            while buf.count(b"\n") < len(test_lines):
                buf += c.recv(4096)
        for raw in buf.decode().strip().splitlines():
            r = json.loads(raw)
            print(f"[4] served: mean={r['mean']:.2f} std={r['std']:.2f} "
                  f"card~{r['card']:.0f}")

    # -- 5+6. calibrate on held-out feedback, then conformal intervals ------
    scale = est.calibrate_uncertainty(feedback, verbose=False)
    mean, lo, hi = est.predict_interval(test_lines, alpha=0.2)
    print(f"[5] calibrated std scale = {scale:.3f}")
    print(f"[6] 80% conformal card interval for line 0: "
          f"2^{lo[0]:.2f} .. 2^{hi[0]:.2f}")

    # -- 7. fold labeled feedback into the posterior (incremental) ----------
    n0 = est.posterior.num_train
    est.extend_with_lines(feedback)
    print(f"[7] extended {n0} -> {est.posterior.num_train} rows "
          f"(block-Cholesky append, no refit)")

    # -- 8. drift watch: healthy stream, then a drifted one -----------------
    rep = est.record_feedback(feedback)
    print(f"[8] in-distribution feedback: drift={rep.drift}")
    rep = est.record_feedback(drifted)
    print(f"[8] 4x-shifted workload:     drift={rep.drift} "
          f"(remediation hint: {rep.action})")

    # -- 9. remediate: relearn kernel hypers on the grown train set ---------
    if rep.drift:
        est.extend_with_lines(drifted)      # label + absorb the new regime
        est.relearn_hyperparams(steps=30, verbose=False)
        est.drift_monitor.reset()
        cardless = ["@".join(l.split("@")[:-1]) for l in drifted[:4]]
        mean2, _ = est.predict(cardless)
        print(f"[9] relearned hypers on {est.posterior.num_train} rows; "
              f"first drifted-query predictions now {np.round(mean2, 2)}")
    est.save(ckpt)                          # artifacts ride the checkpoint

    # -- 10. the same loop OVER THE WIRE: labeled lines as feedback ----------
    # (feedback_mode='online': ack immediately, monitor + extend in the
    # background; 'auto' additionally applies drift remediations)
    more = ["ta,tb@x,4.1,0.2@@ta,tb,id@3900", "ta,tb@x,7.7,1.0@@ta,tb,id@6700"]
    n0 = est.posterior.num_train
    with EstimatorSocketServer(est, port=0, feedback_mode="online",
                               feedback_flush_s=0.2) as srv:
        with socket.create_connection((srv.host, srv.port)) as c:
            c.sendall(("\n".join(more + ["\\stats"]) + "\n").encode())
            buf = b""
            while buf.count(b"\n") < 3:
                buf += c.recv(4096)
        import time
        deadline = time.monotonic() + 30
        while (est.posterior.num_train < n0 + 2
               and time.monotonic() < deadline):
            time.sleep(0.05)
        st = srv.stats()
    print(f"[10] wire feedback: {st['feedback_lines']} labeled lines -> "
          f"posterior {n0} -> {est.posterior.num_train} rows, "
          f"drift obs {est.drift_monitor.n}")
    print("done — every step above is also exercised in tests/")


if __name__ == "__main__":
    main()
