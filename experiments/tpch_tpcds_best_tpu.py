"""One-flag production drive of the round-5 workload families ON CHIP:
Estimator(quality='best', tier='auto') on synthtpch and synthtpcds with a
HONEST held-out protocol — 60% of each arity file's lines go into a temp
training dir the Estimator reads; the held-out 40% (never seen by fit,
hyperopt, or calibration) provides served q-error, calibration MAE of the
served (temperature-scaled) std, and conformal 90% coverage.

quality='best' routes the decision table (chunk_norm is a no-op here —
all-numerical schemas; ARD evidence-learned hypers ON CHIP; 10%
calibration holdout -> MLE std temperature + conformal scores);
tier='auto' routes both fits to the single-chip exact tier.

Run (chip idle): PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  experiments/tpch_tpcds_best_tpu.py > experiments/tpch_tpcds_best_tpu.log 2>&1 &
"""
import itertools
import os
import tempfile
import time

import numpy as np
import jax

from nngp_tpu.eval.calibration import calibration_mae, calibration_table
from nngp_tpu.eval.qerror import symmetric_qerror
from nngp_tpu.serve import Estimator

print("devices:", jax.devices(), flush=True)

for name in ("synthtpch", "synthtpcds"):
    qdir = f"workloads/{name}_data"
    sdir = f"workloads/{name}_stats"
    rng = np.random.default_rng(11)
    train_dir = tempfile.mkdtemp(prefix=f"{name}_train_")
    test_lines = []
    for k in itertools.count(1):
        try:
            with open(f"{qdir}/join_query_{k}.txt") as f:
                lines = [l.strip() for l in f if l.strip()]
        except FileNotFoundError:
            break
        perm = rng.permutation(len(lines))
        cut = int(0.6 * len(lines))
        with open(os.path.join(train_dir,
                               f"join_query_{k}.txt"), "w") as f:
            f.write("\n".join(lines[i] for i in perm[:cut]) + "\n")
        test_lines += [lines[i] for i in perm[cut:]]
    print(f"[{name}] held-out test lines: {len(test_lines)}", flush=True)

    t0 = time.time()
    est = Estimator(name, data_path=None, train_query_path=train_dir,
                    stats_dir=sdir, dtype=np.float32, verbose=True,
                    quality="best", tier="auto")
    print(f"[{name}] quality=best fit in {time.time() - t0:.1f}s "
          f"(std_scale {est.std_scale:.3f})", flush=True)

    cardless = ["@".join(l.split("@")[:-1]) for l in test_lines]
    truth = np.array([float(l.split("@")[-1]) for l in test_lines])
    y_log = np.log2(np.maximum(truth, 1.0))

    t0 = time.time()
    mean, std = est.predict(cardless)
    print(f"[{name}] predict {len(cardless)} held-out lines in "
          f"{time.time() - t0:.2f}s", flush=True)
    q = symmetric_qerror(mean - y_log)
    print(f"[{name}] HELD-OUT served median q {np.median(q):.4f} "
          f"p95 {np.quantile(q, 0.95):.3f} "
          f"p99 {np.quantile(q, 0.99):.2f}", flush=True)
    mae = calibration_mae(calibration_table(y_log, mean, std))
    print(f"[{name}] calibration MAE (served std): {mae:.4f}", flush=True)
    _m, lo, hi = est.predict_interval(cardless, alpha=0.1)
    cov = float(np.mean((y_log >= lo) & (y_log <= hi)))
    print(f"[{name}] conformal 90% interval coverage: {cov:.3f}",
          flush=True)
print("done", flush=True)
