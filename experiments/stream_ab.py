"""A/B the StreamingBatcher policy on the bench's 3.6k-burst workload.

Policies (same code path, different knobs):
  quiet : round-3 quiet-gap capture (quiet_gap_ms=2, max_wait_ms=25)
  early : round-2-style early ship emulated with max_wait_ms=0 (ship the
          moment the first drain empties the queue -> small head batch,
          big tail batch)
  gap05 : quiet gap 0.5 ms, SLO 10 ms

predict_rows is bench-exact: numpy materialization, fixed bucket shapes,
no per-size device slices (no hidden compiles). Interleaved trials.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from nngp_tpu.data.workload import load_single_table_workload
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.gp import fit_gp
from nngp_tpu.models.kernel_spec import reference_kernel
from nngp_tpu.serve.streaming import StreamingBatcher
from nngp_tpu.utils.timing import sync

x, y, infos, _ = load_single_table_workload("workloads/forest_data",
                                            dtype=np.float32)
x_tr, y_tr, _, x_te, y_te, _, _, _, _ = train_test_val_split(
    x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos)
spec = reference_kernel()
post = fit_gp(spec, jnp.asarray(x_tr), jnp.asarray(y_tr), diag_reg=1e-3)
sync((post.l, post.alpha))

buckets = (1024, 2048, 4096)
T0 = time.perf_counter()
def log(msg):
    print(f"[{(time.perf_counter()-T0)*1e3:8.1f}ms] {msg}", flush=True)

def predict_rows(rows):
    t0 = time.perf_counter()
    xb = np.stack(rows)
    nrows = xb.shape[0]
    bucket = next(b for b in buckets if nrows <= b)
    if nrows < bucket:
        xb = np.concatenate([xb, np.tile(xb[-1:], (bucket - nrows, 1))],
                            axis=0)
    m, s = post.predict_mean_std(jnp.asarray(xb))
    out = (np.asarray(m).ravel()[:nrows], np.asarray(s).ravel()[:nrows])
    log(f"  predict n={nrows} bucket={bucket} "
        f"took {(time.perf_counter()-t0)*1e3:.1f}ms")
    return out

for nb in buckets:
    predict_rows([np.asarray(x_te[0])] * nb)

POLICIES = {
    "quiet": dict(quiet_gap_ms=2.0, max_wait_ms=25.0),
    "early": dict(quiet_gap_ms=2.0, max_wait_ms=0.001),
    "gap05": dict(quiet_gap_ms=0.5, max_wait_ms=10.0),
}

def run_trial(name, kw):
    global T0
    T0 = time.perf_counter()
    with StreamingBatcher(predict_rows, max_batch=buckets[-1],
                          **kw) as server:
        t0 = time.perf_counter()
        futs = [server.submit(np.asarray(r)) for r in x_te]
        log("  all submitted")
        for f in futs:
            f.result(timeout=120)
        total = time.perf_counter() - t0
        st = server.stats()
    print(f"{name}: total={total*1e3:.1f}ms qps={x_te.shape[0]/total:.0f} "
          f"batches={st['batches']} p50={st['p50_latency_ms']:.1f} "
          f"p95={st['p95_latency_ms']:.1f}", flush=True)

for trial in range(3):
    for name, kw in POLICIES.items():
        run_trial(name, kw)
