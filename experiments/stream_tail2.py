"""Instrumented streaming-tail run: where does each batch's time go?"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from nngp_tpu.data.workload import load_single_table_workload
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.gp import fit_gp
from nngp_tpu.models.kernel_spec import reference_kernel
from nngp_tpu.serve.streaming import StreamingBatcher

x, y, infos, _ = load_single_table_workload("workloads/forest_data", dtype=np.float32)
x_tr, y_tr, _, x_te, y_te, _, _, _, _ = train_test_val_split(
    x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos)
spec = reference_kernel()
post = fit_gp(spec, jnp.asarray(x_tr), jnp.asarray(y_tr), diag_reg=1e-3)

buckets = (1024, 4096)
T0 = time.perf_counter()
def log(msg):
    print(f"[{(time.perf_counter()-T0)*1e3:8.1f}ms] {msg}", flush=True)

def predict_rows(rows):
    t0 = time.perf_counter()
    xb = np.stack(rows)
    nrows = xb.shape[0]
    bucket = buckets[0] if nrows <= buckets[0] else buckets[1]
    if nrows < bucket:
        xb = np.concatenate([xb, np.tile(xb[-1:], (bucket - nrows, 1))], axis=0)
    m, s = post.predict_mean_std(jnp.asarray(xb[:bucket]))
    out = (m.ravel()[:nrows], s.ravel()[:nrows])
    log(f"predict_rows n={nrows} bucket={bucket} took {(time.perf_counter()-t0)*1e3:.1f}ms")
    return out

for nb in buckets:
    predict_rows([np.asarray(x_te[0])] * nb)
# warm every slice shape ONCE? no - intentionally not; see what cold shapes cost

import nngp_tpu.serve.streaming as S
orig_resolve = S.StreamingBatcher._resolve
def timed_resolve(self, items, futs, t_enq):
    t0 = time.perf_counter()
    orig_resolve(self, items, futs, t_enq)
    log(f"resolve n={len(items)} took {(time.perf_counter()-t0)*1e3:.1f}ms")
S.StreamingBatcher._resolve = timed_resolve

def run_trial(trial):
    global T0
    T0 = time.perf_counter()
    with StreamingBatcher(predict_rows, max_batch=buckets[-1]) as server:
        t0 = time.perf_counter()
        futs = [server.submit(np.asarray(r)) for r in x_te]
        log("all submitted")
        for f in futs:
            f.result(timeout=120)
        total = time.perf_counter() - t0
        st = server.stats()
    log(f"trial {trial}: qps={x_te.shape[0]/total:.0f} batches={st['batches']} p50={st['p50_latency_ms']:.1f} p95={st['p95_latency_ms']:.1f}")

for trial in range(2):
    run_trial(trial)
