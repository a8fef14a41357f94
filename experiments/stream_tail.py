"""Measure streaming p95 on the real chip (round-3 pipeline tuning).

    python experiments/stream_tail.py
"""
import os
import sys
import time

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

def predict_rows(rows):
    xb = np.stack(rows)
    nrows = xb.shape[0]
    bucket = buckets[0] if nrows <= buckets[0] else buckets[1]
    if nrows < bucket:
        xb = np.concatenate([xb, np.tile(xb[-1:], (bucket - nrows, 1))], axis=0)
    m, s = post.predict_mean_std(jnp.asarray(xb[:bucket]))
    return m.ravel()[:nrows], s.ravel()[:nrows]

for nb in buckets:
    predict_rows([np.asarray(x_te[0])] * nb)

for trial in range(3):
    with StreamingBatcher(predict_rows, max_batch=buckets[-1], max_wait_ms=5.0) as server:
        t0 = time.perf_counter()
        futs = [server.submit(np.asarray(r)) for r in x_te]
        for f in futs:
            f.result(timeout=120)
        total = time.perf_counter() - t0
        st = server.stats()
    print(f"trial {trial}: qps={x_te.shape[0]/total:.0f} batches={st['batches']} "
          f"sizes_mean={st['mean_batch']:.0f} p50={st['p50_latency_ms']:.1f} "
          f"p95={st['p95_latency_ms']:.1f} p99={st['p99_latency_ms']:.1f}")
