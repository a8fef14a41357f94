"""Sustained-load serving: open-loop latency vs offered throughput.

The bench's streaming row measures ONE 3.6k closed-loop burst. A production
server sees a continuous arrival stream; the honest SLO evidence is an
OPEN-LOOP curve — arrivals paced by a clock, not by completions, so queueing
delay shows up instead of being absorbed by a slower client. This drives the
same predict path as bench.py (forest 10.8k posterior, power-of-two bucket
pad, single stacked fetch) through the StreamingBatcher at fixed offered
rates and reports p50/p95/p99 + achieved qps + batch-size profile per rate.

Pacing: per-millisecond quota against time.monotonic (per-item sleeps can't
hit >1k qps from Python). Each rate runs `--secs` seconds after a 1 s
warm-in discarded.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  experiments/serve_sustained.py > experiments/serve_sustained.log 2>&1 &
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from nngp_tpu.data.workload import load_single_table_workload
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.gp import fit_gp
from nngp_tpu.gp.posterior import input_scale_for_bound
from nngp_tpu.models.kernel_spec import reference_kernel
from nngp_tpu.serve.streaming import StreamingBatcher
from nngp_tpu.utils.timing import sync

ap = argparse.ArgumentParser()
ap.add_argument("--rates", type=int, nargs="+",
                default=[500, 2000, 8000, 16000, 32000])
ap.add_argument("--secs", type=float, default=10.0)
args = ap.parse_args()

print("devices:", jax.devices(), flush=True)
x, y, infos, enc = load_single_table_workload(
    "workloads/forest_data", dtype=np.float32)
x_tr, y_tr, _, x_te, y_te, _, *_ = train_test_val_split(
    x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos)
spec = reference_kernel()
s = input_scale_for_bound(enc.max_abs_bound(), spec.layers)
post = fit_gp(spec, jnp.asarray(x_tr), jnp.asarray(y_tr), diag_reg=1e-3,
              get="nngp", input_scale=s)
sync((post.l, post.alpha))

BUCKETS = (64, 128, 256, 512, 1024, 2048, 4096)
D = x_te.shape[1]


def predict_rows(rows):
    xb = np.stack(rows)
    n = xb.shape[0]
    bucket = next(b for b in BUCKETS if n <= b)
    if n < bucket:
        xb = np.concatenate([xb, np.tile(xb[-1:], (bucket - n, 1))], 0)
    m, sd = post.predict_mean_std(jnp.asarray(xb))
    ms = np.asarray(jnp.stack([jnp.ravel(m), jnp.ravel(sd)]))
    return ms[0, :n], ms[1, :n]


for b in BUCKETS:                      # pay every compile before the clock
    predict_rows([np.asarray(x_te[0])] * b)
print("buckets warm", flush=True)

rows_pool = [np.asarray(r) for r in x_te]
NP = len(rows_pool)

print(f"{'rate':>7} {'achieved':>9} {'p50ms':>7} {'p95ms':>7} {'p99ms':>7} "
      f"{'batches':>8} {'meanB':>7} {'maxB':>6}", flush=True)

for rate in args.rates:
    with StreamingBatcher(predict_rows, max_batch=4096) as srv:
        futs = []
        n_total = int(rate * (args.secs + 1.0))
        t_start = time.monotonic()
        sent = 0
        # per-ms quota pacing
        while sent < n_total:
            now = time.monotonic()
            target = min(n_total, int((now - t_start) * rate) + 1)
            while sent < target:
                futs.append(srv.submit(rows_pool[sent % NP]))
                sent += 1
            time.sleep(0.0005)
        for f in futs:
            f.result(timeout=120)
        wall = time.monotonic() - t_start
        st = srv.stats()
    achieved = sent / wall
    # stats() keeps the LAST 65536 latencies, so at high rates the
    # quantiles naturally reflect steady state, not the warm-in
    print(f"{rate:>7} {achieved:>9.0f} {st['p50_latency_ms']:>7.1f} "
          f"{st['p95_latency_ms']:>7.1f} {st['p99_latency_ms']:>7.1f} "
          f"{st['batches']:>8} {st['mean_batch']:>7.0f} "
          f"{st['max_batch']:>6.0f}", flush=True)
print("done", flush=True)
