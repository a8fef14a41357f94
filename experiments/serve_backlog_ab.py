"""A/B: capture-wait policy under sustained open-loop load.

NOTE: a PI arm (pipelined+backlog_ship) wedged >120 s mid-trial on the
axon tunnel in the first run (log head) — the mechanism passes controlled
on-chip tests (two-in-flight fetches overlap: 51 ms for two 256-bucket
fetches vs ~134 ms serial), but under sustained open-loop load the client
wedges nondeterministically. Pipelined mode stays opt-in and is NOT
recommended over this tunnel; arms here are S and I only.

Arms (interleaved per rate, round-3i A/B rule):
  S  = synchronous dispatcher, quiet-gap capture always (round-3 default)
  I  = synchronous + backlog_ship: skip the capture wait when the queue is
       already non-empty at wake after serving a batch — the previous
       service roundtrip already did the grouping (serve_tail_ledger
       showed p95 queue wait > p95 service at every rate)
  PI = pipelined (dispatch_fn/fetch_fn) + backlog_ship: additionally hide
       device compute behind the previous fetch (pure pipelining WITHOUT
       backlog_ship measured a 2x p50 LOSS — serve_pipeline_ab.log)

Run (chip idle): PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  experiments/serve_backlog_ab.py > experiments/serve_backlog_ab.log 2>&1 &
"""
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

RATES = [2000, 8000, 32000]
SECS = 8.0
TRIALS = 2

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
rows_pool = [np.asarray(r) for r in x_te]
NP = len(rows_pool)


def _pad(rows):
    xb = np.stack(rows)
    n = xb.shape[0]
    bucket = next(b for b in BUCKETS if n <= b)
    if n < bucket:
        xb = np.concatenate([xb, np.tile(xb[-1:], (bucket - n, 1))], 0)
    return xb, n


def predict_rows(rows):
    xb, n = _pad(rows)
    m, sd = post.predict_mean_std(jnp.asarray(xb))
    ms = np.asarray(jnp.stack([jnp.ravel(m), jnp.ravel(sd)]))
    return ms[0, :n], ms[1, :n]


def dispatch_rows(rows):
    xb, n = _pad(rows)
    m, sd = post.predict_mean_std(jnp.asarray(xb))
    return jnp.stack([jnp.ravel(m), jnp.ravel(sd)]), n


def fetch_rows(handle):
    arr, n = handle
    ms = np.asarray(arr)
    return ms[0, :n], ms[1, :n]


for b in BUCKETS:
    predict_rows([rows_pool[0]] * b)
print("buckets warm", flush=True)

ARMS = {
    "S": dict(),
    "I": dict(backlog_ship=True),
    "PI": dict(dispatch_fn=dispatch_rows, fetch_fn=fetch_rows,
               backlog_ship=True),
}


def run_trial(rate, arm):
    kw = dict(ARMS[arm])
    pf = None if "dispatch_fn" in kw else predict_rows
    with StreamingBatcher(pf, max_batch=4096, **kw) as srv:
        futs = []
        n_total = int(rate * (SECS + 1.0))
        t_start = time.monotonic()
        sent = 0
        while sent < n_total:
            now = time.monotonic()
            target = min(n_total, int((now - t_start) * rate) + 1)
            while sent < target:
                futs.append(srv.submit(rows_pool[sent % NP]))
                sent += 1
            time.sleep(0.0005)
        for fut in futs:
            fut.result(timeout=120)
        wall = time.monotonic() - t_start
        st = srv.stats()
    return sent / wall, st


print(f"\n{'rate':>7} {'arm':>4} {'achieved':>9} {'p50ms':>7} {'p95ms':>7} "
      f"{'p99ms':>7} {'p95wait':>8} {'p95serv':>8} {'batches':>8} "
      f"{'meanB':>6}", flush=True)
for rate in RATES:
    for trial in range(TRIALS):
        for arm in ("S", "I"):
            ach, st = run_trial(rate, arm)
            print(f"{rate:>7} {arm:>4} {ach:>9.0f} "
                  f"{st['p50_latency_ms']:>7.1f} "
                  f"{st['p95_latency_ms']:>7.1f} "
                  f"{st['p99_latency_ms']:>7.1f} "
                  f"{st['p95_queue_wait_ms']:>8.1f} "
                  f"{st['p95_service_ms']:>8.1f} {st['batches']:>8} "
                  f"{st['mean_batch']:>6.0f}", flush=True)

# closed-loop burst sanity: backlog_ship must NOT fragment the classic
# 3.6k burst (idle wake takes the capture path)
for arm in ("S", "I"):
    kw = dict(ARMS[arm])
    pf = None if "dispatch_fn" in kw else predict_rows
    best, best_st = float("inf"), None
    for _ in range(3):
        with StreamingBatcher(pf, max_batch=4096, **kw) as srv:
            t0 = time.monotonic()
            futs = [srv.submit(r) for r in rows_pool]
            for f in futs:
                f.result(timeout=120)
            el = time.monotonic() - t0
            st = srv.stats()
        if el < best:
            best, best_st = el, st
    print(f"burst {arm:>3}: qps {NP / best:>8.0f}  "
          f"p95 {best_st['p95_latency_ms']:>6.1f} ms  "
          f"batches {best_st['batches']}", flush=True)
print("done", flush=True)
