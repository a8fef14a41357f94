"""Serving tail-latency ledger: decompose p95 under the remote-TPU tunnel.

Round-5 evidence task (VERDICT item 7): the streaming p95 (66-76 ms closed
loop, 86-185 ms open loop at the knee) needs the same rigor as the MFU
ledger — WHERE does the tail go? This script produces the BASELINE.md
tail-latency table:

1. tunnel floor: trivial dispatch+fetch roundtrip (the per-dispatch cost
   no batching policy can remove on this image);
2. warm batch service anatomy per bucket size b: host prep (np.stack +
   pad), dispatch wall (async predict call returns), blocking fetch wall
   (tunnel + device compute + D2H) — measured back-to-back warm;
3. open-loop runs at three offered rates: per-item p50/p95 total latency
   with the batcher's own decomposition (queue wait = enqueue -> ship,
   service = ship -> resolved) from StreamingBatcher.stats().

Run (chip must be otherwise idle):
  PYTHONPATH=/root/repo:/root/.axon_site nohup python \
    experiments/serve_tail_ledger.py > experiments/serve_tail_ledger.log 2>&1 &
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
SECS = 10.0
BUCKETS = (64, 256, 1024, 4096)

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

# ---- 1. tunnel floor -----------------------------------------------------
trivial = jax.jit(lambda a: a + 1.0)
small = jnp.ones((8, 128))
np.asarray(trivial(small))
floors = []
for _ in range(20):
    t0 = time.perf_counter()
    np.asarray(trivial(small))
    floors.append(time.perf_counter() - t0)
floors = np.asarray(floors) * 1e3
print(f"\ntunnel floor (trivial dispatch+fetch, 20 reps): "
      f"p50 {np.quantile(floors, .5):.1f} ms  p95 "
      f"{np.quantile(floors, .95):.1f} ms  min {floors.min():.1f} ms",
      flush=True)

# ---- 2. warm batch service anatomy --------------------------------------
rows_pool = [np.asarray(r) for r in x_te]
NP = len(rows_pool)
print(f"\n{'bucket':>7} {'prep_ms':>8} {'dispatch_ms':>12} {'fetch_ms':>9} "
      f"{'total_ms':>9}  (p50 of 15 warm reps)", flush=True)
for b in BUCKETS:
    rows = [rows_pool[i % NP] for i in range(b)]
    # warm the program
    xb = np.stack(rows)
    m0, s0 = post.predict_mean_std(jnp.asarray(xb))
    np.asarray(jnp.stack([jnp.ravel(m0), jnp.ravel(s0)]))
    preps, disps, fetches = [], [], []
    for _ in range(15):
        t0 = time.perf_counter()
        xb = np.stack(rows)
        t1 = time.perf_counter()
        m, sd = post.predict_mean_std(jnp.asarray(xb))
        stacked = jnp.stack([jnp.ravel(m), jnp.ravel(sd)])
        t2 = time.perf_counter()
        np.asarray(stacked)
        t3 = time.perf_counter()
        preps.append(t1 - t0)
        disps.append(t2 - t1)
        fetches.append(t3 - t2)
    p, d, f = (np.quantile(np.asarray(v) * 1e3, 0.5)
               for v in (preps, disps, fetches))
    print(f"{b:>7} {p:>8.2f} {d:>12.2f} {f:>9.2f} {p + d + f:>9.2f}",
          flush=True)

# ---- 3. open-loop decomposition at three rates ---------------------------
BUCKETS_SRV = (64, 128, 256, 512, 1024, 2048, 4096)


def predict_rows(rows):
    xb = np.stack(rows)
    n = xb.shape[0]
    bucket = next(bb for bb in BUCKETS_SRV if n <= bb)
    if n < bucket:
        xb = np.concatenate([xb, np.tile(xb[-1:], (bucket - n, 1))], 0)
    m, sd = post.predict_mean_std(jnp.asarray(xb))
    ms = np.asarray(jnp.stack([jnp.ravel(m), jnp.ravel(sd)]))
    return ms[0, :n], ms[1, :n]


for b in BUCKETS_SRV:
    predict_rows([rows_pool[0]] * b)
print("\nbuckets warm", flush=True)

print(f"\n{'rate':>7} {'achieved':>9} {'p50ms':>7} {'p95ms':>7} "
      f"{'p50wait':>8} {'p95wait':>8} {'p50serv':>8} {'p95serv':>8} "
      f"{'batches':>8} {'meanB':>6}", flush=True)
for rate in RATES:
    with StreamingBatcher(predict_rows, max_batch=4096) as srv:
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
    print(f"{rate:>7} {sent / wall:>9.0f} {st['p50_latency_ms']:>7.1f} "
          f"{st['p95_latency_ms']:>7.1f} {st['p50_queue_wait_ms']:>8.1f} "
          f"{st['p95_queue_wait_ms']:>8.1f} {st['p50_service_ms']:>8.1f} "
          f"{st['p95_service_ms']:>8.1f} {st['batches']:>8} "
          f"{st['mean_batch']:>6.0f}", flush=True)
print("done", flush=True)
