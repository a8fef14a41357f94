"""On-chip decomposition of the streaming p95: where do the ~58 ms beyond
the 42 ms device batch go?  (BENCH after the host-side fix: p95 100.75 ms,
1 batch, vs a stubbed-45ms-device host profile of ~53 ms.)

Stages timed per streaming batch, same fit/bucketing as bench.py:
  stack   np.stack of the submitted rows
  pad     tile+concat up to the power-of-two bucket
  h2d     jnp.asarray(xb) + blocking sync (tunnel upload, 4096x61 fp32)
  device  predict_mean_std on the resident array + sync
  fetch   np.asarray of mean/std (result download)

Also A/Bs two candidate cuts:
  - pinned pad rows: pad with a PREBUILT device-resident pad block and
    concat on device instead of tiling on host (smaller upload);
  - async dispatch: jnp.asarray + predict WITHOUT an intermediate sync
    (the tunnel may overlap upload with compute).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  experiments/stream_tpu_profile.py > experiments/stream_tpu_profile.log 2>&1 &
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
from nngp_tpu.utils.timing import sync

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
print("fit ready", flush=True)

BUCKET = 4096
rows = [np.asarray(r) for r in x_te]          # 3600 pre-encoded rows
N = len(rows)

# warm the predict compile at the bucket shape
sync(post.predict_mean_std(jnp.asarray(np.zeros((BUCKET, x_te.shape[1]),
                                                np.float32))))
print("bucket compile warm", flush=True)


def staged(rows):
    t = {}
    t0 = time.perf_counter()
    xb = np.stack(rows)
    t["stack"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    nrows = xb.shape[0]
    if nrows < BUCKET:
        xb = np.concatenate([xb, np.tile(xb[-1:], (BUCKET - nrows, 1))], 0)
    t["pad"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    xd = jnp.asarray(xb)
    sync(xd)
    t["h2d"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    m, sd = post.predict_mean_std(xd)
    sync((m, sd))
    t["device"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    mh, sh = np.asarray(m).ravel()[:nrows], np.asarray(sd).ravel()[:nrows]
    t["fetch"] = time.perf_counter() - t0
    t["total"] = sum(t.values())
    return t, mh, sh


def fused(rows):
    """bench.py's actual path: no intermediate syncs."""
    t0 = time.perf_counter()
    xb = np.stack(rows)
    nrows = xb.shape[0]
    if nrows < BUCKET:
        xb = np.concatenate([xb, np.tile(xb[-1:], (BUCKET - nrows, 1))], 0)
    m, sd = post.predict_mean_std(jnp.asarray(xb))
    mh = np.asarray(m).ravel()[:nrows]
    sh = np.asarray(sd).ravel()[:nrows]
    return time.perf_counter() - t0


pad_dev = jax.device_put(jnp.zeros((BUCKET, x_te.shape[1]), jnp.float32))


def device_pad(rows):
    """Upload only the real rows; pad by device-side dynamic_update_slice
    into a resident zero block (predict ignores pad rows' outputs)."""
    t0 = time.perf_counter()
    xb = np.stack(rows)
    nrows = xb.shape[0]
    xd = jax.lax.dynamic_update_slice(pad_dev, jnp.asarray(xb), (0, 0))
    m, sd = post.predict_mean_std(xd)
    mh = np.asarray(m).ravel()[:nrows]
    sh = np.asarray(sd).ravel()[:nrows]
    return time.perf_counter() - t0


for trial in range(4):
    t, _, _ = staged(rows)
    print(f"[staged {trial}] " + "  ".join(
        f"{k} {v*1e3:.1f}" for k, v in t.items()), flush=True)

for trial in range(4):
    print(f"[fused {trial}] {fused(rows)*1e3:.1f} ms", flush=True)

# warm the update_slice+predict program, then time
device_pad(rows)
for trial in range(4):
    print(f"[device_pad {trial}] {device_pad(rows)*1e3:.1f} ms", flush=True)

# exact-shape compile: is padding even worth it vs a 3600-row program?
sync(post.predict_mean_std(jnp.asarray(np.stack(rows))))
for trial in range(4):
    t0 = time.perf_counter()
    m, sd = post.predict_mean_std(jnp.asarray(np.stack(rows)))
    _ = np.asarray(m), np.asarray(sd)
    print(f"[exact3600 {trial}] {(time.perf_counter()-t0)*1e3:.1f} ms",
          flush=True)


def fused_stacked(rows):
    """Candidate fix: stack mean/std on device, fetch ONCE."""
    t0 = time.perf_counter()
    xb = np.stack(rows)
    nrows = xb.shape[0]
    if nrows < BUCKET:
        xb = np.concatenate([xb, np.tile(xb[-1:], (BUCKET - nrows, 1))], 0)
    m, sd = post.predict_mean_std(jnp.asarray(xb))
    ms = np.asarray(jnp.stack([jnp.ravel(m), jnp.ravel(sd)]))
    mh, sh = ms[0, :nrows], ms[1, :nrows]
    return time.perf_counter() - t0


fused_stacked(rows)   # warm the stack program
for trial in range(4):
    print(f"[fused_stacked {trial}] {fused_stacked(rows)*1e3:.1f} ms",
          flush=True)
