"""Host-fp64 vs device-df64 Nystrom finalize A/B on the real TPU.

Both arms share the same wrapper (fit_nystrom with pinned input_scale —
the A/B RULE from CLAUDE.md), trial-interleaved. Reports warm fit wall,
extend-1000 wall, and forest q-error parity at m=2048, plus the 1M-row
synthetic ladder point with each finalize.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from nngp_tpu.data.workload import load_single_table_workload
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.eval.qerror import symmetric_qerror
from nngp_tpu.gp import fit_nystrom
from nngp_tpu.gp.posterior import input_scale_for_bound
from nngp_tpu.models.kernel_spec import reference_kernel
from nngp_tpu.utils.timing import sync

print("devices:", jax.devices(), flush=True)
x, y, infos, enc = load_single_table_workload(
    "workloads/forest_data", dtype=np.float32)
x_tr, y_tr, _, x_te, y_te, _, _, _, _ = train_test_val_split(
    x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos)
spec = reference_kernel()
s = input_scale_for_bound(enc.max_abs_bound(), spec.layers)
x_te_d = jax.device_put(jnp.asarray(x_te))
M = 2048

results = {}
for trial in range(3):
    for mode in ("host", "device"):
        t0 = time.perf_counter()
        post = fit_nystrom(spec, x_tr[:9800], y_tr[:9800], num_inducing=M,
                           input_scale=s, finalize=mode)
        sync(post.beta_w)
        dt = time.perf_counter() - t0
        results.setdefault((mode, "fit"), []).append(dt)
        t0 = time.perf_counter()
        post2 = post.extend(x_tr[9800:], y_tr[9800:])
        sync(post2.beta_w)
        results.setdefault((mode, "extend"), []).append(
            time.perf_counter() - t0)
        if trial == 0:
            mny, sny = post2.predict_mean_std(x_te_d)
            q = symmetric_qerror(np.asarray(mny).ravel()
                                 - np.asarray(y_te).ravel())
            results[(mode, "q")] = (float(np.median(q)),
                                    float(np.quantile(q, 0.95)))
            results[(mode, "std_mean")] = float(np.asarray(sny).mean())
        print(f"trial {trial} {mode}: fit {dt:.3f}s "
              f"extend {results[(mode, 'extend')][-1]:.3f}s", flush=True)

for mode in ("host", "device"):
    fits = results[(mode, "fit")][1:]      # drop compile trial
    exts = results[(mode, "extend")][1:]
    print(f"{mode}: fit best {min(fits):.3f}s  extend best "
          f"{min(exts):.3f}s  median q {results[(mode, 'q')][0]:.4f}  "
          f"p95 {results[(mode, 'q')][1]:.2f}  "
          f"mean std {results[(mode, 'std_mean')]:.4f}", flush=True)

# 1M-row ladder point, device finalize
rng = np.random.default_rng(0)
n = 1048576
xs = rng.uniform(0, 1000, (n, 20)).astype(np.float32)
ys = rng.standard_normal((n, 1)).astype(np.float32)
for mode in ("host", "device"):
    post = fit_nystrom(spec, xs, ys, num_inducing=M, finalize=mode)
    sync(post.beta_w)
    t0 = time.perf_counter()
    post = fit_nystrom(spec, xs, ys, num_inducing=M, finalize=mode)
    sync(post.beta_w)
    print(f"1M-row m={M} warm fit ({mode}): "
          f"{time.perf_counter() - t0:.2f}s", flush=True)
