"""On-chip A/B: fit_nystrom moments='fp32' vs 'df64' (synth6_big 90k).

BASELINE.md records the fp32-vs-fp64 Nystrom serving gap at the DEFAULT
kernel, m=2048, chunk_norm: fp64-CPU median q 2.399 / p95 23.8 vs
fp32-TPU 2.521 — attributed to fp32 kernel entries + projection noise at
the whitening amplification bound (gp/nystrom.py module docstring).
moments='df64' removes both on device; this measures how much of the gap
it closes and what the streaming tier costs (warm fit + extend walls,
same compiled-program accounting as finalize_ab.py).

Both arms share the inducing rows and the fit-time ridge policy; the
predict path stays fp32 in both (its noise was attributed ~0 in the
same-basis stage analysis). A/B RULE (round-3i): both arms go through
fit_nystrom with input_scale passed explicitly — no wrapper asymmetry.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  experiments/nystrom_df64_moments_ab.py \
  > experiments/nystrom_df64_moments_ab.log 2>&1 &
"""
import time

import numpy as np
import jax

from nngp_tpu.data.workload import load_multi_join_workload
from nngp_tpu.eval.qerror import symmetric_qerror
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.gp import fit_nystrom
from nngp_tpu.gp.nystrom import select_inducing
from nngp_tpu.gp.posterior import _auto_input_scale
from nngp_tpu.models.kernel_spec import reference_kernel
from nngp_tpu.utils.timing import sync

M = 2048

print("devices:", jax.devices(), flush=True)
x, y, infos, _e = load_multi_join_workload(
    "workloads/synth6_big_data", schema_name="synth6", dtype=np.float32,
    chunk_norm=True)
x_tr, y_tr, _, x_te, y_te, _, *_r = train_test_val_split(
    x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos)
print(f"train {x_tr.shape} test {x_te.shape}", flush=True)
yv = np.asarray(y_te).ravel()
spec = reference_kernel()
scale = _auto_input_scale(np.asarray(x_tr), spec.layers)
rows = x_tr[select_inducing(x_tr.shape[0], M, seed=0)]
print(f"input_scale {scale}", flush=True)

EXT = 1000


def run_arm(moments, rank_rtol=None):
    common = dict(num_inducing=M, inducing_rows=rows, input_scale=scale,
                  moments=moments, rank_rtol=rank_rtol)
    post = fit_nystrom(spec, x_tr[:-EXT], y_tr[:-EXT], **common)
    sync(post.beta_w)
    t0 = time.perf_counter()
    post = fit_nystrom(spec, x_tr[:-EXT], y_tr[:-EXT], **common)
    sync(post.beta_w)
    t_fit = time.perf_counter() - t0
    ext = post.extend(x_tr[-EXT:], y_tr[-EXT:])
    sync(ext.beta_w)
    t0 = time.perf_counter()
    ext = post.extend(x_tr[-EXT:], y_tr[-EXT:])
    sync(ext.beta_w)
    t_ext = time.perf_counter() - t0
    mm, _ = ext.predict_mean_std_chunked(np.asarray(x_te), chunk=8192)
    t0 = time.perf_counter()          # warm predict wall (df64 predict-
    mm, _ = ext.predict_mean_std_chunked(np.asarray(x_te), chunk=8192)
    t_pred = time.perf_counter() - t0  # side projection costs extra)
    q = symmetric_qerror(np.asarray(mm).ravel() - yv)
    print(f"moments={moments} rtol={ext.rank_rtol:g} "
          f"(finalize={ext.finalize}): "
          f"warm fit {t_fit:.3f}s  extend-{EXT} {t_ext:.3f}s  "
          f"predict-30k {t_pred:.3f}s  "
          f"median q {np.median(q):.4f}  p90 {np.quantile(q, 0.90):.2f}  "
          f"p95 {np.quantile(q, 0.95):.2f}  "
          f"p99 {np.quantile(q, 0.99):.2f}  max {q.max():.1f}", flush=True)
    return q


# round-3k: the gap is the RANK CUT, not stage precision
# (nystrom_prec_attrib.log) — df64 entries unlock the deeper cuts.
ARMS = [("fp32", 1e-8), ("df64", 1e-12), ("df64", 1e-14), ("df64", 1e-10)]
# interleave arms twice to expose tunnel drift (round-3 lesson)
for trial in range(2):
    for moments, rtol in ARMS:
        t0 = time.perf_counter()
        run_arm(moments, rtol)
        print(f"  trial {trial} total (incl. compile on first) "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
