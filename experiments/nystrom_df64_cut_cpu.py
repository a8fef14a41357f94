"""CPU A/B: does the df64-entry deep rank cut close the fp32 serving gap?

Round-3k attribution (nystrom_prec_attrib.log) pinned the 90k fp32-vs-fp64
Nystrom serving gap (2.52 vs 2.40 median q) entirely on the whitening rank
cut: fp32 K_mm ENTRY noise forbids cutting below ~1e-8. moments='df64'
computes the entries in double-float and its default cut is now 1e-12
(gp/nystrom._default_rank_rtol). This measures the end-to-end serving
q-error of that combination in the fp32 jax pipeline on CPU — entry noise
and the df64 slice products are backend-independent (int32 accumulation is
exact on CPU and TPU alike, ops/df64.py), so the accuracy conclusion
transfers; walls here are 1-core CPU and NOT comparable to chip numbers.

fp32 arms run WITHOUT x64 (faithful TPU numerics, round-3 pattern from
nystrom_join_big.py); pass --x64 in a separate process for the fp64
oracle arm.

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu nohup python \
  experiments/nystrom_df64_cut_cpu.py [data_dir] [--x64] \
  > experiments/nystrom_df64_cut_cpu.log 2>&1 &
"""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
X64 = "--x64" in sys.argv
if X64:
    jax.config.update("jax_enable_x64", True)

from nngp_tpu.data.workload import load_multi_join_workload
from nngp_tpu.eval.qerror import symmetric_qerror
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.gp import fit_nystrom
from nngp_tpu.gp.nystrom import select_inducing
from nngp_tpu.gp.posterior import _auto_input_scale
from nngp_tpu.models.kernel_spec import reference_kernel
from nngp_tpu.utils.timing import sync

M = 2048
_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
DATA = _pos[0] if _pos else "workloads/synth6_join_data"
DT = np.float64 if X64 else np.float32

print("devices:", jax.devices(), "data:", DATA, "x64:", X64, flush=True)
x, y, infos, _e = load_multi_join_workload(
    DATA, schema_name="synth6", dtype=DT, chunk_norm=True)
x_tr, y_tr, _, x_te, y_te, _, *_r = train_test_val_split(
    x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos)
print(f"train {x_tr.shape} test {x_te.shape}", flush=True)
yv = np.asarray(y_te).ravel()
spec = reference_kernel()
scale = _auto_input_scale(np.asarray(x_tr), spec.layers)
idx = select_inducing(x_tr.shape[0], M, seed=0)
print(f"input_scale {scale}", flush=True)


def run_arm(tag, moments, rank_rtol):
    t0 = time.perf_counter()
    post = fit_nystrom(spec, x_tr, y_tr, num_inducing=M,
                       inducing_rows=x_tr[idx], input_scale=scale,
                       moments=moments, rank_rtol=rank_rtol)
    sync(post.beta_w)
    t_fit = time.perf_counter() - t0
    mm, _ = post.predict_mean_std_chunked(np.asarray(x_te), chunk=8192)
    q = symmetric_qerror(np.asarray(mm).ravel() - yv)
    print(f"{tag} rtol={post.rank_rtol:g}: "
          f"fit {t_fit:.1f}s  median q {np.median(q):.4f}  "
          f"p90 {np.quantile(q, 0.90):.2f}  p95 {np.quantile(q, 0.95):.2f}  "
          f"p99 {np.quantile(q, 0.99):.2f}  max {q.max():.1f}", flush=True)


if X64:
    run_arm("fp64 oracle", "fp32", 1e-14)
else:
    for moments, rtol in [("fp32", 1e-8), ("df64", 1e-12), ("df64", 1e-14)]:
        run_arm(f"fp32 moments={moments}", moments, rtol)
print("done", flush=True)
