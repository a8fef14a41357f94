"""Cut-depth curves: serving q-error vs rank_rtol, fp64 pipeline vs the
fp32+df64-entries pipeline (18k synth6, m=2048, chunk_norm).

Motivated by nystrom_df64_cut_cpu.log: df64 entries @1e-12 scored 3.15
median q vs 2.75 for fp32@1e-8 and 2.71 for the fp64 oracle @1e-14 —
the deep cut HURTS the fp32 pipeline even with exact K_mm entries.
Hypothesis: the fp32 PREDICT-side projection k_tm @ W amplifies fp32
kernel-entry noise by lam^-1/2 (up to ~1e6 at a 1e-12 cut), a stage the
round-3k attribution never isolated (its arms pinned rtol=1e-8, where
amplification is ~1e4). These curves separate basis quality (fp64 arm)
from serving-side amplification (fp32 arm).

Run (two processes, round-3 x64 isolation pattern):
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python \
    experiments/nystrom_cut_depth.py [--x64] [data_dir]
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

print("x64:", X64, "data:", DATA, flush=True)
x, y, infos, _e = load_multi_join_workload(
    DATA, schema_name="synth6", dtype=DT, chunk_norm=True)
x_tr, y_tr, _, x_te, y_te, _, *_r = train_test_val_split(
    x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos)
yv = np.asarray(y_te).ravel()
spec = reference_kernel()
scale = _auto_input_scale(np.asarray(x_tr), spec.layers)
idx = select_inducing(x_tr.shape[0], M, seed=0)
moments = "fp32" if X64 else "df64"

for rtol in (1e-8, 1e-10, 1e-12, 1e-14):
    t0 = time.perf_counter()
    post = fit_nystrom(spec, x_tr, y_tr, num_inducing=M,
                       inducing_rows=x_tr[idx], input_scale=scale,
                       moments=moments, rank_rtol=rtol)
    sync(post.beta_w)
    t_fit = time.perf_counter() - t0
    mm, _ = post.predict_mean_std_chunked(np.asarray(x_te), chunk=8192)
    q = symmetric_qerror(np.asarray(mm).ravel() - yv)
    print(f"{'fp64' if X64 else 'fp32+df64ent'} rtol={rtol:g}: "
          f"fit {t_fit:.1f}s  median q {np.median(q):.4f}  "
          f"p90 {np.quantile(q, 0.90):.2f}  p95 {np.quantile(q, 0.95):.2f}  "
          f"p99 {np.quantile(q, 0.99):.2f}", flush=True)
print("done", flush=True)
