"""Beyond-one-chip accuracy on REAL multi-join data: 150k-query synth6.

The committed 18k synth6 workload extended to 25k queries/arity
(workloads/make_synth6_join.py --per_arity 25000 --out_name
synth6_big_data): 90k train / 30k test after the seed-10 60/20/20 split —
the exact tier's single-chip edge is ~70k rows, so this is the regime the
streaming Nystrom/DTC tier exists for. Compares the exact fit on a
truncated train prefix (what one chip can hold) against Nystrom on the
FULL train set: does unbounded n + approximation beat bounded n + exact?

Usage: python experiments/nystrom_join_big.py [exact_n] [m1,m2,...]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from nngp_tpu.data.workload import load_multi_join_workload
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.eval.qerror import symmetric_qerror
from nngp_tpu.gp import fit_gp
from nngp_tpu.gp.nystrom import fit_nystrom
from nngp_tpu.gp.posterior import input_scale_for_bound
from nngp_tpu.models.kernel_spec import reference_kernel
from nngp_tpu.utils.timing import sync

exact_n = int(sys.argv[1]) if len(sys.argv) > 1 else 64800
ms = ([int(v) for v in sys.argv[2].split(",")] if len(sys.argv) > 2
      else [2048, 4096])
chunk_norm = "--chunk_norm" in sys.argv
if "--x64" in sys.argv:                 # CPU fp64 (reference numerics)
    jax.config.update("jax_enable_x64", True)
dt = np.float64 if "--x64" in sys.argv else np.float32

x, y, infos, enc = load_multi_join_workload(
    "workloads/synth6_big_data", schema_name="synth6", dtype=dt,
    chunk_norm=chunk_norm)
x_tr, y_tr, _, x_te, y_te, _, *_r = train_test_val_split(
    x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos)
print(f"train {x_tr.shape} test {x_te.shape} chunk_norm={chunk_norm}",
      flush=True)
spec = reference_kernel()
scale = input_scale_for_bound(enc.max_abs_bound(), spec.layers)
yv = np.asarray(y_te).ravel()


def report(tag, post, t_fit):
    mm, ss = post.predict_mean_std_chunked(np.asarray(x_te), chunk=8192)
    mm = np.asarray(mm).ravel()
    q = symmetric_qerror(mm - yv)
    print(f"{tag}: median q {np.median(q):.4f} p95 "
          f"{np.quantile(q, 0.95):.4f} fit={t_fit:.2f}s "
          f"std_finite={bool(np.all(np.isfinite(np.asarray(ss))))}",
          flush=True)


# exact tier, truncated to what one chip holds
xe = jax.device_put(jnp.asarray(x_tr[:exact_n]))
ye = jax.device_put(jnp.asarray(y_tr[:exact_n]))
t0 = time.time()
post = fit_gp(spec, xe, ye, input_scale=scale)
sync(post.alpha)
report(f"exact n={exact_n}", post, time.time() - t0)
del post, xe, ye

# Nystrom on the FULL train set
for m in ms:
    t0 = time.time()
    post = fit_nystrom(spec, x_tr, y_tr, num_inducing=m, input_scale=scale)
    sync(post.beta_w)
    report(f"nystrom n={x_tr.shape[0]} m={m} rank={post.rank}",
           post, time.time() - t0)
    del post
