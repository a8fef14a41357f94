"""10M-row Nystrom fit on one chip: the streaming tier's O(n) wall-clock
scaling past the 1M ladder (BASELINE.md). Random features like the scale
ladder (d=20, [0,1000]); m=2048; device df64 stages (finalize='auto').

Host RAM: 10M x 20 fp32 = 800 MB features + 40 MB labels. Panels stream
from host, device state stays O(m^2).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  experiments/nystrom_10m.py > experiments/nystrom_10m.log 2>&1 &
"""
import time

import numpy as np
import jax

from nngp_tpu.gp import fit_nystrom
from nngp_tpu.models.kernel_spec import reference_kernel
from nngp_tpu.utils.timing import sync

print("devices:", jax.devices(), flush=True)
spec = reference_kernel()
m = 2048
rng = np.random.default_rng(0)
n = 10 * 1024 * 1024
t0 = time.perf_counter()
x = rng.uniform(0, 1000, (n, 20)).astype(np.float32)
y = rng.standard_normal((n, 1)).astype(np.float32)
print(f"generated {n} rows in {time.perf_counter() - t0:.1f}s", flush=True)

t0 = time.perf_counter()
post = fit_nystrom(spec, x, y, num_inducing=m)
sync(post.beta_w)
print(f"cold fit: {time.perf_counter() - t0:.2f}s "
      f"(finalize={post.finalize})", flush=True)

t0 = time.perf_counter()
post = fit_nystrom(spec, x, y, num_inducing=m)
sync(post.beta_w)
print(f"warm fit: {time.perf_counter() - t0:.2f}s", flush=True)

xt = rng.uniform(0, 1000, (3600, 20)).astype(np.float32)
mm, ss = post.predict_mean_std(jax.numpy.asarray(xt))
print("predict finite:", bool(np.isfinite(np.asarray(mm)).all()
                              and np.isfinite(np.asarray(ss)).all()),
      flush=True)
