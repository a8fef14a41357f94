"""Distributed-fit sanity wall-clock on the REAL chip via a 1-device mesh.

Real multi-chip hardware is not reachable from this image, but the block-
cyclic factorization (parallel/cholesky.py) runs unchanged over a mesh of
one TPU device — this measures its schedule overhead against the fused
single-chip fit on the same problem, so the distributed path has a
hardware-measured number (not just virtual-mesh correctness).

Usage: python experiments/dist_sanity.py [n] [block_size]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from nngp_tpu.gp import fit_gp
from nngp_tpu.models.kernel_spec import reference_kernel
from nngp_tpu.parallel import distributed_fit, make_mesh
from nngp_tpu.utils.timing import sync

n = int(sys.argv[1]) if len(sys.argv) > 1 else 21600
b = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

spec = reference_kernel()
rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(0, 1000, (n, 20)), jnp.float32)
y = jnp.asarray(rng.standard_normal((n, 1)), jnp.float32)
xt = jnp.asarray(rng.uniform(0, 1000, (3600, 20)), jnp.float32)
mesh = make_mesh(1)

for tag, fit in [
    ("fused single-chip", lambda: fit_gp(spec, x, y, input_scale=1.0)),
    ("distributed mesh(1)", lambda: distributed_fit(
        spec, x, y, mesh, 1e-3, "nngp", block_size=b, input_scale=1.0)),
]:
    post = fit()
    sync(post.alpha)
    best = float("inf")
    for _ in range(3):
        del post
        t0 = time.time()
        post = fit()
        sync(post.alpha)
        best = min(best, time.time() - t0)
    mean, std = post.predict_mean_std(xt)
    ok = bool(np.all(np.isfinite(np.asarray(mean)))
              and np.all(np.isfinite(np.asarray(std))))
    print(f"{tag}: n={n} b={b} warm fit {best:.3f}s finite={ok}", flush=True)
    del post
