"""NTK single-chip ceiling after the lazy-k_tt change: the large-n NTK fit
now holds exactly ONE live n^2 object (the Theta column-block factor) —
the NNGP train Gram needed by the posterior covariance is recomputed
panel-wise per predict batch (ops.gram.panel_symm_matmul) instead of being
kept resident. Target: 54k (round-2 NTK OOMed past 43.2k with resident
k_tt = 1.5 n^2 live), then probe 64.8k.

    nohup python experiments/ntk_scale54.py > experiments/ntk_scale54.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nngp_tpu.utils.timing import sync


def run(n):
    from nngp_tpu.gp import fit_gp
    from nngp_tpu.models.kernel_spec import reference_kernel
    spec = reference_kernel()
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.uniform(0, 1000, (n, 20)), jnp.float32))
    y = jax.device_put(jnp.asarray(
        rng.standard_normal((n, 1)), jnp.float32))
    x_te = jax.device_put(jnp.asarray(
        rng.uniform(0, 1000, (3600, 20)), jnp.float32))
    t0 = time.time()
    post = fit_gp(spec, x, y, diag_reg=1e-3, get="ntk")
    sync((post.l, post.alpha))
    print(f"ntk fit n={n} cold {time.time()-t0:.0f}s  "
          f"k_tt resident={post.k_tt_nngp is not None}", flush=True)
    t0 = time.time()
    sync(post.predict_mean_std(x_te))
    print(f"ntk predict 3600 compile+run {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    m, s = post.predict_mean_std(x_te)
    sync((m, s))
    ok = bool(np.isfinite(np.asarray(m)).all() and
              np.isfinite(np.asarray(s)).all())
    print(f"ntk predict 3600 warm {time.time()-t0:.3f}s finite={ok}",
          flush=True)
    best = float("inf")
    for rep in range(2):
        del post
        t0 = time.time()
        post = fit_gp(spec, x, y, diag_reg=1e-3, get="ntk")
        sync((post.l, post.alpha))
        best = min(best, time.time() - t0)
    print(f"ntk fit n={n} warm best {best:.3f}s", flush=True)
    del post


if __name__ == "__main__":
    for n in (54000, 64800):
        try:
            run(n)
        except Exception as e:
            print(f"n={n} FAILED: {type(e).__name__}: {e}", flush=True)
