"""TPU experiment 3: column-block fused fit at scale (the 32.4k+ OOM gate),
blocked predict solves, headline re-measures.

    nohup python experiments/fit_tpu3.py > experiments/fit_tpu3.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nngp_tpu.utils.timing import sync, timed


def fit_scale():
    from nngp_tpu.gp import fit_gp
    from nngp_tpu.models.kernel_spec import reference_kernel
    spec = reference_kernel()
    rng = np.random.default_rng(0)
    for n in (10800, 21600, 32400, 43200):
        try:
            x = jax.device_put(jnp.asarray(
                rng.uniform(0, 1000, (n, 20)), jnp.float32))
            y = jax.device_put(jnp.asarray(
                rng.standard_normal((n, 1)), jnp.float32))
            t0 = time.time()
            post = fit_gp(spec, x, y, diag_reg=1e-3)
            sync((post.l, post.alpha))
            print(f"fit n={n} compile+run {time.time()-t0:.0f}s", flush=True)
            _, s = timed(lambda: (lambda p: (p.l, p.alpha))(
                fit_gp(spec, x, y, diag_reg=1e-3)), repeats=3)
            print(f"fit n={n}: {s:.3f} s warm", flush=True)
            # predict timing at the largest sizes too (3600-row batch)
            x_te = jax.device_put(jnp.asarray(
                rng.uniform(0, 1000, (3600, 20)), jnp.float32))
            sync(post.predict_mean_std(x_te))
            _, sp = timed(lambda: post.predict_mean_std(x_te), repeats=3)
            print(f"predict n={n} (3600): {sp*1e3:.1f} ms "
                  f"({3600/sp:.0f} q/s)", flush=True)
            del x, y, post, x_te
        except Exception as e:
            print(f"n={n}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    fit_scale()
