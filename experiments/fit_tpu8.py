"""TPU experiment 8: block-factor fit with merged (fat-contraction)
trailing updates + left-looking block solves, at 32.4k / 43.2k / 54k.

    nohup python experiments/fit_tpu8.py > experiments/fit_tpu8.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nngp_tpu.utils.timing import sync


def main():
    from nngp_tpu.gp import fit_gp
    from nngp_tpu.models.kernel_spec import reference_kernel
    spec = reference_kernel()
    rng = np.random.default_rng(0)
    x_te = jax.device_put(jnp.asarray(
        rng.uniform(0, 1000, (3600, 20)), jnp.float32))
    for n in (32400, 43200, 54000):
        try:
            x = jax.device_put(jnp.asarray(
                rng.uniform(0, 1000, (n, 20)), jnp.float32))
            y = jax.device_put(jnp.asarray(
                rng.standard_normal((n, 1)), jnp.float32))
            t0 = time.time()
            post = fit_gp(spec, x, y, diag_reg=1e-3)
            sync((post.l, post.alpha))
            print(f"fit n={n} cold {time.time()-t0:.0f}s "
                  f"(b={post.l.starts[1]})", flush=True)
            for _ in range(2):
                del post
                t0 = time.time()
                post = fit_gp(spec, x, y, diag_reg=1e-3)
                sync((post.l, post.alpha))
                print(f"fit n={n} warm {time.time()-t0:.3f}s", flush=True)
            t0 = time.time()
            sync(post.predict_mean_std(x_te))
            print(f"predict 3600 n={n} compile+run {time.time()-t0:.0f}s",
                  flush=True)
            t0 = time.time()
            sync(post.predict_mean_std(x_te))
            print(f"predict 3600 n={n} warm {time.time()-t0:.3f}s",
                  flush=True)
            del x, y, post
        except Exception as e:
            print(f"n={n}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    main()
