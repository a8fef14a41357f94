"""TPU experiment 7: 54k warm fit, holding at most ONE posterior live
(fit_tpu6's timed() kept the previous result alive — two 5.8 GB factors).

    nohup python experiments/fit_tpu7.py > experiments/fit_tpu7.log 2>&1 &
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
    n = 54000
    x = jax.device_put(jnp.asarray(
        rng.uniform(0, 1000, (n, 20)), jnp.float32))
    y = jax.device_put(jnp.asarray(
        rng.standard_normal((n, 1)), jnp.float32))
    x_te = jax.device_put(jnp.asarray(
        rng.uniform(0, 1000, (3600, 20)), jnp.float32))
    t0 = time.time()
    post = fit_gp(spec, x, y, diag_reg=1e-3)
    sync((post.l, post.alpha))
    print(f"fit n={n} cold {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    sync(post.predict_mean_std(x_te))
    print(f"predict 3600 compile+run {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    m, s = post.predict_mean_std(x_te)
    sync((m, s))
    print(f"predict 3600 warm {time.time()-t0:.3f}s", flush=True)
    for rep in range(2):
        del post
        t0 = time.time()
        post = fit_gp(spec, x, y, diag_reg=1e-3)
        sync((post.l, post.alpha))
        print(f"fit n={n} warm {time.time()-t0:.3f}s", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    main()
