"""TPU experiment 6: block-factor fit ceiling probe — n=54k (+ HBM stats),
then 64.8k with a wider panel.

    nohup python experiments/fit_tpu6.py > experiments/fit_tpu6.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nngp_tpu.utils.timing import sync, timed


def hbm():
    try:
        s = jax.local_devices()[0].memory_stats()
        return {k: round(v / 2**30, 2) for k, v in s.items()
                if "bytes" in k and v}
    except Exception as e:
        return str(e)[:80]


def main():
    from nngp_tpu.gp import fit_gp
    from nngp_tpu.models.kernel_spec import reference_kernel
    spec = reference_kernel()
    rng = np.random.default_rng(0)
    print("hbm at start:", hbm(), flush=True)
    for n in (54000, 64800):
        try:
            x = jax.device_put(jnp.asarray(
                rng.uniform(0, 1000, (n, 20)), jnp.float32))
            y = jax.device_put(jnp.asarray(
                rng.standard_normal((n, 1)), jnp.float32))
            t0 = time.time()
            post = fit_gp(spec, x, y, diag_reg=1e-3)
            sync((post.l, post.alpha))
            print(f"fit n={n} compile+run {time.time()-t0:.0f}s  hbm={hbm()}",
                  flush=True)
            _, s = timed(lambda: (lambda p: (p.l, p.alpha))(
                fit_gp(spec, x, y, diag_reg=1e-3)), repeats=2)
            print(f"fit n={n}: {s:.3f} s warm", flush=True)
            del x, y, post
        except Exception as e:
            print(f"n={n}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    main()
