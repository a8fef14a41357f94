"""Second interleaved confirmation of the Pallas fit tier default
(pallas_fit_ab2.log was the first). Runs HOURS apart from ab2 in the same
image, per the CLAUDE.md rule that sub-25% deltas must be re-measured
before a default stays flipped. Arms forced explicitly through _fit_impl
(fit_gp itself now routes 10.8k through the pallas tier on TPU).

    nohup python experiments/pallas_fit_ab3.py > experiments/pallas_fit_ab3.log 2>&1 &
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
    import nngp_tpu.gp.posterior as P
    from nngp_tpu.models.kernel_spec import reference_kernel

    spec = reference_kernel()
    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)
    for n in (10800, 16384, 21600):
        x = jax.device_put(jnp.asarray(
            rng.uniform(0, 1000, (n, 20)), jnp.float32))
        y = jax.device_put(jnp.asarray(
            rng.standard_normal((n, 1)), jnp.float32))

        def pallas_arm():
            return P._fit_impl(x, y, spec, "nngp", 1e-3, False,
                               pallas_max_n=1 << 30)

        def fused_arm():
            return P._fit_impl(x, y, spec, "nngp", 1e-3, False,
                               pallas_max_n=0)

        sync(pallas_arm())
        sync(fused_arm())
        pal, fus = [], []
        for t in range(10):
            t0 = time.perf_counter()
            sync(pallas_arm())
            pal.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            sync(fused_arm())
            fus.append(time.perf_counter() - t0)
            print(f"n={n} trial {t}: pallas {pal[-1]*1e3:7.1f} ms   "
                  f"fused {fus[-1]*1e3:7.1f} ms", flush=True)
        print(f"n={n}: pallas median {np.median(pal)*1e3:.1f} ms  "
              f"fused median {np.median(fus)*1e3:.1f} ms  "
              f"(pallas/fused = {np.median(pal)/np.median(fus):.3f})",
              flush=True)
        del x, y


if __name__ == "__main__":
    main()
