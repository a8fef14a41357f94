"""Pallas Gram tile sweep: the v2 kernel ran 256x256 tiles (3,655 grid
steps at 21.6k — per-step overhead rivals the per-tile compute). Measure
256/512/1024 tiles, mirror full/lower, vs the XLA fused Gram.

    nohup python experiments/gram_tiles.py > experiments/gram_tiles.log 2>&1 &
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
    from nngp_tpu.models.kernel_spec import reference_kernel
    from nngp_tpu.ops.gram_pallas import gram_pallas
    spec = reference_kernel()
    rng = np.random.default_rng(0)
    for n in (10800, 21600):
        x = jax.device_put(jnp.asarray(
            rng.uniform(0, 1000, (n, 20)), jnp.float32))
        fx = jax.jit(lambda x: spec.kernel_fn(x, x, "nngp"))
        sync(fx(x))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter(); sync(fx(x))
            ts.append(time.perf_counter() - t0)
        print(f"n={n} XLA fused: {min(ts)*1e3:7.1f} ms", flush=True)
        for tile in (256, 512, 1024):
            for mirror in ("full", "lower"):
                try:
                    fp = jax.jit(lambda x, t=tile, m=mirror: gram_pallas(
                        spec, x, get="nngp", tile_m=t, tile_n=t, mirror=m))
                    sync(fp(x))
                    ts = []
                    for _ in range(4):
                        t0 = time.perf_counter(); sync(fp(x))
                        ts.append(time.perf_counter() - t0)
                    print(f"n={n} pallas tile={tile} mirror={mirror}: "
                          f"{min(ts)*1e3:7.1f} ms", flush=True)
                except Exception as e:
                    print(f"n={n} pallas tile={tile} mirror={mirror}: FAILED "
                          f"{type(e).__name__}: {str(e)[:100]}", flush=True)
        del x


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    main()
