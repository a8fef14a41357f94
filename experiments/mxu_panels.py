"""MXU roofline for the fit's trailing-update shapes: (M, K) x (K, K)
fp32 HIGHEST matmuls as a function of panel width K. The fused factor's
flops are ~all in these dots, so the attainable fit time is
n^3/3 / TFs(K) — this calibrates the %-of-roofline claims in BASELINE.md
and picks the panel width.

    nohup python experiments/mxu_panels.py > experiments/mxu_panels.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nngp_tpu.utils.timing import sync


def bench_dot(m, k, precision, repeats=8):
    a = jnp.asarray(np.random.default_rng(0).standard_normal((m, k)),
                    jnp.float32)
    b = jnp.asarray(np.random.default_rng(1).standard_normal((k, k)),
                    jnp.float32)
    f = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=precision))
    sync(f(a, b))
    t0 = time.perf_counter()
    outs = [f(a, b) for _ in range(repeats)]
    sync(outs[-1])
    dt = (time.perf_counter() - t0) / repeats
    return 2 * m * k * k / dt / 1e12, dt


def main():
    m = 32768
    for k in (512, 1024, 2048, 3072, 4096, 8192):
        tf, dt = bench_dot(m, k, jax.lax.Precision.HIGHEST)
        print(f"K={k:5d}: {tf:6.1f} TF/s HIGHEST   ({dt*1e3:.2f} ms)",
              flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    main()
