"""Confirmation A/B at 10.8k without the Pallas kernel in-process, plus a
blocked_cholesky block-size sweep for the monolithic-Gram fit variant.

    nohup python experiments/fit_ab2.py > experiments/fit_ab2.log 2>&1 &
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
    from nngp_tpu.models.kernel_spec import (apply_diag_recursion,
                                             reference_kernel)
    from nngp_tpu.ops.gram import input_diag
    from nngp_tpu.ops.linalg import (blocked_cholesky,
                                     blocked_tri_solve_lower,
                                     blocked_tri_solve_lower_t)

    spec = reference_kernel()
    rng = np.random.default_rng(0)
    n = 10800
    x = jax.device_put(jnp.asarray(rng.uniform(0, 1000, (n, 20)),
                                   jnp.float32))
    y = jax.device_put(jnp.asarray(rng.standard_normal((n, 1)), jnp.float32))

    def alpha_solves(l, y):
        return blocked_tri_solve_lower_t(
            l, blocked_tri_solve_lower(l, y, block_size=1024),
            block_size=1024)

    def fit_a():
        p = fit_gp(spec, x, y, diag_reg=1e-3)
        return p.l, p.alpha

    def make_b(bs):
        @jax.jit
        def fit_b(x, y):
            diag_nngp, _ = apply_diag_recursion(input_diag(x), spec.layers)
            reg = (1e-3 * jnp.mean(diag_nngp)).astype(x.dtype)
            k = spec.kernel_fn(x, x, "nngp")
            idx = jnp.arange(x.shape[0])
            k = k.at[idx, idx].set(diag_nngp + reg)
            l = blocked_cholesky(k, block_size=bs)
            return l, alpha_solves(l, y)
        return lambda: fit_b(x, y)

    fits = {"A:fused": fit_a, "B:blk512": make_b(512),
            "B:blk1024": make_b(1024), "B:blk2048": make_b(2048)}
    outs = {}
    for name, f in fits.items():
        outs[name] = f()
        sync(outs[name])
    # parity: all variants produce the same alpha
    a0 = np.asarray(outs["A:fused"][1]).ravel()
    for name in fits:
        ai = np.asarray(outs[name][1]).ravel()
        print(f"{name}: max|alpha-alphaA| = {np.max(np.abs(ai - a0)):.3e}",
              flush=True)
    outs = None
    times = {k: [] for k in fits}
    for rep in range(6):
        for name, f in fits.items():
            t0 = time.perf_counter()
            sync(f())
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        ts = sorted(ts)
        print(f"{name}: min {ts[0]*1e3:.1f}ms  median {ts[3]*1e3:.1f}ms",
              flush=True)


if __name__ == "__main__":
    main()
