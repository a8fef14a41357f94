"""Interleaved A/B/C of the 10.8k fit paths, same process, alternating
order so drift can't masquerade as a win:

  A: fused panel Cholesky (default fit_gp path — Gram panels generated
     inside a left-looking factorization)
  B: XLA fused Gram (+ridge epilogue) -> blocked_cholesky -> alpha
  C: Pallas lower-triangle Gram -> blocked_cholesky -> alpha

    nohup python experiments/fit_ab.py > experiments/fit_ab.log 2>&1 &
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
    from nngp_tpu.ops.gram_pallas import gram_pallas
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

    @jax.jit
    def fit_b(x, y):
        diag_nngp, _ = apply_diag_recursion(input_diag(x), spec.layers)
        reg = (1e-3 * jnp.mean(diag_nngp)).astype(x.dtype)
        k = spec.kernel_fn(x, x, "nngp")
        idx = jnp.arange(x.shape[0])
        k = k.at[idx, idx].set(diag_nngp + reg)
        l = blocked_cholesky(k)
        return l, alpha_solves(l, y)

    @jax.jit
    def fit_c(x, y):
        diag_nngp, _ = apply_diag_recursion(input_diag(x), spec.layers)
        reg = (1e-3 * jnp.mean(diag_nngp)).astype(x.dtype)
        k = gram_pallas(spec, x, get="nngp", mirror="lower", diag_add=reg)
        l = blocked_cholesky(k)
        return l, alpha_solves(l, y)

    fits = {"A:fused": fit_a, "B:xla+blk": lambda: fit_b(x, y),
            "C:pallas+blk": lambda: fit_c(x, y)}
    for name, f in fits.items():
        sync(f())                      # compile
    times = {k: [] for k in fits}
    for rep in range(6):
        for name, f in fits.items():
            t0 = time.perf_counter()
            sync(f())
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        ts = sorted(ts)
        print(f"{name}: min {ts[0]*1e3:.1f}ms  median {ts[3]*1e3:.1f}ms  "
              f"all {[round(t*1e3,1) for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
