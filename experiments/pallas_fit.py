"""Settle gram_pallas: can the Mosaic lower-triangle Gram power the fit?

One jitted program: gram_pallas(mirror='lower', diag_add=reg) feeding
ops.linalg.blocked_cholesky (which only reads the lower triangle), vs the
default fused panel fit (`gp.posterior._fused_fit_factor` via fit_gp).
mirror='lower' is where the kernel is closest to XLA (33.9 vs 35.6 ms
standalone at 10.8k, BASELINE.md) — this is its best case as a fit
front-end.

    nohup python experiments/pallas_fit.py > experiments/pallas_fit.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nngp_tpu.utils.timing import sync, timed


def main():
    from nngp_tpu.gp import fit_gp
    from nngp_tpu.models.kernel_spec import reference_kernel
    from nngp_tpu.ops.gram_pallas import gram_pallas
    from nngp_tpu.ops.linalg import blocked_cholesky
    from nngp_tpu.ops.gram import input_diag
    from nngp_tpu.models.kernel_spec import apply_diag_recursion

    spec = reference_kernel()
    rng = np.random.default_rng(0)
    for n in (10800, 21600):
        x = jax.device_put(jnp.asarray(
            rng.uniform(0, 1000, (n, 20)), jnp.float32))
        y = jax.device_put(jnp.asarray(
            rng.standard_normal((n, 1)), jnp.float32))

        from nngp_tpu.ops.linalg import (blocked_tri_solve_lower,
                                         blocked_tri_solve_lower_t)

        @jax.jit
        def pallas_fit(x, y):
            # full fit: factor + alpha (same outputs as fit_gp)
            diag_nngp, _ = apply_diag_recursion(input_diag(x), spec.layers)
            reg = (1e-3 * jnp.mean(diag_nngp)).astype(x.dtype)
            k = gram_pallas(spec, x, get="nngp", mirror="lower",
                            diag_add=reg)
            l = blocked_cholesky(k)
            alpha = blocked_tri_solve_lower_t(
                l, blocked_tri_solve_lower(l, y, block_size=1024),
                block_size=1024)
            return l, alpha

        out = pallas_fit(x, y)
        sync(out)
        _, pallas_s = timed(lambda: pallas_fit(x, y), repeats=3)

        post = fit_gp(spec, x, y, diag_reg=1e-3)
        sync((post.l, post.alpha))
        _, fused_s = timed(
            lambda: (lambda p: p.l)(fit_gp(spec, x, y, diag_reg=1e-3)),
            repeats=3)
        print(f"n={n}: pallas-gram+blocked-chol+alpha {pallas_s:.4f}s  "
              f"fused fit (default) {fused_s:.4f}s", flush=True)
        del out, post, x, y


if __name__ == "__main__":
    main()
