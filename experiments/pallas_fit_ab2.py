"""Interleaved A/B: Pallas lower-Gram + blocked Cholesky vs the default
fused panel fit, at 10.8k and 21.6k.

pallas_fit.py (one-block-per-arm) measured pallas WINNING at 10.8k
(0.0622 vs 0.0868 s) — but CLAUDE.md's hard rule is that single-session,
non-interleaved A/Bs on this tunnel are untrustworthy below ~25%.
This script alternates the two arms trial by trial (10 pairs) so tunnel
drift hits both equally, and prints per-trial pairs + medians.

    nohup python experiments/pallas_fit_ab2.py > experiments/pallas_fit_ab2.log 2>&1 &
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
    from nngp_tpu.ops.gram_pallas import gram_pallas
    from nngp_tpu.ops.linalg import (blocked_cholesky,
                                     blocked_tri_solve_lower,
                                     blocked_tri_solve_lower_t)
    from nngp_tpu.ops.gram import input_diag
    from nngp_tpu.models.kernel_spec import apply_diag_recursion

    spec = reference_kernel()
    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)
    for n in (10800, 21600):
        x = jax.device_put(jnp.asarray(
            rng.uniform(0, 1000, (n, 20)), jnp.float32))
        y = jax.device_put(jnp.asarray(
            rng.standard_normal((n, 1)), jnp.float32))

        @jax.jit
        def pallas_fit(x, y):
            diag_nngp, _ = apply_diag_recursion(input_diag(x), spec.layers)
            reg = (1e-3 * jnp.mean(diag_nngp)).astype(x.dtype)
            k = gram_pallas(spec, x, get="nngp", mirror="lower",
                            diag_add=reg)
            l = blocked_cholesky(k)
            alpha = blocked_tri_solve_lower_t(
                l, blocked_tri_solve_lower(l, y, block_size=1024),
                block_size=1024)
            return l, alpha

        # warm both programs
        sync(pallas_fit(x, y))
        p0 = fit_gp(spec, x, y, diag_reg=1e-3)
        sync((p0.l, p0.alpha))
        del p0

        pal, fus = [], []
        for t in range(10):
            t0 = time.perf_counter()
            sync(pallas_fit(x, y))
            pal.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            p = fit_gp(spec, x, y, diag_reg=1e-3)
            sync((p.l, p.alpha))
            fus.append(time.perf_counter() - t0)
            del p
            print(f"n={n} trial {t}: pallas {pal[-1]*1e3:7.1f} ms   "
                  f"fused {fus[-1]*1e3:7.1f} ms", flush=True)
        print(f"n={n}: pallas median {np.median(pal)*1e3:.1f} ms  "
              f"fused median {np.median(fus)*1e3:.1f} ms  "
              f"(pallas/fused = {np.median(pal)/np.median(fus):.3f})",
              flush=True)
        del x, y


if __name__ == "__main__":
    main()
