"""Panel-width sweep for the fused fit factor at 10.8k / 21.6k — the MXU
HIGHEST rate rises steeply with contraction width (mxu_panels.log:
512 -> 3.8 TF/s, 2048 -> 21.9, 4096 -> 27.9), so the in-place layout's
block_size is a first-order fit-time knob.

    nohup python experiments/fit_bsweep.py > experiments/fit_bsweep.log 2>&1 &
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
    from nngp_tpu.gp.posterior import _fused_fit_factor
    from nngp_tpu.models.kernel_spec import (
        apply_diag_recursion, reference_kernel)
    from nngp_tpu.ops.gram import input_diag

    spec = reference_kernel()
    rng = np.random.default_rng(0)
    for n, bs_list in ((10800, (512, 1024, 2048)),
                       (21600, (512, 1024, 2048))):
        x = jax.device_put(jnp.asarray(
            rng.uniform(0, 1000, (n, 20)), jnp.float32))
        dn, _ = apply_diag_recursion(input_diag(x), spec.layers)
        reg = (1e-3 * jnp.mean(dn)).astype(jnp.float32)
        for bs in bs_list:
            try:
                fn = jax.jit(lambda x, reg, a=bs: _fused_fit_factor(
                    spec, x, reg, "nngp", block_size=a))
                sync(fn(x, reg))
                ts = []
                for _ in range(4):
                    t0 = time.perf_counter()
                    sync(fn(x, reg))
                    ts.append(time.perf_counter() - t0)
                flops = n ** 3 / 3
                best = min(ts)
                print(f"n={n} b={bs}: {best*1e3:7.1f} ms "
                      f"({flops/best/1e12:5.1f} TF/s eff)", flush=True)
            except Exception as e:
                print(f"n={n} b={bs}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
        del x


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    main()
