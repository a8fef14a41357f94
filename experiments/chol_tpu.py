"""TPU timing: XLA expander Cholesky vs blocked_cholesky, plus fit scale
sweep. Run with nohup (compiles are minutes via the tunnel):

    nohup python experiments/chol_tpu.py > experiments/chol_tpu.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nngp_tpu.ops.linalg import blocked_cholesky
from nngp_tpu.utils.timing import sync, timed


def spd(n, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, 64)).astype(np.float32)
    k = x @ x.T / 64 + np.eye(n, dtype=np.float32)
    return jnp.asarray(k)


def bench_chol(n):
    k = jax.device_put(spd(n))
    out = {}

    xla = jax.jit(lambda a: jax.lax.linalg.cholesky(a))
    t0 = time.time(); l0 = xla(k); sync(l0)
    print(f"n={n} xla compile+run {time.time()-t0:.1f}s", flush=True)
    _, s = timed(lambda: xla(k), repeats=5)
    out["xla"] = s

    for b in (512, 1024):
        blk = jax.jit(lambda a, b=b: blocked_cholesky(a, block_size=b,
                                                      zero_upper=False))
        t0 = time.time(); l1 = blk(k); sync(l1)
        print(f"n={n} blocked(b={b}) compile+run {time.time()-t0:.1f}s",
              flush=True)
        err = float(jnp.max(jnp.abs(jnp.tril(l1) - l0))
                    / jnp.max(jnp.abs(l0)))
        _, s = timed(lambda: blk(k), repeats=5)
        out[f"blk{b}"] = s
        print(f"n={n} blocked(b={b}): {s*1e3:.1f} ms rel_err {err:.2e}",
              flush=True)

    flops = n ** 3 / 3
    for name, s in out.items():
        print(f"n={n} {name}: {s*1e3:.1f} ms = {flops/s/1e12:.1f} TF/s",
              flush=True)
    return out


def bench_fit_scale():
    from nngp_tpu.gp import fit_gp
    from nngp_tpu.models.kernel_spec import reference_kernel
    spec = reference_kernel()
    rng = np.random.default_rng(0)
    for n in (10800, 21600, 32400, 43200):
        try:
            x = jax.device_put(jnp.asarray(
                rng.uniform(0, 1000, (n, 20)), dtype=jnp.float32))
            y = jax.device_put(jnp.asarray(
                rng.standard_normal((n, 1)), dtype=jnp.float32))
            t0 = time.time()
            post = fit_gp(spec, x, y, diag_reg=1e-3)
            sync((post.l, post.alpha))
            print(f"fit n={n} compile+run {time.time()-t0:.1f}s", flush=True)
            _, s = timed(lambda: (lambda p: (p.l, p.alpha))(
                fit_gp(spec, x, y, diag_reg=1e-3)), repeats=3)
            print(f"fit n={n}: {s:.3f} s warm", flush=True)
        except Exception as e:  # OOM etc.
            print(f"fit n={n}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    bench_chol(10800)
    bench_fit_scale()
