"""TPU experiment 2: matmul precision ceilings, fused left-looking fit at
scale, Pallas Gram v2, q-error parity per precision.

    nohup python experiments/fit_tpu2.py > experiments/fit_tpu2.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nngp_tpu.utils.timing import sync, timed

P = jax.lax.Precision


def matmul_ceiling():
    n = 8192
    rng = np.random.default_rng(0)
    a = jax.device_put(jnp.asarray(rng.standard_normal((n, n)), jnp.float32))
    flops = 2 * n ** 3
    for prec in (P.DEFAULT, P.HIGH, P.HIGHEST):
        f = jax.jit(lambda x: jax.lax.dot_general(
            x, x, (((1,), (1,)), ((), ())), precision=prec))
        sync(f(a))
        _, s = timed(lambda: f(a), repeats=5)
        print(f"matmul {n} {prec}: {s*1e3:.1f} ms = {flops/s/1e12:.0f} TF/s",
              flush=True)


def fused_fit_bench():
    from nngp_tpu.gp.posterior import _fused_fit_factor
    from nngp_tpu.models.kernel_spec import (
        apply_diag_recursion, reference_kernel)
    from nngp_tpu.ops.gram import input_diag

    spec = reference_kernel()
    rng = np.random.default_rng(0)
    for n in (10800, 21600, 32400, 43200):
        x = jax.device_put(jnp.asarray(
            rng.uniform(0, 1000, (n, 20)), jnp.float32))
        dn, _ = apply_diag_recursion(input_diag(x), spec.layers)
        reg = 1e-3 * jnp.mean(dn)
        for prec in (P.HIGHEST, P.HIGH):
            try:
                f = jax.jit(lambda x, r, prec=prec: _fused_fit_factor(
                    spec, x, r, "nngp", precision=prec))
                t0 = time.time()
                l = f(x, reg)
                sync(l)
                print(f"fused n={n} {prec} compile+run {time.time()-t0:.0f}s",
                      flush=True)
                _, s = timed(lambda: f(x, reg), repeats=3)
                tfs = (n ** 3 / 3) / s / 1e12
                print(f"fused n={n} {prec}: {s*1e3:.1f} ms ({tfs:.1f} TF/s "
                      "incl gram+floor)", flush=True)
            except Exception as e:
                print(f"fused n={n} {prec}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)
        del x


def qerror_check():
    """Full bench-equivalent fit at each precision: q-error parity gate."""
    from nngp_tpu.data.workload import load_single_table_workload
    from nngp_tpu.eval.splits import train_test_val_split
    from nngp_tpu.eval.qerror import symmetric_qerror
    from nngp_tpu.gp.posterior import _fused_fit_factor
    from nngp_tpu.models.kernel_spec import (
        apply_diag_recursion, reference_kernel)
    from nngp_tpu.ops.gram import input_diag
    from nngp_tpu.gp import fit_gp

    x, y, infos, _ = load_single_table_workload(
        "workloads/forest_data", dtype=np.float32)
    x_tr, y_tr, _, x_te, y_te, _, _, _, _ = train_test_val_split(
        x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos)
    spec = reference_kernel()
    x_tr = jax.device_put(jnp.asarray(x_tr))
    y_tr = jax.device_put(jnp.asarray(y_tr))
    x_te = jax.device_put(jnp.asarray(x_te))

    # default path (through fit_gp, which now uses the fused factor)
    post = fit_gp(spec, x_tr, y_tr, diag_reg=1e-3)
    mean, _ = post.predict_mean_std(x_te)
    q = symmetric_qerror(np.asarray(mean).ravel() - np.asarray(y_te).ravel())
    print(f"fit_gp default: median q {np.median(q):.4f} "
          f"p95 {np.quantile(q, 0.95):.4f}", flush=True)

    dn, _ = apply_diag_recursion(input_diag(x_tr), spec.layers)
    reg = 1e-3 * jnp.mean(dn)
    import dataclasses
    for prec in (P.HIGH,):
        l = jax.jit(lambda x, r: _fused_fit_factor(
            spec, x, r, "nngp", precision=prec))(x_tr, reg)
        alpha = jax.scipy.linalg.cho_solve((l, True), y_tr)
        p2 = dataclasses.replace(post, l=l, alpha=alpha)
        mean2, std2 = p2.predict_mean_std(x_te)
        q2 = symmetric_qerror(
            np.asarray(mean2).ravel() - np.asarray(y_te).ravel())
        print(f"fused {prec}: median q {np.median(q2):.4f} "
              f"p95 {np.quantile(q2, 0.95):.4f} "
              f"std finite {bool(np.all(np.isfinite(np.asarray(std2))))}",
              flush=True)


def pallas_gram_bench():
    from nngp_tpu.models.kernel_spec import reference_kernel
    from nngp_tpu.ops.gram_pallas import gram_pallas

    spec = reference_kernel()
    rng = np.random.default_rng(0)
    for n in (10800, 21600):
        x = jax.device_put(jnp.asarray(
            rng.uniform(0, 1000, (n, 20)), jnp.float32))
        fx = jax.jit(lambda x: spec.kernel_fn(x, x, "nngp"))
        sync(fx(x))
        _, s = timed(lambda: fx(x), repeats=5)
        print(f"gram n={n} xla-full: {s*1e3:.1f} ms", flush=True)
        for mirror in ("lower", "full"):
            try:
                t0 = time.time()
                fp = jax.jit(lambda x, m=mirror: gram_pallas(
                    spec, x, mirror=m, tile_m=512, tile_n=512, diag_add=0.1))
                sync(fp(x))
                print(f"gram n={n} pallas-{mirror} compile+run "
                      f"{time.time()-t0:.0f}s", flush=True)
                _, s = timed(lambda: fp(x), repeats=5)
                print(f"gram n={n} pallas-{mirror}: {s*1e3:.1f} ms", flush=True)
            except Exception as e:
                print(f"gram n={n} pallas-{mirror}: FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)
        del x


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    matmul_ceiling()
    qerror_check()
    pallas_gram_bench()
    fused_fit_bench()
