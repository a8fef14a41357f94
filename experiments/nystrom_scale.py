"""Nystrom streaming-fit scale ladder on the real TPU: n far beyond the
~70k exact-fit single-chip edge. Random features (d=20, [0,1000] scale like
the forest workload); reports cold fit, warm fit, and the warm breakdown
(inducing bases / moment streaming / host solve stage).

Usage: python experiments/nystrom_scale.py [m] [n1,n2,...]
"""
import sys
import time

import numpy as np
import jax.numpy as jnp

from nngp_tpu.gp.nystrom import (fit_nystrom, _inducing_bases,
                                 _stream_moments, _finalize_host,
                                 select_inducing)
from nngp_tpu.models.kernel_spec import reference_kernel
from nngp_tpu.utils.timing import sync

m = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
ns = ([int(v) for v in sys.argv[2].split(",")] if len(sys.argv) > 2
      else [131072, 524288, 1048576])

spec = reference_kernel()
rng = np.random.default_rng(0)
xt = rng.uniform(0, 1000, (3600, 20)).astype(np.float32)

for n in ns:
    x = rng.uniform(0, 1000, (n, 20)).astype(np.float32)
    y = rng.standard_normal((n, 1)).astype(np.float32)

    t0 = time.time()
    post = fit_nystrom(spec, x, y, num_inducing=m)
    sync(post.beta_w)
    t_cold = time.time() - t0

    t0 = time.time()
    post = fit_nystrom(spec, x, y, num_inducing=m)
    sync(post.beta_w)
    t_warm = time.time() - t0

    # warm breakdown with the same inducing set / scale the fit used
    scale = post.input_scale
    xs = x * (1.0 / scale) if scale != 1.0 else x
    x_m = jnp.asarray(xs[select_inducing(n, m)])
    t0 = time.time()
    w_solve, w_kmm = _inducing_bases(spec, "nngp", post.rank_rtol, x_m)
    sync(w_solve)
    t_bases = time.time() - t0
    t0 = time.time()
    c_raw, b_w, _, dsum, _yty = _stream_moments(
        spec, "nngp", "highest", x_m, w_solve, w_kmm, xs,
        np.asarray(y), post.panel_size)
    sync(c_raw)
    t_stream = time.time() - t0
    t0 = time.time()
    _finalize_host(c_raw, b_w, post.reg, x_m.dtype)
    t_solve = time.time() - t0

    mm, ss = post.predict_mean_std(jnp.asarray(xt))
    ok = bool(np.all(np.isfinite(np.asarray(mm)))
              and np.all(np.isfinite(np.asarray(ss))))
    print(f"n={n} m={m} rank={post.rank}: cold {t_cold:.2f}s warm "
          f"{t_warm:.2f}s (bases {t_bases:.2f} + stream {t_stream:.2f} "
          f"+ solve {t_solve:.2f}) finite={ok}", flush=True)
    del post, x, y
