"""Where does the Nystrom host solve stage's time go at m=2048?

Splits `_finalize_host` into: device->host fetch of the (k,k) moments,
fp64 symmetrize, LAPACK dpotrf, dtrtri, beta matvecs, and the host->device
ship of (ic, beta). Decides whether an on-device finalize (emulated-fp64)
is worth building or the tunnel fetch dominates.
"""
import time

import numpy as np
import jax.numpy as jnp
from scipy.linalg import lapack

from nngp_tpu.gp.nystrom import (_inducing_bases, _stream_moments,
                                 select_inducing)
from nngp_tpu.models.kernel_spec import reference_kernel
from nngp_tpu.utils.timing import sync

m, n = 2048, 131072
spec = reference_kernel()
rng = np.random.default_rng(0)
x = rng.uniform(0, 1000, (n, 20)).astype(np.float32) / 1024.0
y = rng.standard_normal((n, 1)).astype(np.float32)

x_m = jnp.asarray(x[select_inducing(n, m)])
w_solve, w_kmm = _inducing_bases(spec, "nngp", 1e-8, x_m)
c_raw, b_w, _, dsum, _ = _stream_moments(
    spec, "nngp", "highest", x_m, w_solve, w_kmm, x, y, 16384)
sync(c_raw)
reg = 1e-3 * float(dsum) / n

for trial in range(3):
    t0 = time.time()
    c_host = np.asarray(c_raw)
    b_host = np.asarray(b_w)
    t_fetch = time.time() - t0

    t0 = time.time()
    c64 = 0.5 * (np.asarray(c_host, np.float64)
                 + np.asarray(c_host, np.float64).T)
    t_sym = time.time() - t0

    t0 = time.time()
    ell = np.linalg.cholesky(c64 + reg * np.eye(m))
    t_chol = time.time() - t0

    t0 = time.time()
    li, info = lapack.dtrtri(ell, lower=1)
    ic64 = np.ascontiguousarray(li.T)
    t_trtri = time.time() - t0

    t0 = time.time()
    beta64 = ic64 @ (ic64.T @ np.asarray(b_host, np.float64))
    t_beta = time.time() - t0

    t0 = time.time()
    ic = jnp.asarray(ic64, jnp.float32)
    beta = jnp.asarray(beta64, jnp.float32)
    sync(ic)
    t_ship = time.time() - t0

    tot = t_fetch + t_sym + t_chol + t_trtri + t_beta + t_ship
    print(f"trial {trial}: fetch {t_fetch:.3f} sym {t_sym:.3f} "
          f"chol {t_chol:.3f} trtri {t_trtri:.3f} beta {t_beta:.3f} "
          f"ship {t_ship:.3f}  total {tot:.3f}", flush=True)
