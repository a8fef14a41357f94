"""Stage-by-stage precision attribution of the fp32 Nystrom serving gap.

BASELINE.md records default-kernel synth6_big 90k m=2048: fp64 CPU 2.399
median q vs fp32 TPU 2.521 (~5%). Before spending df64 flops, pin down
WHICH stage owns the gap. Stages (bases + finalize always host fp64):

  S1: panel kernel entries K_pm = kernel(x_p, x_m)
  S2: whitened projection + moment accumulation (psi = W^T K^T,
      C += psi psi^T, b += psi y) including the cross-panel accumulator
  S4: predict-time cross kernel + posterior algebra

Each arm runs the same manual DTC pipeline on CPU with each stage in
fp32 or fp64 (fp64 here stands in for the on-chip df64 path, whose
~1e-13 entries are fp64-grade for any fp32-floored consumer). The
whitening basis is SHARED across arms (fp64 kmm, chol jitter 1e-8 =
the fp32 default) so arms differ ONLY in stage precision.

Run (CPU, ~15 min):
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python \
    experiments/nystrom_prec_attrib.py > experiments/nystrom_prec_attrib.log 2>&1
"""
import time

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from nngp_tpu.data.workload import load_multi_join_workload  # noqa: E402
from nngp_tpu.eval.qerror import symmetric_qerror  # noqa: E402
from nngp_tpu.eval.splits import train_test_val_split  # noqa: E402
from nngp_tpu.gp.nystrom import (_whiten_basis_chol,  # noqa: E402
                                 select_inducing)
from nngp_tpu.gp.posterior import _auto_input_scale  # noqa: E402
from nngp_tpu.models.kernel_spec import reference_kernel  # noqa: E402

PANEL = 16384
M = 2048
RTOL = 1e-8          # fp32-default chol jitter, shared by every arm
DIAG_REG = 1e-3


def _kern(spec, xa, xb, p):
    """p = 64: fp64 inputs + fp64 arithmetic; 32: fp32 both;
    'cast64': fp32-CAST inputs, fp64 arithmetic — isolates INPUT
    quantization (the 2^64-packed chunk slots lose mantissa bits in
    fp32; ~97% of synth6 rows are lossy) from arithmetic rounding.
    The on-chip df64-moments A/B measured arithmetic-only ~0 gap
    (nystrom_df64_moments_ab.log), so this arm decides ownership."""
    if p == "cast64":
        xa = np.asarray(xa, np.float32).astype(np.float64)
        xb = np.asarray(xb, np.float32).astype(np.float64)
        p = 64
    dt = jnp.float64 if p == 64 else jnp.float32
    k = spec.kernel_fn(jnp.asarray(xa, dt), jnp.asarray(xb, dt), "nngp")
    return np.asarray(k, np.float64)


def run_arm(spec, x_tr, y_tr, x_te, x_m, w64, p1, p2, p4):
    n = x_tr.shape[0]
    # p2 = 64: projection + accumulation fp64; 32: all fp32;
    # "64s32": fp64 projection/products, per-panel deltas ROUNDED to fp32
    # before accumulation (isolates unamplified accumulator rounding)
    store32 = p2 == "64s32"
    acc_dt = np.float32 if p2 == 32 else np.float64
    w = w64.astype(acc_dt)
    k_dim = w.shape[1]
    c = np.zeros((k_dim, k_dim), acc_dt)
    b = np.zeros((k_dim, 1), acc_dt)
    diag_sum = 0.0
    for s in range(0, n, PANEL):
        e = min(s + PANEL, n)
        k_pm = _kern(spec, x_tr[s:e], x_m, p1)
        psi = (w.T @ k_pm.astype(acc_dt).T).astype(acc_dt)
        if store32:
            c += (psi @ psi.T).astype(np.float32).astype(np.float64)
            b += (psi @ y_tr[s:e].astype(acc_dt)
                  ).astype(np.float32).astype(np.float64)
        else:
            c += psi @ psi.T
            b += psi @ y_tr[s:e].astype(acc_dt)
        d64 = np.asarray(spec.diag_fn(jnp.asarray(x_tr[s:e], jnp.float64)),
                         np.float64)
        diag_sum += d64.sum()
    reg = DIAG_REG * diag_sum / n
    # host fp64 finalize (chol of C + rI, clamped-eig fallback)
    c64 = 0.5 * (c.astype(np.float64) + c.astype(np.float64).T)
    try:
        ell = np.linalg.cholesky(c64 + reg * np.eye(k_dim))
        ic = np.linalg.inv(ell).T
    except np.linalg.LinAlgError:
        lam, v = np.linalg.eigh(c64)
        ic = v / np.sqrt(np.maximum(lam, 0.0) + reg)[None, :]
    beta = ic @ (ic.T @ b.astype(np.float64))
    # predict (mean only — q-error is a mean metric)
    out_dt = np.float64 if p4 == 64 else np.float32
    wp = w64.astype(out_dt)
    bp = beta.astype(out_dt)
    means = []
    for s in range(0, x_te.shape[0], 8192):
        e = min(s + 8192, x_te.shape[0])
        cross = _kern(spec, x_te[s:e], x_m, p4).astype(out_dt)
        psi_t = wp.T @ cross.T
        means.append((psi_t.T @ bp).ravel())
    return np.concatenate(means).astype(np.float64)


def main():
    x, y, infos, _e = load_multi_join_workload(
        "workloads/synth6_big_data", schema_name="synth6",
        dtype=np.float64, chunk_norm=True)
    x_tr, y_tr, _, x_te, y_te, _, *_ = train_test_val_split(
        x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos)
    y_tr = np.asarray(y_tr, np.float64).reshape(-1, 1)
    yv = np.asarray(y_te, np.float64).ravel()
    spec = reference_kernel()
    scale = _auto_input_scale(x_tr, spec.layers)
    print(f"n_train {x_tr.shape[0]} n_test {x_te.shape[0]} "
          f"input_scale {scale}", flush=True)
    x_tr = np.asarray(x_tr, np.float64) / scale
    x_te = np.asarray(x_te, np.float64) / scale
    x_m = x_tr[select_inducing(x_tr.shape[0], M, seed=0)]

    kmm64 = _kern(spec, x_m, x_m, 64)
    w64 = _whiten_basis_chol(kmm64, RTOL)
    print(f"basis rank {w64.shape[1]}", flush=True)

    arms = [
        (64, 64, 64), ("cast64", 64, 64), (32, 64, 64), (64, 32, 64),
        (64, "64s32", 64), (64, 64, 32), ("cast64", 64, "cast64"),
        (32, 32, 64), (32, 32, 32),
    ]
    for p1, p2, p4 in arms:
        t0 = time.perf_counter()
        mean = run_arm(spec, x_tr, y_tr, x_te, x_m, w64, p1, p2, p4)
        q = symmetric_qerror(mean - yv)
        print(f"S1={p1} S2={p2} S4={p4}: median "
              f"{np.median(q):.4f} p90 {np.quantile(q, 0.90):.3f} "
              f"p95 {np.quantile(q, 0.95):.3f} p99 "
              f"{np.quantile(q, 0.99):.3f} ({time.perf_counter()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
