"""Golden-value generator for tests/test_parity_gate.py's small-n pins.

Run ONCE (fp64 CPU) and paste the printed dict into _FOREST_2048_PINS.
Regenerate ONLY alongside an understood, measured quality change — never
to silence a red gate.

    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tests/golden/parity_pins.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from nngp_tpu.data.workload import load_single_table_workload
from nngp_tpu.eval.qerror import symmetric_qerror
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.gp import fit_gp, fit_nystrom
from nngp_tpu.models.kernel_spec import reference_kernel


def q_stats(mean, y_te):
    q = symmetric_qerror(np.asarray(mean).ravel()
                         - np.asarray(y_te).ravel())
    return round(float(np.median(q)), 4), round(float(np.quantile(q, 0.95)), 4)


def main():
    x, y, infos, _enc = load_single_table_workload(
        "workloads/forest_data", dtype=np.float64)
    x_tr, y_tr, _, x_te, y_te, _, _, _, _ = train_test_val_split(
        x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos)
    x_tr, y_tr = x_tr[:2048], y_tr[:2048]
    spec = reference_kernel()
    pins = {}

    post = fit_gp(spec, jnp.asarray(x_tr), jnp.asarray(y_tr), diag_reg=1e-3)
    mean, _ = post.predict_mean_std(jnp.asarray(x_te))
    pins["exact_fp64"] = q_stats(mean, y_te)

    pny = fit_nystrom(spec, x_tr, y_tr, num_inducing=256, diag_reg=1e-3,
                      seed=0, moments="fp32")
    mean, _ = pny.predict_mean_std(jnp.asarray(x_te))
    pins["nystrom_m256_fp64"] = q_stats(mean, y_te)

    pny32 = fit_nystrom(spec, x_tr.astype(np.float32),
                        y_tr.astype(np.float32), num_inducing=256,
                        diag_reg=1e-3, seed=0, moments="df64")
    mean, _ = pny32.predict_mean_std(jnp.asarray(x_te.astype(np.float32)))
    pins["nystrom_m256_fp32_df64"] = q_stats(mean, y_te)

    print("_FOREST_2048_PINS = {")
    for k, v in pins.items():
        print(f'    "{k}": {v},')
    print("}")


if __name__ == "__main__":
    main()
