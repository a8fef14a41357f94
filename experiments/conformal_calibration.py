"""Does post-hoc recalibration + split-conformal intervals fix the NNGP
posterior's miscalibration? (fp64 CPU, reference numerics)

Protocol per workload: fit on the 60% train split, fit the std scale +
conformal scores on the 20% VAL split (held out), evaluate on the 20% test
split: calibration MAE (mean |expected - observed| over the 10-level table,
the reference's own diagnostic) before/after recalibration, and conformal
90%/80% interval coverage + median width in log2-card space.

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu nice -n 10 python \
  experiments/conformal_calibration.py > experiments/conformal_calibration.log 2>&1
"""
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from nngp_tpu.data.workload import (load_multi_join_workload,
                                    load_single_table_workload)
from nngp_tpu.eval.calibration import (calibration_mae, calibration_table,
                                       conformal_quantile, conformal_scores,
                                       fit_std_scale)
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.gp import fit_gp
from nngp_tpu.models.kernel_spec import reference_kernel


def study(tag, x, y):
    (x_tr, y_tr, _i1, x_te, y_te, _i2,
     x_val, y_val, _iv) = train_test_val_split(x, y, 0.6, 0.2)
    post = fit_gp(reference_kernel(), x_tr, y_tr, diag_reg=1e-3)
    mv, sv = (np.asarray(a).ravel() for a in post.predict_mean_std(x_val))
    mt, st = (np.asarray(a).ravel() for a in post.predict_mean_std(x_te))
    yv, yt = np.asarray(y_val).ravel(), np.asarray(y_te).ravel()

    scale = fit_std_scale(yv, mv, sv)
    mae0 = calibration_mae(calibration_table(yt, mt, st))
    mae1 = calibration_mae(calibration_table(yt, mt, scale * st))
    print(f"[{tag}] n_tr={len(y_tr)} std_scale={scale:.4f} "
          f"calibration MAE {mae0:.4f} -> {mae1:.4f}", flush=True)

    scores = conformal_scores(yv, mv, sv)
    for alpha in (0.1, 0.2):
        q = conformal_quantile(scores, alpha)
        cov = float(np.mean(np.abs(yt - mt) <= q * st))
        width = float(np.median(2.0 * q * st))
        # Gaussian baseline at the same nominal level, unscaled std
        from scipy import special
        z = np.sqrt(2.0) * special.erfinv(1 - alpha)
        cov_g = float(np.mean(np.abs(yt - mt) <= z * st))
        print(f"[{tag}] alpha={alpha}: conformal coverage {cov:.4f} "
              f"(target >= {1-alpha}), median width {width:.3f} log2; "
              f"Gaussian-z unscaled coverage {cov_g:.4f}", flush=True)


x, y, infos, _ = load_single_table_workload(
    "workloads/forest_data", relation="forest", name="forest",
    dtype=np.float64)
study("forest 10.8k fp64", x, y)

x, y, infos, _ = load_multi_join_workload(
    "workloads/synth6_join_data", schema_name="synth6", dtype=np.float64,
    chunk_norm=True)
study("synth6 chunk_norm fp64", x, y)
