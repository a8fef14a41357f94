"""Headline benchmark: end-to-end NNGP fit on the forest workload.

Measures the warm wall-clock of the full fit — train-Gram assembly
(dual-activation recursion on the MXU) + Cholesky of K + rI + alpha solve —
on 10,800 forest training queries (60% of the committed 18,000-query
workload, seed-10 split identical to `/root/reference/util.py:271-293`),
plus the warm batched posterior (mean + std) throughput on the 3,600-query
test split.

North star (BASELINE.json): fit < 1 s on a v5e-8. The reference publishes no
numbers (`BASELINE.md`), so vs_baseline is north_star_seconds / measured —
values > 1 beat the target.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N, ...extras}
"""

import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from nngp_tpu.data.workload import load_single_table_workload
    from nngp_tpu.eval.splits import train_test_val_split
    from nngp_tpu.eval.qerror import symmetric_qerror
    from nngp_tpu.gp import fit_gp
    from nngp_tpu.models.kernel_spec import reference_kernel
    from nngp_tpu.utils.timing import sync, timed

    x, y, infos, _ = load_single_table_workload(
        "workloads/forest_data", dtype=np.float32
    )
    x_tr, y_tr, _, x_te, y_te, _, _, _, _ = train_test_val_split(
        x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos
    )
    spec = reference_kernel()
    x_tr_d = jax.device_put(jnp.asarray(x_tr))
    y_tr_d = jax.device_put(jnp.asarray(y_tr))
    x_te_d = jax.device_put(jnp.asarray(x_te))

    def fit():
        post = fit_gp(spec, x_tr_d, y_tr_d, diag_reg=1e-3, get="nngp")
        return post

    # Warm-up (compile), then measure.
    post = fit()
    sync((post.l, post.alpha))
    sync(post.predict_mean_std(x_te_d))

    # Dispatch+sync floor of the remote-TPU tunnel on this image (~30 ms):
    # included in the wall-clocks below, reported so on-device time is
    # interpretable.
    trivial = jax.jit(lambda a: a + 1.0)
    small = jnp.ones((8, 128))
    trivial(small)
    _, floor_s = timed(lambda: trivial(small), repeats=5)

    _, fit_s = timed(lambda: (lambda p: (p.l, p.alpha))(fit()), repeats=5)
    (mean, std), pred_s = timed(lambda: post.predict_mean_std(x_te_d), repeats=5)
    qps = x_te.shape[0] / pred_s

    errors = np.asarray(mean).ravel() - np.asarray(y_te).ravel()
    q = symmetric_qerror(errors)

    north_star_s = 1.0  # BASELINE.json: fit < 1 s on TPU
    print(json.dumps({
        "metric": "nngp_fit_forest_10k8_gram_cholesky_warm",
        "value": round(fit_s, 6),
        "unit": "s",
        "vs_baseline": round(north_star_s / fit_s, 4),
        "posterior_qps": round(qps, 1),
        "posterior_batch_s": round(pred_s, 6),
        "median_qerror": round(float(np.median(q)), 4),
        "p95_qerror": round(float(np.quantile(q, 0.95)), 4),
        "n_train": int(x_tr.shape[0]),
        "n_test": int(x_te.shape[0]),
        "dispatch_floor_s": round(floor_s, 6),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
