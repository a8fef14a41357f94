"""Synth6 multi-join workload on the TPU: fit + predict + aux round-trip.

Establishes the numbers for the bench.py join section and the BASELINE.md
join-at-scale table: 18,000 labeled queries over the 6-table Zipf snowflake
(workloads/synth6_join_data), 10.8k train / 3.6k test / 3.6k val, 61-dim
features — the join analog of the forest headline workload.

Aux round-trip (reference serving feedback loop,
/root/reference/neuroestimator/merge_subquery_card.py): predict the val
split, emit card.csv-style prediction rows, merge into join_query_aux.txt
lines, keep the hard ones (q_error >= 100 OR coef_var >= 1), and fold them
into the live posterior with the incremental block-Cholesky append.
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from nngp_tpu.data.workload import load_multi_join_workload
    from nngp_tpu.eval.splits import train_test_val_split
    from nngp_tpu.eval.qerror import symmetric_qerror
    from nngp_tpu.gp import fit_gp
    from nngp_tpu.models.kernel_spec import reference_kernel
    from nngp_tpu.serve.feedback import PredInfo, merge_query_res
    from nngp_tpu.utils.timing import sync, timed

    qdir = "workloads/synth6_join_data"
    x, y, infos, enc = load_multi_join_workload(
        qdir, schema_name="synth6", dtype=np.float32)
    lines = []
    for fname in sorted(os.listdir(qdir)):
        with open(os.path.join(qdir, fname)) as f:
            lines += [ln.strip() for ln in f if ln.strip()]
    assert len(lines) == x.shape[0]
    # same index math as train_test_val_split (seed 10)
    idx = list(range(x.shape[0]))
    random.seed(10)
    random.shuffle(idx)
    lines = [lines[i] for i in idx]
    n_tr, n_te = int(0.6 * len(idx)), int(0.2 * len(idx))
    lines_val = lines[n_tr + n_te:]

    (x_tr, y_tr, _, x_te, y_te, _, x_val, y_val, _) = train_test_val_split(
        x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos)
    print(f"X {x.shape} train {x_tr.shape[0]} test {x_te.shape[0]}")

    spec = reference_kernel()
    x_tr_d = jax.device_put(jnp.asarray(x_tr))
    y_tr_d = jax.device_put(jnp.asarray(y_tr))
    x_te_d = jax.device_put(jnp.asarray(x_te))
    x_val_d = jax.device_put(jnp.asarray(x_val))

    post = fit_gp(spec, x_tr_d, y_tr_d, diag_reg=1e-3)
    sync((post.l, post.alpha))
    sync(post.predict_mean_std(x_te_d))
    _, fit_s = timed(
        lambda: (lambda p: (p.l, p.alpha))(
            fit_gp(spec, x_tr_d, y_tr_d, diag_reg=1e-3)), repeats=3)
    (mean, std), pred_s = timed(lambda: post.predict_mean_std(x_te_d),
                                repeats=3)
    q = symmetric_qerror(np.asarray(mean).ravel() - np.asarray(y_te).ravel())
    print(f"fit_s {fit_s:.4f}  predict_s {pred_s:.4f} "
          f"({x_te.shape[0]/pred_s:.0f} q/s)")
    print(f"median q {np.median(q):.4f}  p95 {np.quantile(q, 0.95):.4f} "
          f"p99 {np.quantile(q, 0.99):.4f}")

    # ---- aux feedback round-trip on the val split
    vmean, vstd = post.predict_mean_std(x_val_d)
    vmean = np.asarray(vmean).ravel()
    vstd = np.asarray(vstd).ravel()
    # true cards from the raw lines (an fp32 y -> exp2 roundtrip is lossy)
    true_cards = np.asarray([float(ln.rsplit("@", 1)[1]) for ln in lines_val])
    pred_cards = np.exp2(vmean)
    pred_info = [
        PredInfo(query_str="", nngp_card=float(pc), nngp_std=float(ps),
                 pg_card=-1.0, true_card=float(tc))
        for pc, ps, tc in zip(pred_cards, vstd, true_cards)]
    t0 = time.perf_counter()
    aux_lines = merge_query_res(pred_info, [ln + "\n" for ln in lines_val])
    # hard-query filter: reference keeps when EITHER threshold trips
    hard = []
    for ln in aux_lines:
        items = ln.split("@")
        q_err, cv = float(items[-2]), float(items[-1])
        if q_err >= 100.0 or cv >= 1.0:
            hard.append("@".join(items[:-2]))
    aux_build_s = time.perf_counter() - t0
    print(f"aux: {len(aux_lines)} val rows -> {len(hard)} hard "
          f"(build {aux_build_s*1e3:.1f} ms)")

    if hard:
        queries, cards = [], []
        for ln in hard:
            tids, preds, joins, card = enc.parse_line(ln)
            queries.append((tids, preds, joins))
            cards.append(card)
        xh, yh = enc.transform_to_arrays(queries, cards, dtype=np.float32)
        xh_d = jax.device_put(jnp.asarray(xh))
        yh_d = jax.device_put(jnp.asarray(yh))
        ext = post.extend(xh_d, yh_d)
        sync((ext.l, ext.alpha))
        _, ext_s = timed(
            lambda: (lambda p: (p.l, p.alpha))(post.extend(xh_d, yh_d)),
            repeats=3)
        m2, _ = ext.predict_mean_std(x_te_d)
        q2 = symmetric_qerror(np.asarray(m2).ravel() -
                              np.asarray(y_te).ravel())
        print(f"extend {len(hard)} hard rows: {ext_s:.4f} s; "
              f"test median q {np.median(q2):.4f}  "
              f"p95 {np.quantile(q2, 0.95):.4f}")


if __name__ == "__main__":
    main()
