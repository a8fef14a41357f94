"""Headline benchmark: end-to-end NNGP fit on the forest workload.

Measures the warm wall-clock of the full fit — fused Gram-panel assembly +
left-looking blocked Cholesky of K + rI + alpha solve — on 10,800 forest
training queries (60% of the committed 18,000-query workload, seed-10 split
identical to `/root/reference/util.py:271-293`), plus the warm batched
posterior (mean + std) throughput on the 3,600-query test split.

Extras in the same JSON line (driver-captured each round):
  posterior_qps / posterior_batch_s   warm batched predict
  median_qerror / p95_qerror          parity gate vs the fp64 oracle
  extend_1000_s                       incremental block-Cholesky append of
                                      1,000 rows (vs refitting ~ fit value)
  streaming_qps                       continuous-batching front-end under
                                      concurrent single-query load
  imdb_median_qerror / imdb_p95      IMDB-shaped 6-table clique workload
                                      (synthimdb) fit + predict accuracy
  fit_21600_s                         scale row (2x train set), skipped when
                                      NNGP_BENCH_FAST=1

Key schema v2 (bench_schema=2): workload+config-explicit names alongside
the legacy keys (whose r03 semantics are frozen) —
  <workload>_parity_*      bit-exact reference encoding + pinned hypers
  <workload>_best_*        the measured-best configuration (BASELINE.md
                           decision table: chunk_norm / ARD evidence-
                           learned hypers / DTC objective / df64 moments)
  forest_calibration_mae_{raw,calibrated}   coverage MAE before/after the
                           MLE std temperature (Estimator calibrate flow)
  synth6big_90k_best_*     the 90k-row Nystrom headline (only when
                           workloads/synth6_big_data is present)

North star (BASELINE.json): fit < 1 s on a v5e-8. The reference publishes no
numbers (`BASELINE.md`), so vs_baseline is north_star_seconds / measured —
values > 1 beat the target.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N, ...extras}
"""

import json
import os

import numpy as np


def _backend_or_cpu_reexec():
    """The axon TPU tunnel can be DOWN for hours — backend init then either
    raises UNAVAILABLE or HANGS, so probe it in a SUBPROCESS with a timeout
    (an in-process jax.devices() could wedge the bench forever). The driver
    still needs ONE JSON line, so on a dead tunnel fall back to a CPU run
    in a clean subprocess (axon plugin path stripped, NNGP_BENCH_FAST=1
    skips the scale rows — CPU numbers are marked by the "backend" field
    and are NOT comparable to the TPU headline)."""
    import subprocess
    import sys

    if os.environ.get("_NNGP_BENCH_CPU") == "1":
        return
    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=240, capture_output=True)
        if probe.returncode == 0:
            return
    except subprocess.TimeoutExpired:
        pass
    env = dict(os.environ)
    env["_NNGP_BENCH_CPU"] = "1"
    env["NNGP_BENCH_FAST"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p) or os.path.dirname(
            os.path.abspath(__file__))
    raise SystemExit(subprocess.run(
        [sys.executable, os.path.abspath(__file__)], env=env).returncode)


def main():
    _backend_or_cpu_reexec()
    import time as _tbudget

    # The optional heavy rows (best-config hyperopts, the 90k headline,
    # scale fits) each cost a 30-300 s remote compile on a cold cache.
    # Guarantee the JSON line always prints: skip remaining OPTIONAL rows
    # once the elapsed budget is spent (core parity rows always run).
    _t_start = _tbudget.perf_counter()
    _budget_s = float(os.environ.get("NNGP_BENCH_BUDGET_S", "4500"))

    def _over_budget():
        return _tbudget.perf_counter() - _t_start > _budget_s

    import jax
    import jax.numpy as jnp

    from nngp_tpu.data.workload import load_single_table_workload
    from nngp_tpu.eval.splits import train_test_val_split
    from nngp_tpu.eval.qerror import symmetric_qerror
    from nngp_tpu.gp import fit_gp
    from nngp_tpu.models.kernel_spec import reference_kernel
    from nngp_tpu.utils.timing import sync, timed

    x, y, infos, enc = load_single_table_workload(
        "workloads/forest_data", dtype=np.float32
    )
    x_tr, y_tr, _, x_te, y_te, _, x_val, y_val, _ = train_test_val_split(
        x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos
    )
    spec = reference_kernel()
    # layout-derived fp32 prescale (the production Estimator path does the
    # same): pinning it skips the per-fit data probe, which would add one
    # blocking ~30 ms tunnel fetch to every timed fit
    from nngp_tpu.gp.posterior import input_scale_for_bound
    s_forest = input_scale_for_bound(enc.max_abs_bound(), spec.layers)
    x_tr_d = jax.device_put(jnp.asarray(x_tr))
    y_tr_d = jax.device_put(jnp.asarray(y_tr))
    x_te_d = jax.device_put(jnp.asarray(x_te))

    def fit():
        return fit_gp(spec, x_tr_d, y_tr_d, diag_reg=1e-3, get="nngp",
                      input_scale=s_forest)

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

    extras = {}
    fast = os.environ.get("NNGP_BENCH_FAST") == "1"

    # ---- key schema v2 -------------------------------------------------
    # Round-3 lesson: `join_median_qerror` silently changed workloads
    # between rounds (3-table synth_join in r02, synth6 in r03) and the
    # headline keys report reference-PARITY configs, not the framework's
    # measured-best ones. v2 keys are workload-explicit and config-explicit
    # (`<workload>_<config>_<stat>`); the legacy keys keep their r03
    # semantics for cross-round continuity.
    extras["bench_schema"] = 2

    # Forest calibration: expected-vs-observed coverage MAE over 10 levels
    # on the TEST split — raw posterior std vs the MLE std temperature
    # fitted on the VAL split (the Estimator calibrate_frac/
    # calibrate_uncertainty flow; the reference can only PLOT calibration).
    from nngp_tpu.eval.calibration import (
        calibration_mae, calibration_table, fit_std_scale)
    x_val_d = jax.device_put(jnp.asarray(x_val))
    mv, sv = post.predict_mean_std(x_val_d)
    std_scale = fit_std_scale(np.asarray(y_val).ravel(),
                              np.asarray(mv).ravel(), np.asarray(sv).ravel())
    std_te = np.asarray(std).ravel()
    y_te_r = np.asarray(y_te, np.float64).ravel()
    mean_r = np.asarray(mean).ravel()
    extras["forest_calibration_mae_raw"] = round(
        calibration_mae(calibration_table(y_te_r, mean_r, std_te)), 4)
    extras["forest_calibration_mae_calibrated"] = round(
        calibration_mae(calibration_table(y_te_r, mean_r,
                                          std_te * std_scale)), 4)
    extras["forest_calibration_std_scale"] = round(std_scale, 4)

    # Incremental active-learning append: 1,000 labeled rows folded into the
    # factor in O(n^2 k) (the reference refits from scratch each round).
    x_new = jax.device_put(jnp.asarray(x_val[:1000]))
    y_new = jax.device_put(jnp.asarray(y_val[:1000]))
    ext = post.extend(x_new, y_new)
    sync((ext.l, ext.alpha))
    _, ext_s = timed(
        lambda: (lambda p: (p.l, p.alpha))(post.extend(x_new, y_new)),
        repeats=3)
    extras["extend_1000_s"] = round(ext_s, 6)

    # Streaming continuous batching: concurrent single-query submitters.
    # Batch sizes are bucketed to precompiled power-of-two shapes; results
    # are materialized in numpy (per-batch device shapes stay fixed — an
    # eager device-side [:nrows] slice would compile per distinct size).
    from nngp_tpu.serve.streaming import StreamingBatcher
    import time as _time
    buckets = (1024, 2048, 4096)

    def predict_rows(rows):
        xb = np.stack(rows)
        nrows = xb.shape[0]
        bucket = next(b for b in buckets if nrows <= b)
        if nrows < bucket:
            xb = np.concatenate(
                [xb, np.tile(xb[-1:], (bucket - nrows, 1))], axis=0)
        m, s = post.predict_mean_std(jnp.asarray(xb))
        # single fetch: two separate np.asarray materializations cost two
        # ~28 ms tunnel roundtrips (experiments/stream_tpu_profile.log)
        ms = np.asarray(jnp.stack([jnp.ravel(m), jnp.ravel(s)]))
        return ms[0, :nrows], ms[1, :nrows]

    for nb in buckets:                    # compile every bucket shape
        predict_rows([np.asarray(x_te[0])] * nb)
    # default policy: quiet-gap burst capture (the 3.6k submit burst is
    # absorbed into ~one dispatch; see serve/streaming.py). Best warm trial
    # of 3 (matching the best-of-N everywhere else): a single tunnel
    # dispatch varies 60-280 ms, which would otherwise dominate the row.
    rows = [np.asarray(r) for r in x_te]
    best_stream_s, best_st = float("inf"), None
    for _ in range(3):
        with StreamingBatcher(predict_rows, max_batch=buckets[-1]) as server:
            t0 = _time.perf_counter()
            futs = [server.submit(r) for r in rows]
            for f in futs:
                f.result(timeout=120)
            stream_s = _time.perf_counter() - t0
            st = server.stats()
        if stream_s < best_stream_s:
            best_stream_s, best_st = stream_s, st
    extras["streaming_qps"] = round(x_te.shape[0] / best_stream_s, 1)
    extras["streaming_batches"] = best_st["batches"]
    extras["streaming_p95_latency_ms"] = round(
        best_st["p95_latency_ms"], 2)

    # Multi-join end-to-end at forest scale: the committed 6-table
    # Zipf-skewed snowflake workload (18,000 labeled queries, 61-dim
    # features, 10.8k train) — fit + predict + the serving feedback
    # round-trip (predict val -> aux q-error/coef_var lines -> incremental
    # extend with the hard queries), mirroring the reference's PostgreSQL
    # feedback loop (`/root/reference/neuroestimator/merge_subquery_card.py`).
    # The 2^64-packed categorical chunks exercise the fp32 input-prescale
    # path (GPPosterior.input_scale).
    from nngp_tpu.data.workload import load_multi_join_workload
    xj, yj, infos_j, _enc = load_multi_join_workload(
        "workloads/synth6_join_data", schema_name="synth6", dtype=np.float32)
    xj_tr, yj_tr, _, xj_te, yj_te, _, xj_v, yj_v, _ = train_test_val_split(
        xj, yj, train_frac=0.6, test_frac=0.2, all_query_infos=infos_j)
    s_join = input_scale_for_bound(_enc.max_abs_bound(), spec.layers)
    xj_tr_d = jax.device_put(jnp.asarray(xj_tr))
    yj_tr_d = jax.device_put(jnp.asarray(yj_tr))
    xj_te_d = jax.device_put(jnp.asarray(xj_te))
    pj = fit_gp(spec, xj_tr_d, yj_tr_d, diag_reg=1e-3, input_scale=s_join)
    sync((pj.l, pj.alpha))
    _, join_fit_s = timed(
        lambda: (lambda p: (p.l, p.alpha))(
            fit_gp(spec, xj_tr_d, yj_tr_d, diag_reg=1e-3,
                   input_scale=s_join)), repeats=3)
    (mj, _sj), join_pred_s = timed(
        lambda: pj.predict_mean_std(xj_te_d), repeats=3)
    qj = symmetric_qerror(np.asarray(mj).ravel() - np.asarray(yj_te).ravel())
    extras["join_fit_s"] = round(join_fit_s, 6)
    extras["join_predict_s"] = round(join_pred_s, 6)
    extras["join_median_qerror"] = round(float(np.median(qj)), 4)
    extras["join_p95_qerror"] = round(float(np.quantile(qj, 0.95)), 4)
    # aux round-trip: q-error-hard val queries folded into the live factor
    vmj, _ = pj.predict_mean_std(jnp.asarray(xj_v))
    true_j = np.exp2(np.asarray(yj_v, np.float64)).ravel()
    pred_j = np.exp2(np.asarray(vmj, np.float64).ravel())
    qe_v = np.maximum(pred_j / np.maximum(true_j, 1.0),
                      np.maximum(true_j, 1.0) / np.maximum(pred_j, 1e-30))
    hard = np.where(qe_v >= 100.0)[0]
    pj_ext = pj.extend(jnp.asarray(xj_v[hard]), jnp.asarray(yj_v[hard]))
    sync((pj_ext.l, pj_ext.alpha))
    _, aux_ext_s = timed(
        lambda: (lambda p: (p.l, p.alpha))(
            pj.extend(jnp.asarray(xj_v[hard]), jnp.asarray(yj_v[hard]))),
        repeats=3)
    extras["join_aux_hard"] = int(hard.size)
    extras["join_aux_extend_s"] = round(aux_ext_s, 6)
    del pj_ext, pj

    # chunk_norm variant: packed categorical chunk slots rescaled onto the
    # [0,1000] numeric scale (opt-in framework improvement over the
    # reference's raw-integer encoding — featurize.SingleTableEncoder).
    xjn, yjn, infos_jn, enc_n = load_multi_join_workload(
        "workloads/synth6_join_data", schema_name="synth6",
        dtype=np.float32, chunk_norm=True)
    xn_tr, yn_tr, _, xn_te, yn_te, _, _, _, _ = train_test_val_split(
        xjn, yjn, train_frac=0.6, test_frac=0.2, all_query_infos=infos_jn)
    pn = fit_gp(spec, jax.device_put(jnp.asarray(xn_tr)),
                jax.device_put(jnp.asarray(yn_tr)), diag_reg=1e-3,
                input_scale=input_scale_for_bound(enc_n.max_abs_bound(),
                                                  spec.layers))
    mn, _sn = pn.predict_mean_std(jax.device_put(jnp.asarray(xn_te)))
    qn = symmetric_qerror(np.asarray(mn).ravel()
                          - np.asarray(yn_te).ravel())
    extras["join_median_qerror_chunk_norm"] = round(float(np.median(qn)), 4)
    extras["join_p95_qerror_chunk_norm"] = round(
        float(np.quantile(qn, 0.95)), 4)
    del pn

    # IMDB-shaped workload (workloads/synthimdb_data): 6-table movie_id
    # CLIQUE join graph with Zipf fanouts — the reference's actual
    # deployment shape (`/root/reference/neuroestimator/estimator/
    # util.py:159-195`), labeled by the message-passing tree counter.
    try:
        xi, yi, infos_i, enc_i = load_multi_join_workload(
            "workloads/synthimdb_data", schema_name="synthimdb",
            dtype=np.float32)
        xi_tr, yi_tr, _, xi_te, yi_te, _, _, _, _ = train_test_val_split(
            xi, yi, train_frac=0.6, test_frac=0.2, all_query_infos=infos_i)
        pi = fit_gp(spec, jax.device_put(jnp.asarray(xi_tr)),
                    jax.device_put(jnp.asarray(yi_tr)), diag_reg=1e-3,
                    input_scale=input_scale_for_bound(
                        enc_i.max_abs_bound(), spec.layers))
        sync((pi.l, pi.alpha))
        mi, _si = pi.predict_mean_std(jax.device_put(jnp.asarray(xi_te)))
        qi = symmetric_qerror(np.asarray(mi).ravel()
                              - np.asarray(yi_te).ravel())
        extras["imdb_median_qerror"] = round(float(np.median(qi)), 4)
        extras["imdb_p95_qerror"] = round(float(np.quantile(qi, 0.95)), 4)
        del pi
        # ARD-learned kernel on the same workload: per-feature relevance
        # scales cut the clique workload's median q-error ~2x (fp64-CPU
        # table in BASELINE.md; all-numerical [0,1000] features, fp32-safe)
        if _over_budget():
            raise TimeoutError("bench budget spent")
        from nngp_tpu.gp import fit_kernel_hyperparams
        resi = fit_kernel_hyperparams(xi_tr, yi_tr, steps=100,
                                      max_points=4096, ard=True)
        pia = fit_gp(resi.spec,
                     jax.device_put(jnp.asarray(resi.scale_inputs(xi_tr))),
                     jax.device_put(jnp.asarray(yi_tr)),
                     **resi.fit_kwargs())
        sync((pia.l, pia.alpha))
        mia, _ = pia.predict_mean_std(
            jax.device_put(jnp.asarray(resi.scale_inputs(xi_te))))
        qia = symmetric_qerror(np.asarray(mia).ravel()
                               - np.asarray(yi_te).ravel())
        extras["imdb_median_qerror_ard"] = round(float(np.median(qia)), 4)
        extras["imdb_p95_qerror_ard"] = round(
            float(np.quantile(qia, 0.95)), 4)
        del pia
    except Exception as e:                    # pragma: no cover - TPU only
        extras["imdb_median_qerror"] = extras.get("imdb_median_qerror")
        extras["imdb_error"] = type(e).__name__

    if not fast:
        # Forest BEST config (BASELINE.md decision table): ARD evidence-
        # learned hypers, exact fit — beats the reference's pinned
        # hyperparameters on every quantile (fp64-CPU: median 2.535/p95
        # 19.90 vs default 2.596/22.33).
        try:
            if _over_budget():
                raise TimeoutError("bench budget spent")
            from nngp_tpu.gp import fit_kernel_hyperparams as _fkh_f
            res_f = _fkh_f(x_tr, y_tr, steps=100, max_points=4096, ard=True)
            pf = fit_gp(res_f.spec,
                        jax.device_put(jnp.asarray(res_f.scale_inputs(x_tr))),
                        y_tr_d, **res_f.fit_kwargs())
            sync((pf.l, pf.alpha))
            mf, _ = pf.predict_mean_std(
                jax.device_put(jnp.asarray(res_f.scale_inputs(x_te))))
            qf = symmetric_qerror(np.asarray(mf).ravel()
                                  - np.asarray(y_te).ravel())
            extras["forest_best_median_qerror"] = round(
                float(np.median(qf)), 4)
            extras["forest_best_p95_qerror"] = round(
                float(np.quantile(qf, 0.95)), 4)
            del pf, res_f
        except Exception as e:               # pragma: no cover - TPU only
            extras["forest_best_median_qerror"] = None
            extras["forest_best_error"] = type(e).__name__

        # synth6 BEST config at 10.8k: chunk_norm features + ARD exact-
        # objective hypers, exact fit (fp64-CPU: 2.3235/28.0 vs raw parity
        # 9.85/5504 and chunk_norm default 2.685/33.0 — BASELINE.md).
        try:
            if _over_budget():
                raise TimeoutError("bench budget spent")
            from nngp_tpu.gp import fit_kernel_hyperparams as _fkh_s
            res_s = _fkh_s(xn_tr, yn_tr, steps=100, max_points=4096,
                           ard=True)
            ps = fit_gp(res_s.spec,
                        jax.device_put(jnp.asarray(res_s.scale_inputs(xn_tr))),
                        jax.device_put(jnp.asarray(yn_tr)),
                        **res_s.fit_kwargs())
            sync((ps.l, ps.alpha))
            msb, _ = ps.predict_mean_std(
                jax.device_put(jnp.asarray(res_s.scale_inputs(xn_te))))
            qsb = symmetric_qerror(np.asarray(msb).ravel()
                                   - np.asarray(yn_te).ravel())
            extras["synth6_best_median_qerror"] = round(
                float(np.median(qsb)), 4)
            extras["synth6_best_p95_qerror"] = round(
                float(np.quantile(qsb, 0.95)), 4)
            del ps, res_s
        except Exception as e:               # pragma: no cover - TPU only
            extras["synth6_best_median_qerror"] = None
            extras["synth6_best_error"] = type(e).__name__

        # 90k headline (only when the synth6_big workload is present —
        # regenerate with `python workloads/make_synth6_join.py --per_arity
        # 25000 --out_name synth6_big_data`): chunk_norm + full-n ARD x DTC
        # learned hypers + Nystrom m=2048 with df64 moment streaming — the
        # measured-best large-n serving configuration (BASELINE.md).
        big_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "workloads", "synth6_big_data")
        if os.path.isdir(big_dir):
            try:
                if _over_budget():
                    raise TimeoutError("bench budget spent")
                import time as _tb
                from nngp_tpu.gp import (fit_kernel_hyperparams as _fkh_b,
                                         fit_nystrom as _fitny_b)
                xb, yb, infos_b, _encb = load_multi_join_workload(
                    big_dir, schema_name="synth6", dtype=np.float32,
                    chunk_norm=True)
                xb_tr, yb_tr, _, xb_te, yb_te, _, _, _, _ = \
                    train_test_val_split(xb, yb, train_frac=0.6,
                                         test_frac=0.2,
                                         all_query_infos=infos_b)
                res_b = _fkh_b(xb_tr, yb_tr, steps=100, max_points=None,
                               ard=True, objective="dtc", dtc_m=512)
                xb_trs = res_b.scale_inputs(xb_tr)
                pb = _fitny_b(res_b.spec, xb_trs, yb_tr, num_inducing=2048,
                              moments="df64", **res_b.fit_kwargs())
                sync(pb.beta_w)
                t0 = _tb.perf_counter()
                pb = _fitny_b(res_b.spec, xb_trs, yb_tr, num_inducing=2048,
                              moments="df64", **res_b.fit_kwargs())
                sync(pb.beta_w)
                extras["synth6big_90k_fit_s"] = round(
                    _tb.perf_counter() - t0, 6)
                mb, _ = pb.predict_mean_std_chunked(
                    np.asarray(res_b.scale_inputs(xb_te)))
                qb = symmetric_qerror(np.asarray(mb).ravel()
                                      - np.asarray(yb_te).ravel())
                extras["synth6big_90k_best_median_qerror"] = round(
                    float(np.median(qb)), 4)
                extras["synth6big_90k_best_p95_qerror"] = round(
                    float(np.quantile(qb, 0.95)), 4)
                extras["synth6big_90k_n_train"] = int(xb_tr.shape[0])
                del pb
                # capacity is measured monotone (nystrom_90k_push.log):
                # m=4096 beats m=2048 on every quantile at 1.6 s warm fit
                if not _over_budget():
                    pb4 = _fitny_b(res_b.spec, xb_trs, yb_tr,
                                   num_inducing=4096, moments="df64",
                                   **res_b.fit_kwargs())
                    sync(pb4.beta_w)
                    mb4, _ = pb4.predict_mean_std_chunked(
                        np.asarray(res_b.scale_inputs(xb_te)))
                    qb4 = symmetric_qerror(
                        np.asarray(mb4).ravel()
                        - np.asarray(yb_te).ravel())
                    extras["synth6big_90k_m4096_median_qerror"] = round(
                        float(np.median(qb4)), 4)
                    extras["synth6big_90k_m4096_p95_qerror"] = round(
                        float(np.quantile(qb4, 0.95)), 4)
                    del pb4
                del res_b, xb, yb, xb_tr, yb_tr, xb_te, yb_te
            except Exception as e:           # pragma: no cover - TPU only
                extras["synth6big_90k_best_median_qerror"] = None
                extras["synth6big_90k_error"] = type(e).__name__

        # Streaming Nystrom/DTC tier (gp/nystrom.py): unbounded-n fits in
        # O(m^2) device state — forest accuracy + warm fit at m=1024 (the
        # warm time is host-eigh-bound; BASELINE.md has the 1M-row ladder).
        try:
            if _over_budget():
                raise TimeoutError("bench budget spent")
            from nngp_tpu.gp import fit_nystrom
            import time as _tn
            pny = fit_nystrom(spec, x_tr, y_tr, num_inducing=1024,
                              input_scale=s_forest)
            sync(pny.beta_w)
            best_ny = float("inf")
            for _ in range(2):
                t0 = _tn.perf_counter()
                pny = fit_nystrom(spec, x_tr, y_tr, num_inducing=1024,
                                  input_scale=s_forest)
                sync(pny.beta_w)
                best_ny = min(best_ny, _tn.perf_counter() - t0)
            mny, _sny = pny.predict_mean_std(x_te_d)
            qny = symmetric_qerror(np.asarray(mny).ravel()
                                   - np.asarray(y_te).ravel())
            extras["nystrom_m1024_fit_s"] = round(best_ny, 6)
            extras["nystrom_m1024_median_qerror"] = round(
                float(np.median(qny)), 4)
            del pny
        except Exception as e:               # pragma: no cover - TPU only
            extras["nystrom_m1024_fit_s"] = None
            extras["nystrom_m1024_error"] = type(e).__name__

        # Hyperparameter learning (gp/hyperopt.py): the whole multi-start
        # Adam optimization — per-step Gram + Cholesky + grad, 4 ridge
        # restarts vmapped — is ONE compiled dispatch. Warm wall-clock at
        # 50 steps on a 2048-row subsample (fp64-CPU takes ~10 min for the
        # same program; the MXU owns the per-step n^3).
        try:
            if _over_budget():
                raise TimeoutError("bench budget spent")
            from nngp_tpu.gp.hyperopt import fit_kernel_hyperparams
            import time as _th
            kwh = dict(steps=50, max_points=2048)
            res_h = fit_kernel_hyperparams(x_tr, y_tr, **kwh)
            t0 = _th.perf_counter()
            res_h = fit_kernel_hyperparams(x_tr, y_tr, **kwh)
            extras["hyperopt_50step_warm_s"] = round(
                _th.perf_counter() - t0, 6)
            extras["hyperopt_log_evidence"] = round(res_h.log_evidence, 2)
            del res_h
        except Exception as e:               # pragma: no cover - TPU only
            extras["hyperopt_50step_warm_s"] = None
            extras["hyperopt_error"] = type(e).__name__

        # ARD x DTC learned kernel on the chunk_norm join + Nystrom serve —
        # the recommended serving configuration (BASELINE.md: beats the
        # default kernel on every quantile, monotone in hyperopt rows).
        # Compare against join_median_qerror_chunk_norm above.
        try:
            if _over_budget():
                raise TimeoutError("bench budget spent")
            from nngp_tpu.gp import fit_nystrom as _fitny
            from nngp_tpu.gp.hyperopt import fit_kernel_hyperparams as _fkh
            res_a = _fkh(xn_tr, yn_tr, steps=50, max_points=2048,
                         ard=True, objective="dtc", dtc_m=256)
            pna = _fitny(res_a.spec, res_a.scale_inputs(xn_tr), yn_tr,
                         num_inducing=1024, **res_a.fit_kwargs())
            mna, _ = pna.predict_mean_std_chunked(
                np.asarray(res_a.scale_inputs(xn_te)))
            qna = symmetric_qerror(np.asarray(mna).ravel()
                                   - np.asarray(yn_te).ravel())
            extras["join_median_qerror_ard_dtc"] = round(
                float(np.median(qna)), 4)
            extras["join_p95_qerror_ard_dtc"] = round(
                float(np.quantile(qna, 0.95)), 4)
            del pna, res_a
        except Exception as e:               # pragma: no cover - TPU only
            extras["join_median_qerror_ard_dtc"] = None
            extras["ard_dtc_error"] = type(e).__name__

        # Scale rows: 2x and 3x train set (random features — wall-clock
        # only). 32,400 runs on the block-factor path (column blocks end to
        # end); guarded so a compile hiccup can't sink the whole bench line.
        rng = np.random.default_rng(0)
        for n_scale in (21600, 32400):
            try:
                if _over_budget():
                    raise TimeoutError("bench budget spent")
                x2 = jax.device_put(jnp.asarray(
                    rng.uniform(0, 1000, (n_scale, x_tr.shape[1])),
                    jnp.float32))
                y2 = jax.device_put(jnp.asarray(
                    rng.standard_normal((n_scale, 1)), jnp.float32))
                # features are uniform [0,1000] by construction: pin
                # scale 1.0, no data-probe roundtrip in the timed loop
                p2 = fit_gp(spec, x2, y2, diag_reg=1e-3, input_scale=1.0)
                sync((p2.l, p2.alpha))
                # time with ONE live factor: timed() would hold the previous
                # repeat's posterior while the next fit runs (2x factor HBM
                # right at the scale ceiling)
                import time as _t
                best = float("inf")
                for _ in range(2):
                    del p2
                    t0 = _t.perf_counter()
                    p2 = fit_gp(spec, x2, y2, diag_reg=1e-3,
                                input_scale=1.0)
                    sync((p2.l, p2.alpha))
                    best = min(best, _t.perf_counter() - t0)
                extras[f"fit_{n_scale}_s"] = round(best, 6)
                del p2, x2, y2
            except Exception as e:           # pragma: no cover - TPU only
                # keep the timing field numeric-or-null for JSON consumers;
                # the failure reason rides in a separate string field
                extras[f"fit_{n_scale}_s"] = None
                extras[f"fit_{n_scale}_error"] = type(e).__name__

    # v2 aliases: workload+config-explicit names for the parity keys (the
    # legacy names keep r03 semantics above). synth6_parity_* = the
    # bit-exact reference encoding; *_best_* rows above are the framework's
    # measured-best configurations on the same splits.
    extras["forest_parity_median_qerror"] = round(float(np.median(q)), 4)
    extras["forest_parity_p95_qerror"] = round(
        float(np.quantile(q, 0.95)), 4)
    extras["synth6_parity_median_qerror"] = extras["join_median_qerror"]
    extras["synth6_parity_p95_qerror"] = extras["join_p95_qerror"]
    extras["synth6_chunk_norm_median_qerror"] = extras[
        "join_median_qerror_chunk_norm"]
    extras["synthimdb_parity_median_qerror"] = extras.get(
        "imdb_median_qerror")
    extras["synthimdb_best_median_qerror"] = extras.get(
        "imdb_median_qerror_ard")

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
        **extras,
    }))


if __name__ == "__main__":
    main()
