"""Training / evaluation CLI — the `python train.py --kernel_type nngp`
equivalent (`/root/reference/train.py:251-298`).

    python -m nngp_tpu.cli.train --kernel_type nngp \
        --query_path workloads/forest_data --relations forest

Pipeline parity with `/root/reference/train.py:224-246`: load workload ->
seed-10 60/20/20 split -> fit exact GP on the NNGP or NTK kernel -> report
MSE + partitioned q-error profile. Differences by design: fp32 on TPU
(fp64 on CPU via --x64), vectorized encoding, device-resident posterior.
"""

import argparse
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

from nngp_tpu.data.workload import load_single_table_workload
from nngp_tpu.eval.qerror import PredictionStatistics, qerror_profile, symmetric_qerror
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.gp import fit_gp
from nngp_tpu.models.kernel_spec import KernelSpec, mlp
from nngp_tpu.utils.timing import Timer


def build_parser():
    p = argparse.ArgumentParser(
        "nngp_tpu trainer", formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    p.add_argument("--kernel_type", type=str, default="nngp",
                   choices=["nngp", "ntk", "gp"],
                   help="posterior semantics; 'gp' = the hand-rolled RBF GP "
                        "with 10-step MLL hyperparameter training "
                        "(/root/reference/train.py:60-150)")
    p.add_argument("--chunk_norm", action="store_true",
                   help="rescale packed categorical chunk slots onto the "
                        "[0,1000] numeric scale (measured 3.4x median "
                        "q-error on skewed joins; off = reference parity)")
    p.add_argument("--chunk_size", type=int, default=64,
                   help="factorized-encoding chunk width")
    p.add_argument("--relations", type=str, default="forest")
    p.add_argument("--names", type=str, default="forest")
    p.add_argument("--schema_name", type=str, default=None,
                   help="multi-join schema (tpch/tpcds/imdb_simple/...); "
                        "switches to the multi-join workload path")
    p.add_argument("--query_path", type=str, default="workloads/forest_data")
    p.add_argument("--data_path", type=str, default=None,
                   help="raw CSV dir (optional; stats fall back to query scan "
                        "/ stats JSON)")
    p.add_argument("--diag_reg", type=float, default=1e-3)
    p.add_argument("--select_reg", type=str, default=None,
                   help="comma-separated diag_reg candidates: refit per "
                        "candidate, print the exact-GP log-evidence table, "
                        "keep the argmax (gp.select_diag_reg; the reference "
                        "pins diag_reg=1e-3)")
    p.add_argument("--nystrom_m", type=int, default=None,
                   help="fit the streaming Nystrom/DTC tier with this many "
                        "inducing rows instead of the exact posterior — "
                        "O(n m^2) flops / O(m^2) device state, for train "
                        "sets beyond the exact fit's single-chip edge "
                        "(gp/nystrom.py)")
    p.add_argument("--nystrom_moments", type=str, default="fp32",
                   choices=("fp32", "df64"),
                   help="Nystrom moment-streaming precision: df64 runs "
                        "kernel entries + whitened projection + "
                        "accumulators in emulated fp64 on device "
                        "(fp32 posteriors only)")
    p.add_argument("--learn_hyper", action="store_true",
                   help="learn (w0, w, b, diag_reg) by exact-MLL gradient "
                        "descent before fitting (gp.hyperopt; multi-start "
                        "Adam, one compiled dispatch) — overrides "
                        "--w_std/--b_std/--diag_reg with the learned values")
    p.add_argument("--hyper_file", type=str, default=None,
                   help="learned-hyperparameter JSON artifact "
                        "(gp.hyperopt.HyperoptResult): if it exists, load "
                        "it and skip learning; otherwise learn (with "
                        "--learn_hyper/--select_kernel) and save it there")
    p.add_argument("--hyper_steps", type=int, default=100)
    p.add_argument("--hyper_points", type=int, default=4096,
                   help="training-row subsample the MLL is optimized on; "
                        "0 = the FULL training set (DTC objective only — "
                        "that loss is linear in n)")
    p.add_argument("--ard", action="store_true",
                   help="with --learn_hyper: learn a PER-FEATURE input "
                        "scale by evidence (ARD) — train and test features "
                        "are rescaled by the learned vector before the fit")
    p.add_argument("--hyper_objective", type=str, default="auto",
                   choices=["auto", "exact", "dtc"],
                   help="which evidence --learn_hyper maximizes: the exact "
                        "GP's, or the Nystrom/DTC tier's own (Woodbury "
                        "m x m form). auto = dtc when --nystrom_m is set "
                        "(DTC-objective hypers beat exact-objective hypers "
                        "on the served tier at 90k, BASELINE.md)")
    p.add_argument("--select_kernel", action="store_true",
                   help="evidence-ranked model selection over (depth in "
                        "1..3) x (relu, erf) with learned hyperparameters "
                        "per structure (gp.hyperopt.select_kernel) — "
                        "overrides --depth/--activation/--w_std/--b_std/"
                        "--diag_reg; one compile per structure")
    p.add_argument("--depth", type=int, default=1, help="hidden layers")
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--activation", type=str, default="relu", choices=["relu", "erf"])
    p.add_argument("--w_std", type=float, default=1.0)
    p.add_argument("--b_std", type=float, default=0.0)
    p.add_argument("--x64", action="store_true", help="fp64 (CPU only)")
    p.add_argument("--train_frac", type=float, default=0.6)
    p.add_argument("--test_frac", type=float, default=0.2)
    p.add_argument("--max_num_train", type=int, default=None)
    p.add_argument("--seed", type=int, default=10)
    p.add_argument("--partition_keys", type=str, default=None,
                   help="q-error partition attributes (default: num_table "
                        "for join workloads, num_predicates for single-table)")
    p.add_argument("--calibration", action="store_true",
                   help="print expected-vs-observed confidence levels")
    p.add_argument("--uneven_split", type=str, default=None,
                   help="skew train composition by these attributes "
                        "(e.g. num_predicates)")
    p.add_argument("--skew_ratio", type=float, default=0.5)
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler trace of the warm fit + "
                        "inference here (view in TensorBoard/Perfetto)")
    p.add_argument("--config", type=str, default=None,
                   help="JSON RunConfig file (utils.config) providing the "
                        "defaults; explicit flags still override")
    return p


def _apply_config_defaults(p, config_path):
    """Seed the parser defaults from a RunConfig JSON — the typed-config
    replacement for the reference's commented-out argparse preset forests
    (`/root/reference/train.py:252-287`)."""
    from nngp_tpu.utils.config import RunConfig
    with open(config_path) as f:
        cfg = RunConfig.from_json(f.read())
    p.set_defaults(
        kernel_type=cfg.kernel.kernel_type, depth=cfg.kernel.depth,
        width=cfg.kernel.width, activation=cfg.kernel.activation,
        w_std=cfg.kernel.w_std, b_std=cfg.kernel.b_std,
        diag_reg=cfg.kernel.diag_reg,
        learn_hyper=cfg.kernel.learn_hyper,
        hyper_steps=cfg.kernel.hyper_steps,
        hyper_points=cfg.kernel.hyper_points,
        ard=cfg.kernel.hyper_ard,
        relations=cfg.workload.relations, names=cfg.workload.names,
        schema_name=cfg.workload.schema_name,
        query_path=cfg.workload.query_path, data_path=cfg.workload.data_path,
        chunk_size=cfg.workload.chunk_size,
        train_frac=cfg.split.train_frac, test_frac=cfg.split.test_frac,
        seed=cfg.split.seed, max_num_train=cfg.split.max_num_train,
        x64=cfg.x64,
    )


def main(argv=None):
    p = build_parser()
    pre, _ = p.parse_known_args(argv)
    if pre.config:
        _apply_config_defaults(p, pre.config)
    args = p.parse_args(argv)
    if args.x64:
        jax.config.update("jax_enable_x64", True)
    dtype = np.float64 if args.x64 else np.float32

    if args.schema_name:
        from nngp_tpu.data.workload import load_multi_join_workload
        x, y, infos, enc = load_multi_join_workload(
            args.query_path, schema_name=args.schema_name,
            data_path=args.data_path, chunk_size=args.chunk_size, dtype=dtype,
            chunk_norm=args.chunk_norm)
    elif len(args.relations.split(",")) > 1:
        # binary-join path, derived from the comma exactly as the reference
        # does (`/root/reference/train.py:295-296`)
        from nngp_tpu.data.workload import load_binary_join_workload
        x, y, infos, enc = load_binary_join_workload(
            args.query_path, relations=args.relations, names=args.names,
            data_path=args.data_path, chunk_size=args.chunk_size, dtype=dtype,
            chunk_norm=args.chunk_norm)
    else:
        x, y, infos, enc = load_single_table_workload(
            args.query_path, relation=args.relations.split(",")[0],
            name=args.names.split(",")[0], data_path=args.data_path,
            chunk_size=args.chunk_size, dtype=dtype,
            chunk_norm=args.chunk_norm,
        )
    print(f"number of query: {x.shape[0]}  feature dim: {x.shape[1]}")

    if args.uneven_split:
        from nngp_tpu.eval.splits import uneven_train_test_split
        (x_tr, y_tr, infos_tr, x_te, y_te, infos_te, *_rest) = \
            uneven_train_test_split(
                x, y, all_query_infos=infos,
                skew_split_keys=args.uneven_split,
                train_frac=args.train_frac, skew_ratio=args.skew_ratio,
                seed=args.seed)
    else:
        (x_tr, y_tr, infos_tr, x_te, y_te, infos_te, *_rest) = \
            train_test_val_split(
                x, y, train_frac=args.train_frac, test_frac=args.test_frac,
                seed=args.seed, all_query_infos=infos,
                max_num_train=args.max_num_train)
    print(f"train {x_tr.shape}  test {x_te.shape}")

    from nngp_tpu.utils.memory import memory_usage_gb
    timer = Timer()
    from contextlib import nullcontext
    from nngp_tpu.utils.profiling import annotate, trace
    prof = trace(args.profile_dir) if args.profile_dir else nullcontext()
    if args.kernel_type == "gp":
        # Hand-rolled RBF GP branch (`/root/reference/train.py:243-244`):
        # MLL hyperparameter descent, then a timed posterior predict.
        from nngp_tpu.models import gp_rbf
        x_tr_d, y_tr_d = jnp.asarray(x_tr), jnp.asarray(y_tr).reshape(-1, 1)
        x_te_d = jnp.asarray(x_te)
        with prof:
            with timer.measure("GP hyperparameter training (10 MLL steps)") \
                    as h, annotate("gp_mll_train"):
                params = gp_rbf.train(x_tr_d, y_tr_d)
                h["out"] = params
            with timer.measure("GP inference (cold, incl. compile)") as h:
                mean, cov = gp_rbf.predict(params, x_tr_d, y_tr_d, x_te_d)
                h["out"] = (mean, cov)
            with timer.measure("GP inference (warm)") as h, \
                    annotate("gp_infer_warm"):
                mean, cov = gp_rbf.predict(params, x_tr_d, y_tr_d, x_te_d)
                h["out"] = (mean, cov)
        if args.profile_dir:
            print(f"profiler trace written to {args.profile_dir}")
        timer.report()
        std = jnp.sqrt(jnp.maximum(jnp.diagonal(cov), 0.0))
    else:
        spec = KernelSpec(mlp(args.depth, args.width, args.activation,
                              args.w_std, args.b_std))
        res = None
        if args.hyper_file and os.path.exists(args.hyper_file):
            # reuse an earlier run's learned-hyperparameter artifact (the
            # learning costs minutes; the artifact is a small JSON)
            from nngp_tpu.gp.hyperopt import HyperoptResult
            res = HyperoptResult.load(args.hyper_file)
            print(f"loaded hyperparameters from {args.hyper_file} "
                  f"(depth={res.depth} activation={res.activation} "
                  f"{res.objective} log evidence {res.log_evidence:.2f})")
        elif args.select_kernel:
            from nngp_tpu.gp.hyperopt import select_kernel
            # same routing as --learn_hyper: compete structures on the
            # evidence of the tier that will actually serve, and honor --ard
            objective = args.hyper_objective
            if objective == "auto":
                objective = "dtc" if args.nystrom_m else "exact"
            with timer.measure("kernel selection (evidence grid)") as h:
                res, ranked = select_kernel(
                    x_tr, y_tr, get=args.kernel_type,
                    steps=args.hyper_steps, max_points=args.hyper_points,
                    width=args.width, verbose=print, ard=args.ard,
                    objective=objective,
                    dtc_m=min(512, args.nystrom_m or 512))
                h["out"] = [(r.depth, r.activation, r.log_evidence)
                            for r in ranked]
            print(f"selected kernel: depth={res.depth} "
                  f"activation={res.activation}")
        elif args.learn_hyper:
            from nngp_tpu.gp.hyperopt import fit_kernel_hyperparams
            objective = args.hyper_objective
            if objective == "auto":
                objective = "dtc" if args.nystrom_m else "exact"
            if not args.hyper_points and objective != "dtc":
                p.error("--hyper_points 0 (full-n hyperopt) requires the "
                        "DTC objective (exact loss is O(n^3)/step)")
            with timer.measure("hyperparameter learning (MLL)") as h:
                res = fit_kernel_hyperparams(
                    x_tr, y_tr, depth=args.depth, activation=args.activation,
                    get=args.kernel_type, steps=args.hyper_steps,
                    max_points=args.hyper_points or None,
                    width=args.width,
                    init=(args.w_std, args.w_std, max(args.b_std, 0.1),
                          args.diag_reg), ard=args.ard,
                    objective=objective,
                    dtc_m=min(512, args.nystrom_m or 512))
                h["out"] = res.nll_history
        if res is not None:
            print(f"learned hyperparameters: w0={res.w0:.4f} w={res.w:.4f} "
                  f"b={res.b:.4f} diag_reg={res.diag_reg:.3e} "
                  f"({res.objective} log evidence {res.log_evidence:.2f} "
                  f"on {res.num_points} rows)")
            spec = res.spec
            args.diag_reg = res.diag_reg
            if res.feature_scale is not None:
                s = res.feature_scale
                print(f"learned ARD feature scale: range "
                      f"[{s.min():.3g}, {s.max():.3g}]")
                x_tr = x_tr * s.astype(x_tr.dtype)
                x_te = x_te * s.astype(x_te.dtype)
            if args.hyper_file and not os.path.exists(args.hyper_file):
                res.save(args.hyper_file)
                print(f"saved hyperparameter artifact to {args.hyper_file}")
        print("memory:", memory_usage_gb())
        if args.nystrom_m:
            from nngp_tpu.gp import fit_nystrom

            def _fit():
                return fit_nystrom(spec, x_tr, y_tr,
                                   num_inducing=args.nystrom_m,
                                   diag_reg=args.diag_reg,
                                   get=args.kernel_type,
                                   moments=args.nystrom_moments)
        else:
            def _fit():
                # x_tr stays HOST numpy here: the fp32 prescale probe
                # (max|x|) runs for free instead of a blocking device fetch
                return fit_gp(spec, x_tr, y_tr,
                              diag_reg=args.diag_reg, get=args.kernel_type)
        if args.select_reg:
            # evidence-based ridge selection (pins diag_reg for the timed
            # fits below; works for the exact tier)
            if args.nystrom_m:
                raise SystemExit("--select_reg selects on the exact "
                                 "posterior; drop --nystrom_m (the Nystrom "
                                 "tier has posterior.log_evidence())")
            from nngp_tpu.gp import select_diag_reg
            cands = [float(v) for v in args.select_reg.split(",")]
            best, scores = select_diag_reg(spec, x_tr, y_tr,
                                           candidates=cands,
                                           get=args.kernel_type)
            for r, mll in sorted(scores.items()):
                tag = "  <-- selected" if r == float(best.diag_reg) else ""
                print(f"diag_reg={r:g}: log evidence {mll:.2f}{tag}")
            args.diag_reg = float(best.diag_reg)
        # honest labels: after --select_reg the fit program is already
        # compiled (the sweep fit every candidate), so the first timed fit
        # below is warm, not cold
        cold_label = ("kernel construction (fit: Gram + Cholesky, cold)"
                      if not args.select_reg else
                      "kernel construction (fit; warm — compiled during "
                      "--select_reg sweep)")
        with timer.measure(cold_label) as h:
            post = _fit()
            h["out"] = post.beta_w if args.nystrom_m else post.l
        with prof:
            with timer.measure("fit (warm)") as h, annotate("fit_warm"):
                post = _fit()
                h["out"] = post.beta_w if args.nystrom_m else post.l

            with timer.measure("inference (cold, incl. compile)") as h:
                mean, std = post.predict_mean_std(jnp.asarray(x_te))
                h["out"] = (mean, std)
            with timer.measure("inference (warm)") as h, \
                    annotate("infer_warm"):
                mean, std = post.predict_mean_std(jnp.asarray(x_te))
                h["out"] = (mean, std)
        if args.profile_dir:
            print(f"profiler trace written to {args.profile_dir}")
        timer.report()
        print("memory:", memory_usage_gb())

    mean = np.asarray(mean).ravel()
    y_true = np.asarray(y_te).ravel()
    mse = float(np.sum((mean - y_true) ** 2))
    print(f"Mean Square Error: {mse}")

    errors = mean - y_true
    stat = PredictionStatistics()
    join_workload = bool(args.schema_name) or len(args.relations.split(",")) > 1
    part_keys = args.partition_keys or (
        "num_table" if join_workload else "num_predicates")
    stat.get_prediction_details(errors, infos_te, partition_keys=part_keys)
    q = symmetric_qerror(errors)
    print(f"symmetric q-error: median={np.median(q):.4f} "
          f"p95={np.quantile(q, 0.95):.4f} p99={np.quantile(q, 0.99):.4f} "
          f"max={np.max(q):.4f}")
    if args.calibration:
        from nngp_tpu.eval.calibration import calibration_table
        table = calibration_table(y_true, mean, np.asarray(std).ravel())
        print("<" * 80)
        print("Calibration Result:")
        for level, observed in table.items():
            print(f"Expected/Observed Confidence Level={level}/{observed}")
        print(">" * 80)
    return qerror_profile(errors)


if __name__ == "__main__":
    main(sys.argv[1:])
