"""Baseline-model training CLI — the `python dnn/train.py --model_type ...`
dispatch surface (`/root/reference/dnn/train.py:248-295`).

    python -m nngp_tpu.cli.train_baselines --model_type DNN \
        --query_path workloads/forest_data

Model types: DNN (MultiTaskMLP), MCDropout, DeepEnsemble, Density, DKL
(exact-GP deep kernel), DKL-SKI (grid-interpolation / KISS-GP deep kernel —
the reference's covariance structure), GP (sklearn exact GP), KRR, MLP
(sklearn), XGB (xgboost when installed, else the sklearn
HistGradientBoosting fallback), RBF-GP (our jax MLL-trained GP, the
reference's --kernel_type gp).
"""

import argparse
import sys

import numpy as np

import jax.numpy as jnp

from nngp_tpu.baselines.trainer import (
    krr_train_and_test,
    sklearn_gp_train_and_test,
    train_deep_ensemble,
    train_density,
    train_mc_dropout,
    train_mlp_regressor,
    train_multitask,
    xgb_train_and_test,
)
from nngp_tpu.data.workload import load_single_table_workload
from nngp_tpu.eval.qerror import PredictionStatistics, symmetric_qerror
from nngp_tpu.eval.splits import train_test_val_split

MODEL_TYPES = ["DNN", "MCDropout", "DeepEnsemble", "Density", "DKL",
               "DKL-SKI", "GP", "KRR", "MLP", "XGB", "RBF-GP", "MSCN"]


def build_parser():
    p = argparse.ArgumentParser(
        "nngp_tpu baselines",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--model_type", type=str, default="DNN",
                   choices=MODEL_TYPES)
    p.add_argument("--relations", type=str, default="forest")
    p.add_argument("--names", type=str, default="forest")
    p.add_argument("--query_path", type=str, default="workloads/forest_data")
    p.add_argument("--data_path", type=str, default=None)
    p.add_argument("--chunk_size", type=int, default=64)
    p.add_argument("--num_hid", type=int, default=256)
    p.add_argument("--max_classes", type=int, default=10)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=8e-5)
    p.add_argument("--decay_factor", type=float, default=0.85)
    p.add_argument("--decay_patience", type=int, default=10)
    p.add_argument("--coeff", type=float, default=1.0)
    p.add_argument("--max_num_train", type=int, default=None)
    return p


def _run_mscn(args):
    """Single-table MSCN set-convolution baseline
    (`/root/reference/baselines/train.py` with MSCNEncoder)."""
    from nngp_tpu.baselines.mscn_trainer import train_mscn_single
    from nngp_tpu.data.workload import single_table_stats
    from nngp_tpu.featurize.mscn import MSCNSingleEncoder
    from nngp_tpu.featurize.parser import load_single_table_queries
    import random

    stats = single_table_stats(args.relations, args.names, args.query_path,
                               args.data_path, chunk_size=args.chunk_size)
    queries, cards, infos = load_single_table_queries(args.query_path, stats)
    enc = MSCNSingleEncoder(stats)
    batch, _mask = enc.encode_batch(queries)
    y = np.log2(np.asarray(cards, dtype=np.float64)).reshape(-1, 1)
    n = len(queries)
    idx = list(range(n))
    random.seed(10)
    random.shuffle(idx)
    n_tr = int(0.6 * n)
    n_te = int(0.2 * n)
    if args.max_num_train:
        n_tr = min(n_tr, args.max_num_train)
    te = idx[int(0.6 * n):int(0.6 * n) + n_te]
    batch = batch[idx]
    yp = y[idx]
    model, params = train_mscn_single(
        batch[:n_tr], yp[:n_tr], epochs=args.epochs,
        batch_size=args.batch_size, lr=args.learning_rate,
        weight_decay=args.weight_decay, verbose=print,
        pred_hid_ch=args.num_hid, pred_out_ch=args.num_hid,
        mlp_hid_ch=args.num_hid)
    te_slice = slice(int(0.6 * n), int(0.6 * n) + n_te)
    pred = model.apply(params, jnp.asarray(batch[te_slice], jnp.float32))
    return (np.asarray(pred).ravel(), yp[te_slice].ravel(),
            [infos[i] for i in te])


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.model_type == "MSCN":
        pred, y_true, infos_te = _run_mscn(args)
        errors = pred - y_true
        print(f"MSCN mean square error: {float(np.mean(errors ** 2)):.4f}")
        PredictionStatistics().get_prediction_details(
            errors, infos_te, partition_keys="num_table")
        q = symmetric_qerror(errors)
        print(f"symmetric q-error: median={np.median(q):.4f} "
              f"p95={np.quantile(q, 0.95):.4f}")
        return
    x, y, infos, _ = load_single_table_workload(
        args.query_path, relation=args.relations.split(",")[0],
        name=args.names.split(",")[0], data_path=args.data_path,
        chunk_size=args.chunk_size, dtype=np.float32)
    print(f"number of query: {x.shape[0]}")
    (x_tr, y_tr, _i1, x_te, y_te, infos_te, *_rest) = train_test_val_split(
        x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos,
        max_num_train=args.max_num_train)
    print(f"train {x_tr.shape}  test {x_te.shape}")

    common = dict(num_hid=args.num_hid, epochs=args.epochs,
                  batch_size=args.batch_size, lr=args.learning_rate,
                  weight_decay=args.weight_decay,
                  decay_factor=args.decay_factor,
                  decay_patience=args.decay_patience, verbose=print)

    mt = args.model_type
    if mt == "DNN":
        model, params = train_multitask(x_tr, y_tr,
                                        max_classes=args.max_classes,
                                        coeff=args.coeff, **common)
        pred, _ = model.apply(params, jnp.asarray(x_te))
        pred = np.asarray(pred).ravel()
    elif mt == "MCDropout":
        model, params = train_mc_dropout(x_tr, y_tr, **common)
        import jax
        pred, std = model.predict(params, jnp.asarray(x_te),
                                  jax.random.PRNGKey(0))
        pred = np.asarray(pred).ravel()
    elif mt == "DeepEnsemble":
        ens, params = train_deep_ensemble(x_tr, y_tr, **common)
        pred, std = ens.predict(params, jnp.asarray(x_te))
        pred = np.asarray(pred).ravel()
    elif mt == "Density":
        model, params = train_density(x_tr, y_tr, **common)
        mu, _ = model.apply(params, jnp.asarray(x_te))
        pred = np.asarray(mu).ravel()
    elif mt == "DKL":
        from nngp_tpu.models.dkl import predict_dkl, train_dkl
        params = train_dkl(x_tr, y_tr, hid_dim=args.num_hid,
                           epochs=args.epochs, verbose=print)
        pred, _ = predict_dkl(params, x_tr, y_tr, x_te)
        pred = np.asarray(pred).ravel()
    elif mt == "DKL-SKI":
        # the reference's actual DKL covariance: grid interpolation
        # (`/root/reference/dnn/layers.py:62-78`); see models/ski.py
        from nngp_tpu.models.ski import predict_dkl_ski, train_dkl_ski
        params = train_dkl_ski(x_tr, y_tr, hid_dim=args.num_hid,
                               epochs=args.epochs, verbose=print)
        pred, _ = predict_dkl_ski(params, jnp.asarray(x_tr),
                                  jnp.asarray(y_tr), jnp.asarray(x_te))
        pred = np.asarray(pred).ravel()
    elif mt == "GP":
        pred, _std = sklearn_gp_train_and_test(x_tr, y_tr, x_te)
    elif mt == "KRR":
        pred = krr_train_and_test(x_tr, y_tr, x_te)
    elif mt == "MLP":
        reg = train_mlp_regressor(x_tr, y_tr, num_hid=args.num_hid,
                                  epochs=args.epochs,
                                  batch_size=args.batch_size,
                                  lr=args.learning_rate,
                                  weight_decay=args.weight_decay)
        pred = reg.predict(x_te)
    elif mt == "XGB":
        pred = xgb_train_and_test(x_tr, y_tr, x_te)
    elif mt == "RBF-GP":
        from nngp_tpu.models import gp_rbf
        params = gp_rbf.train(jnp.asarray(x_tr), jnp.asarray(y_tr),
                              num_steps=10, verbose=print)
        mu, _var = gp_rbf.predict(params, jnp.asarray(x_tr),
                                  jnp.asarray(y_tr), jnp.asarray(x_te))
        pred = np.asarray(mu).ravel()
    else:
        raise SystemExit(f"unknown model type {mt}")

    errors = pred - np.asarray(y_te).ravel()
    mse = float(np.mean(errors ** 2))
    print(f"{mt} mean square error: {mse:.4f}")
    PredictionStatistics().get_prediction_details(
        errors, infos_te, partition_keys="num_table")
    q = symmetric_qerror(errors)
    print(f"symmetric q-error: median={np.median(q):.4f} "
          f"p95={np.quantile(q, 0.95):.4f}")


if __name__ == "__main__":
    main(sys.argv[1:])
