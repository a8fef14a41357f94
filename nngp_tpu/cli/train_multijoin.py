"""MSCN / TreeLSTM multi-join baseline training CLI — the
`python baselines/train_multijoin.py --model_type MSCN|TLSTM` equivalent
(`/root/reference/baselines/train_multijoin.py:125-223`).

    python -m nngp_tpu.cli.train_multijoin --model_type MSCN \
        --query_path workloads/synth_join_data --stats_dir workloads/synth_stats
"""

import argparse
import os
import sys

import numpy as np

import jax.numpy as jnp

from nngp_tpu.baselines.mscn_trainer import (
    plans_to_arrays,
    train_mscn_multi,
    train_tree_lstm,
)
from nngp_tpu.eval.qerror import PredictionStatistics, symmetric_qerror
from nngp_tpu.featurize.mscn import MSCNMultiEncoder
from nngp_tpu.featurize.stats import TableStats


def build_parser():
    p = argparse.ArgumentParser(
        "nngp_tpu multi-join baselines",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--model_type", type=str, default="MSCN",
                   choices=["MSCN", "TLSTM"])
    p.add_argument("--query_path", type=str, required=True)
    p.add_argument("--stats_dir", type=str, default=None)
    p.add_argument("--schema_name", type=str, default=None)
    p.add_argument("--data_path", type=str, default=None)
    p.add_argument("--chunk_size", type=int, default=10)
    p.add_argument("--num_hid", type=int, default=64)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=8e-5)
    p.add_argument("--train_frac", type=float, default=0.6)
    p.add_argument("--test_frac", type=float, default=0.2)
    p.add_argument("--seed", type=int, default=10)
    return p


def _load_stats(args):
    if args.stats_dir:
        from nngp_tpu.data.loaders import SCHEMAS
        from nngp_tpu.featurize.stats import load_stats_dir
        names = (SCHEMAS[args.schema_name][1]
                 if args.schema_name in SCHEMAS else None)
        return load_stats_dir(args.stats_dir, table_names=names)
    if args.data_path and args.schema_name:
        from nngp_tpu.data.loaders import SCHEMAS
        from nngp_tpu.featurize.schema import DBSchema
        loaders, names = SCHEMAS[args.schema_name]
        dfs, cts, pks = [], [], []
        for fn in loaders:
            df, ct, pk = fn(args.data_path)
            dfs.append(df)
            cts.append(ct)
            pks.append(pk)
        return DBSchema(dfs, cts, names, pks, args.chunk_size).stats
    raise SystemExit("pass --stats_dir or (--schema_name and --data_path)")


def main(argv=None):
    args = build_parser().parse_args(argv)
    stats = _load_stats(args)
    enc = MSCNMultiEncoder(stats, seed=args.seed)
    queries, cards, infos = enc.load_queries(args.query_path)
    y = np.log2(np.asarray(cards, dtype=np.float64)).reshape(-1, 1)
    n = len(queries)
    print(f"number of query: {n}")

    # reference-identical split index math (list-X variant,
    # `/root/reference/baselines/dataset.py:8-27`)
    import random
    idx = list(range(n))
    random.seed(args.seed)
    random.shuffle(idx)
    n_tr = int(args.train_frac * n)
    n_te = int(args.test_frac * n)
    tr, te = idx[:n_tr], idx[n_tr:n_tr + n_te]
    infos_te = [infos[i] for i in te]

    common = dict(epochs=args.epochs, batch_size=args.batch_size,
                  lr=args.learning_rate, weight_decay=args.weight_decay,
                  seed=args.seed, verbose=print)

    if args.model_type == "MSCN":
        (t, tm), (p, pm), (j, jm) = enc.encode_batch(
            [queries[i] for i in idx])  # pad over the full set, then slice
        model, params = train_mscn_multi(
            t[:n_tr], p[:n_tr], j[:n_tr], y[idx][:n_tr],
            table_hid_ch=args.num_hid, table_out_ch=args.num_hid,
            pred_hid_ch=args.num_hid, pred_out_ch=args.num_hid,
            join_hid_ch=args.num_hid, join_out_ch=args.num_hid,
            mlp_hid_ch=args.num_hid, **common)
        pred = model.apply(params,
                           jnp.asarray(t[n_tr:n_tr + n_te], jnp.float32),
                           jnp.asarray(p[n_tr:n_tr + n_te], jnp.float32),
                           jnp.asarray(j[n_tr:n_tr + n_te], jnp.float32))
    else:
        roots = [enc.encode_plan(*queries[i]) for i in idx]
        arrays = plans_to_arrays(roots)
        model, params, _ = train_tree_lstm(
            roots[:n_tr], y[idx][:n_tr],
            op_out_ch=args.num_hid // 2, meta_out_ch=args.num_hid // 2,
            pred_hid_ch=args.num_hid, pred_out_ch=args.num_hid,
            lstm_hid_ch=args.num_hid, mlp_hid_ch=args.num_hid, **common)
        te_arrays = tuple(jnp.asarray(a[n_tr:n_tr + n_te]) for a in arrays)
        pred = model.apply(params, *te_arrays)

    pred = np.asarray(pred).ravel()
    y_te = y[idx][n_tr:n_tr + n_te].ravel()
    errors = pred - y_te
    print(f"{args.model_type} mean square error: {np.mean(errors ** 2):.4f}")
    PredictionStatistics().get_prediction_details(
        errors, infos_te, partition_keys="num_table")
    q = symmetric_qerror(errors)
    print(f"symmetric q-error: median={np.median(q):.4f} "
          f"p95={np.quantile(q, 0.95):.4f}")


if __name__ == "__main__":
    main(sys.argv[1:])
