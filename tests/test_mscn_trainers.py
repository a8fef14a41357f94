"""MSCN / TreeLSTM trainer smoke + learning tests on a synthetic 3-table
multi-join workload."""

import numpy as np
import pytest

import jax.numpy as jnp

from nngp_tpu.baselines.mscn_trainer import (
    plans_to_arrays,
    train_mscn_multi,
    train_mscn_single,
    train_tree_lstm,
)
from nngp_tpu.featurize.mscn import MSCNMultiEncoder, MSCNSingleEncoder
from nngp_tpu.featurize.stats import ColumnStats, TableStats


def _schema():
    return [
        TableStats("ta", (ColumnStats("id", "numerical", 0, 100),
                          ColumnStats("x", "numerical", -10, 10))),
        TableStats("tb", (ColumnStats("id", "numerical", 0, 100),
                          ColumnStats("k", "numerical", 0, 5),
                          ColumnStats("y", "numerical", 0, 1))),
        TableStats("tc", (ColumnStats("k", "numerical", 0, 5),
                          ColumnStats("z", "numerical", 5, 15))),
    ]


def _multi_join_workload(n=200, seed=0):
    rng = np.random.default_rng(seed)
    enc = MSCNMultiEncoder(_schema(), seed=seed)
    queries, ys = [], []
    for _ in range(n):
        xu = rng.uniform(-10, 10)
        xl = rng.uniform(-10, xu)
        line = f"ta,tb@x,{xu:.3f},{xl:.3f}@@ta,tb,id@{max(1, int(100 * (xu - xl)))}"
        tids, preds, joins, card = enc.parse_line(line)
        queries.append((tids, preds, joins))
        ys.append(np.log2(card))
    return enc, queries, np.asarray(ys).reshape(-1, 1)


def test_mscn_multi_trainer_learns():
    enc, queries, y = _multi_join_workload()
    (t, tm), (p, pm), (j, jm) = enc.encode_batch(queries)
    model, params = train_mscn_multi(t, p, j, y, epochs=60, batch_size=50,
                                     lr=3e-3, verbose=None,
                                     table_hid_ch=32, table_out_ch=32,
                                     pred_hid_ch=32, pred_out_ch=32,
                                     join_hid_ch=16, join_out_ch=16,
                                     mlp_hid_ch=32)
    pred = model.apply(params, jnp.asarray(t, jnp.float32),
                       jnp.asarray(p, jnp.float32),
                       jnp.asarray(j, jnp.float32))
    mse = float(np.mean((np.asarray(pred) - y) ** 2))
    assert mse < np.var(y)


def test_mscn_single_trainer():
    st = _schema()[0]
    enc = MSCNSingleEncoder(st)
    rng = np.random.default_rng(1)
    pred_lists, ys = [], []
    for _ in range(150):
        xu = rng.uniform(-10, 10)
        xl = rng.uniform(-10, xu)
        pred_lists.append([(1, xu, xl)])
        ys.append(np.log2(max(1.0, 100 * (xu - xl))))
    batch, mask = enc.encode_batch(pred_lists)
    y = np.asarray(ys).reshape(-1, 1)
    model, params = train_mscn_single(batch, y, epochs=60, batch_size=50,
                                      lr=3e-3, verbose=None,
                                      pred_hid_ch=32, pred_out_ch=32,
                                      mlp_hid_ch=32)
    pred = model.apply(params, jnp.asarray(batch, jnp.float32))
    assert float(np.mean((np.asarray(pred) - y) ** 2)) < np.var(y)


def test_tree_lstm_trainer_runs():
    enc, queries, y = _multi_join_workload(n=80, seed=2)
    roots = [enc.encode_plan(*q) for q in queries]
    model, params, arrays = train_tree_lstm(
        roots, y, epochs=10, batch_size=20, verbose=None,
        op_out_ch=8, meta_out_ch=8, pred_hid_ch=16, pred_out_ch=16,
        lstm_hid_ch=16, mlp_hid_ch=16)
    pred = model.apply(params, *[jnp.asarray(a) for a in arrays])
    assert pred.shape == (80, 1)
    assert np.isfinite(np.asarray(pred)).all()


def test_plans_to_arrays_chain_structure():
    enc, queries, y = _multi_join_workload(n=5, seed=3)
    # add a 3-table chain
    line = "ta,tb,tc@@@z,9,6@ta,tb,id#tb,tc,k@50"
    tids, preds, joins, card = enc.parse_line(line)
    roots = [enc.encode_plan(*q) for q in queries]
    roots.append(enc.encode_plan(tids, preds, joins))
    arrs = plans_to_arrays(roots)
    leaf_pred, leaf_op, leaf_meta, node_pred, node_op, node_meta, node_valid = arrs[:7]
    assert leaf_op.shape[1] == 3          # max leaves = 3 tables
    assert node_valid.shape[1] == 2       # max chain levels = 2
    assert node_valid[-1].sum() == 2      # the 3-table plan has 2 joins
    assert node_valid[0].sum() == 1       # 2-table plans have 1


def test_tree_lstm_trains_on_mixed_chain_lengths():
    """Mixed 1/2/3-table plans: padded leaves/levels must not poison
    gradients (regression: inf sentinel in masked min-pool -> NaN params)."""
    enc, queries, y = _multi_join_workload(n=40, seed=4)
    lines = ["tb@y,0.5,0.1@@30",
             "ta,tb,tc@@@z,9,6@ta,tb,id#tb,tc,k@50"]
    for line in lines * 10:
        tids, preds, joins, card = enc.parse_line(line)
        queries.append((tids, preds, joins))
        y = np.vstack([y, [[np.log2(card)]]])
    roots = [enc.encode_plan(*q) for q in queries]
    model, params, arrays = train_tree_lstm(
        roots, y, epochs=5, batch_size=20, verbose=None,
        op_out_ch=8, meta_out_ch=8, pred_hid_ch=16, pred_out_ch=16,
        lstm_hid_ch=16, mlp_hid_ch=16)
    pred = model.apply(params, *[__import__("jax").numpy.asarray(a)
                                 for a in arrays])
    assert np.isfinite(np.asarray(pred)).all()
    leaves = __import__("jax").tree_util.tree_leaves(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
