"""Baseline flax models + one-hot set encoders: shape/structure tests and a
few behavioral checks (training a tiny task actually reduces loss)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nngp_tpu.featurize.mscn import (
    MSCNJoinEncoder,
    MSCNMultiEncoder,
    MSCNSingleEncoder,
    one_hot_predicate_encoding,
    pad_sets,
)
from nngp_tpu.featurize.stats import ColumnStats, TableStats
from nngp_tpu.models.baselines_flax import (
    DeepEnsemble,
    MCDropoutModel,
    MLP,
    MLPDensityRegressor,
    MultiTaskMLP,
    multitask_loss,
)
from nngp_tpu.models.mscn import MSCN, MSCNJoin, MSCNMultiJoin
from nngp_tpu.models.tree_lstm import TreeLSTMJoin, TreeLSTMMultiJoin


def _stats(name="t", cols=("a", "b", "c")):
    return TableStats(name, tuple(
        ColumnStats(c, "numerical", 0.0, 100.0) for c in cols), chunk_size=8)


# ------------------------------------------------------------- encoders
def test_one_hot_predicate_encoding_matches_reference_layout():
    st = _stats()
    cols_x, ops_x = one_hot_predicate_encoding(st, [(1, 50.0, 25.0)])
    assert cols_x.shape == (2, 3) and ops_x.shape == (2, 3)
    np.testing.assert_array_equal(cols_x[:, 1], [1, 1])
    assert ops_x[0, 0] == 1 and ops_x[0, 2] == 500.0   # upper row
    assert ops_x[1, 1] == 1 and ops_x[1, 2] == 250.0   # lower row


def test_pad_sets():
    sets = [np.ones((2, 4)), np.ones((5, 4)), np.zeros((0, 4))]
    padded, mask = pad_sets(sets)
    assert padded.shape == (3, 5, 4)
    assert mask.sum() == 7
    assert not mask[2].any()


def test_mscn_single_encoder_and_model_forward():
    st = _stats()
    enc = MSCNSingleEncoder(st)
    batch, mask = enc.encode_batch([[(0, 10.0, 5.0)], [(0, 10.0, 5.0), (2, 90.0, 0.0)]])
    assert batch.shape == (2, 4, 6)
    model = MSCN()
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(batch))
    out = model.apply(params, jnp.asarray(batch))
    assert out.shape == (2, 1)


def test_mscn_multi_encoder_and_model_forward():
    a, b = _stats("ta", ("id", "x")), _stats("tb", ("id", "y"))
    enc = MSCNMultiEncoder([a, b], seed=0)
    tids, preds, joins, card = enc.parse_line("ta,tb@x,5,1@@ta,tb,id@10")
    (t, tm), (p, pm), (j, jm) = enc.encode_batch([(tids, preds, joins)])
    assert t.shape[2] == 2          # num_tables one-hot
    assert p.shape[2] == 4 + 3      # global col space + 3 op slots
    assert j.shape[2] == enc.total_num_joins + 6
    model = MSCNMultiJoin()
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(t), jnp.asarray(p),
                        jnp.asarray(j))
    out = model.apply(params, jnp.asarray(t), jnp.asarray(p), jnp.asarray(j))
    assert out.shape == (1, 1)


def test_tree_lstm_plan_chain_and_model():
    a, b, c = (_stats("ta", ("id", "x")), _stats("tb", ("id", "y", "k")),
               _stats("tc", ("k", "z")))
    enc = MSCNMultiEncoder([a, b, c], seed=3)
    line = "ta,tb,tc@x,5,1@@z,9,2@ta,tb,id#tb,tc,k@77"
    tids, preds, joins, card = enc.parse_line(line)
    root = enc.encode_plan(tids, preds, joins)
    assert root.level == 2 and len(root.children) == 2

    # flatten the chain into padded arrays for the scan-based model
    leaves, nodes = [], []
    node = root
    while node.level > 0:
        nodes.append(node)
        leaves.append(node.children[0])
        node = node.children[1]
    leaves.append(node)
    nodes = nodes[::-1]
    leaves = leaves[::-1]

    leaf_pred, leaf_mask = pad_sets([l.pred_features for l in leaves])
    node_pred, node_mask = pad_sets([n.pred_features for n in nodes])
    leaf_op = np.stack([l.op_features for l in leaves])
    leaf_meta = np.stack([l.meta_features for l in leaves])
    node_op = np.stack([n.op_features for n in nodes])
    node_meta = np.stack([n.meta_features for n in nodes])

    model = TreeLSTMMultiJoin()
    args = (jnp.asarray(leaf_pred)[None], jnp.asarray(leaf_op)[None],
            jnp.asarray(leaf_meta)[None], jnp.asarray(node_pred)[None],
            jnp.asarray(node_op)[None], jnp.asarray(node_meta)[None],
            jnp.ones((1, len(nodes)), bool),
            jnp.asarray(leaf_mask)[None], jnp.asarray(node_mask)[None])
    params = model.init(jax.random.PRNGKey(0), *args)
    out = model.apply(params, *args)
    assert out.shape == (1, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_tree_lstm_join_forward():
    model = TreeLSTMJoin()
    rng = jax.random.PRNGKey(0)
    lp = jnp.ones((3, 4, 9))
    rp = jnp.ones((3, 2, 9))
    jx = jnp.ones((3, 1, 7))
    params = model.init(rng, lp, rp, jx)
    out = model.apply(params, lp, rp, jx)
    assert out.shape == (3, 1)


# ------------------------------------------------------------- dnn models
def test_mlp_and_multitask_shapes():
    x = jnp.ones((4, 10))
    m = MLP(hid_ch=32)
    p = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(p, x).shape == (4, 1)
    mt = MultiTaskMLP(hid_ch=32, cla_out_ch=5)
    p = mt.init(jax.random.PRNGKey(0), x)
    reg, logp = mt.apply(p, x)
    assert reg.shape == (4, 1) and logp.shape == (4, 5)
    np.testing.assert_allclose(np.exp(np.asarray(logp)).sum(1), 1.0, rtol=1e-5)
    loss = multitask_loss(reg, logp, jnp.zeros((4, 1)),
                          jnp.zeros(4, dtype=jnp.int32))
    assert np.isfinite(float(loss))


def test_density_regressor_trains():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((256, 6)))
    y = jnp.asarray((x[:, :1] * 2.0 + 1.0))
    model = MLPDensityRegressor(hid_ch=64)
    params = model.init(jax.random.PRNGKey(0), x)
    opt = optax.adam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            mu, s = model.apply(p, x)
            return MLPDensityRegressor.loss(y, mu, s)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(grads, state)
        return optax.apply_updates(params, updates), state, loss

    losses = []
    for _ in range(60):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.5


def test_mc_dropout_predict_variance_positive():
    model = MCDropoutModel(hid_ch=32, num_samples=16)
    x = jnp.ones((5, 8))
    params = model.init(jax.random.PRNGKey(0), x, rng=jax.random.PRNGKey(1))
    mean, std = model.predict(params, x, jax.random.PRNGKey(2))
    assert mean.shape == (5,) and std.shape == (5,)
    assert np.all(np.asarray(std) > 0)  # dropout noise must show up


def test_deep_ensemble_mixture_stats():
    ens = DeepEnsemble(num_models=4, hid_ch=16)
    x = jnp.ones((6, 5))
    params = ens.init(jax.random.PRNGKey(0), x)
    mean, std = ens.predict(params, x)
    assert mean.shape == (6,) and std.shape == (6,)
    assert np.all(np.asarray(std) >= 0)
    loss = ens.loss(params, x, jnp.zeros((6, 1)))
    assert np.isfinite(float(loss))


def test_deep_ensemble_mixture_treats_sigma_as_variance():
    """Reference mixture: var = mean(sig_pos + mu^2) - mu_bar^2
    (`/root/reference/dnn/DeepEnsemble.py:92-93`) — sigma_pos is a
    VARIANCE and must not be squared again."""
    import jax
    import jax.numpy as jnp
    from nngp_tpu.models.baselines_flax import DeepEnsemble

    ens = DeepEnsemble(num_models=3, hid_ch=8)
    x = jnp.ones((4, 2))
    params = ens.init(jax.random.PRNGKey(0), x)
    mus, sigmas = ens.apply(params, x)
    mean, std = ens.predict(params, x)
    want_var = (np.mean(np.asarray(sigmas) + np.asarray(mus) ** 2, axis=0)
                - np.mean(np.asarray(mus), axis=0) ** 2)
    np.testing.assert_allclose(np.asarray(std) ** 2,
                               np.maximum(want_var, 0.0).ravel(),
                               rtol=1e-6, atol=1e-7)


def test_dkl_identical_train_test_points_match_under_shift():
    """Joint normalization: a test point equal to a training point must get
    the same embedding even when the test batch spans a different range."""
    import jax.numpy as jnp
    from nngp_tpu.models import dkl

    rng = np.random.default_rng(0)
    x_tr = rng.uniform(-1, 1, (30, 4)).astype(np.float32)
    y_tr = x_tr.sum(axis=1, keepdims=True).astype(np.float32)
    params = dkl.train_dkl(x_tr, y_tr, epochs=3, verbose=None)
    # narrow test batch containing an exact training point
    x_te = np.vstack([x_tr[:1], x_tr[:1] + 1e-3]).astype(np.float32)
    mean, std = dkl.predict_dkl(params, jnp.asarray(x_tr),
                                jnp.asarray(y_tr), jnp.asarray(x_te))
    # posterior at the training point ~ its label (noise-limited), which
    # fails if train/test embeddings live in different coordinates
    assert abs(float(mean[0]) - float(y_tr[0, 0])) < 0.5
