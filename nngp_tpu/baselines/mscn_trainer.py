"""MSCN / TreeLSTM training (the `baselines/train.py` and
`baselines/train_multijoin.py` surface).

Parity notes:
  - MSE loss on log2 cards, Adam, minibatch loop
    (`/root/reference/baselines/train.py:41-66`, `train_multijoin.py:41-66`);
  - the reference trains TreeLSTM per-sample with batch-accumulated grads
    (`train_multijoin.py:92-122`); here plan chains are padded to the max
    chain length and the batched scan model trains like any other batch —
    same math, one compiled program.

Set batches are zero-padded; MSCN pooling includes the padding rows, for
reference parity (`/root/reference/baselines/layers.py:17-27` pools over the
padded axis). The TreeLSTM trainer passes masks (its min-pool would otherwise
be poisoned by all-padding sets).
"""

from typing import Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from nngp_tpu.models.mscn import MSCN, MSCNJoin, MSCNMultiJoin
from nngp_tpu.models.tree_lstm import TreeLSTMMultiJoin


def _train_loop(model, params, inputs, y, epochs, batch_size, lr,
                weight_decay, seed=0, verbose=None):
    """Generic MSE loop over tuple-of-arrays inputs, one scan per epoch."""
    n = y.shape[0]
    opt = optax.adamw(lr, weight_decay=weight_decay)
    state = opt.init(params)
    args_all = tuple(jnp.asarray(a, jnp.float32) if a.dtype != bool else
                     jnp.asarray(a) for a in inputs)
    y = jnp.asarray(y, jnp.float32)

    @jax.jit
    def epoch_fn(params, state, batch_idx, y, *args_all):
        def body(carry, idx):
            params, state = carry
            batch = tuple(jnp.take(a, idx, axis=0) for a in args_all)
            yb = jnp.take(y, idx, axis=0)

            def loss_fn(p):
                out = model.apply(p, *batch)
                return jnp.mean((out - yb) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, state = opt.update(grads, state, params)
            return (optax.apply_updates(params, updates), state), loss
        (params, state), losses = jax.lax.scan(body, (params, state),
                                               batch_idx)
        return params, state, jnp.sum(losses)

    from nngp_tpu.baselines.trainer import _epoch_perm
    rng = np.random.default_rng(seed)
    for epoch in range(epochs):
        params, state, total = epoch_fn(
            params, state, jnp.asarray(_epoch_perm(n, batch_size, rng)),
            y, *args_all)
        if verbose:
            verbose(f"{epoch}-th Epochs: Train MSE Loss={float(total):.4f}")
    return params


def train_mscn_single(pred_x, y, epochs=40, batch_size=128, lr=1e-3,
                      weight_decay=8e-5, seed=0, verbose=None, **model_kw):
    model = MSCN(**model_kw)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.asarray(pred_x[:1], jnp.float32))
    params = _train_loop(model, params, (pred_x,), y, epochs, batch_size,
                         lr, weight_decay, seed, verbose)
    return model, params


def train_mscn_join(left_x, right_x, join_x, y, epochs=40, batch_size=128,
                    lr=1e-3, weight_decay=8e-5, seed=0, verbose=None,
                    **model_kw):
    model = MSCNJoin(**model_kw)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.asarray(left_x[:1], jnp.float32),
                        jnp.asarray(right_x[:1], jnp.float32),
                        jnp.asarray(join_x[:1], jnp.float32))
    params = _train_loop(model, params, (left_x, right_x, join_x), y,
                         epochs, batch_size, lr, weight_decay, seed, verbose)
    return model, params


def train_mscn_multi(table_x, pred_x, join_x, y, epochs=40, batch_size=128,
                     lr=1e-3, weight_decay=8e-5, seed=0, verbose=None,
                     **model_kw):
    model = MSCNMultiJoin(**model_kw)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.asarray(table_x[:1], jnp.float32),
                        jnp.asarray(pred_x[:1], jnp.float32),
                        jnp.asarray(join_x[:1], jnp.float32))
    params = _train_loop(model, params, (table_x, pred_x, join_x), y,
                         epochs, batch_size, lr, weight_decay, seed, verbose)
    return model, params


# ---------------------------------------------------------------- TreeLSTM
def plans_to_arrays(roots: Sequence) -> Tuple:
    """Flatten PlanNode chains into padded batch arrays for
    TreeLSTMMultiJoin: (leaf_pred, leaf_op, leaf_meta, node_pred, node_op,
    node_meta, node_valid, leaf_pred_mask, node_pred_mask)."""
    all_leaves, all_nodes = [], []
    for root in roots:
        nodes, leaves = [], []
        node = root
        while node.level > 0:
            nodes.append(node)
            leaves.append(node.children[0])
            node = node.children[1]
        leaves.append(node)
        all_leaves.append(leaves[::-1])
        all_nodes.append(nodes[::-1])

    b = len(roots)
    max_leaves = max(len(l) for l in all_leaves)
    max_nodes = max((len(n) for n in all_nodes), default=0)
    max_nodes = max(max_nodes, 1)

    def feat_dims():
        l0 = all_leaves[0][0]
        return (l0.pred_features.shape[1], l0.op_features.shape[0],
                l0.meta_features.shape[0])

    pf, opf, mf = feat_dims()
    max_leaf_preds = max(l.pred_features.shape[0]
                         for ls in all_leaves for l in ls)
    max_node_preds = max((n.pred_features.shape[0]
                          for ns in all_nodes for n in ns), default=1)

    leaf_pred = np.zeros((b, max_leaves, max_leaf_preds, pf))
    leaf_pred_mask = np.zeros((b, max_leaves, max_leaf_preds), bool)
    leaf_op = np.zeros((b, max_leaves, opf))
    leaf_meta = np.zeros((b, max_leaves, mf))
    node_pred = np.zeros((b, max_nodes, max_node_preds, pf))
    node_pred_mask = np.zeros((b, max_nodes, max_node_preds), bool)
    node_op = np.zeros((b, max_nodes, opf))
    node_meta = np.zeros((b, max_nodes, mf))
    node_valid = np.zeros((b, max_nodes), bool)

    for i, (leaves, nodes) in enumerate(zip(all_leaves, all_nodes)):
        for j, l in enumerate(leaves):
            r = l.pred_features.shape[0]
            leaf_pred[i, j, :r] = l.pred_features
            leaf_pred_mask[i, j, :r] = True
            leaf_op[i, j] = l.op_features
            leaf_meta[i, j] = l.meta_features
        for j, nd in enumerate(nodes):
            r = nd.pred_features.shape[0]
            node_pred[i, j, :r] = nd.pred_features
            node_pred_mask[i, j, :r] = True
            node_op[i, j] = nd.op_features
            node_meta[i, j] = nd.meta_features
            node_valid[i, j] = True
    return (leaf_pred, leaf_op, leaf_meta, node_pred, node_op, node_meta,
            node_valid, leaf_pred_mask, node_pred_mask)


def train_tree_lstm(roots: Sequence, y, epochs=40, batch_size=64, lr=1e-3,
                    weight_decay=8e-5, seed=0, verbose=None, **model_kw):
    arrays = plans_to_arrays(roots)
    model = TreeLSTMMultiJoin(**model_kw)
    first = tuple(jnp.asarray(a[:1]) for a in arrays)
    params = model.init(jax.random.PRNGKey(seed), *first)
    params = _train_loop(model, params, arrays, y, epochs, batch_size, lr,
                         weight_decay, seed, verbose)
    return model, params, arrays
