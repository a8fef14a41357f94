"""TreeLSTM plan-tree models (flax).

Parity surfaces from `/root/reference/baselines/layers.py`:
  TreeLSTM          `:86-105`  binary-join variant: min-pooled pred set convs
                               averaged, join set conv, single LSTM step, MLP
  TreeLSTMMultiJoin `:109-149` recursive plan-chain variant: per node
                               op/meta linear+relu, min-pool pred set conv,
                               children hidden states averaged and
                               concatenated into the LSTM input, zero pad at
                               leaves; MLP head on the root hidden state.

The reference's nn.LSTM is applied to a length-1 sequence with zero initial
state — i.e. a single LSTMCell step — and the recursion threads children
states through the *input* concat, not the carry. Implemented here with an
explicit cell; evaluation over a plan chain uses `lax.scan` over levels
(the encoder builds left-deep chains, `encoder.py:287-302`), with the
growing per-level predicate sets padded to a fixed size — compile once per
padded shape instead of per tree.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from nngp_tpu.models.mscn import SetConvolution, _MLPHead


class _LSTMStep(nn.Module):
    """One LSTM step from zero state (torch nn.LSTM on a length-1 seq)."""
    hidden: int

    @nn.compact
    def __call__(self, x):
        # x: (batch, feat)
        cell = nn.OptimizedLSTMCell(features=self.hidden)
        carry = cell.initialize_carry(jax.random.PRNGKey(0),
                                      (x.shape[0], x.shape[-1]))
        carry = jax.tree_util.tree_map(jnp.zeros_like, carry)
        _, h = cell(carry, x)
        return h


class TreeLSTMJoin(nn.Module):
    """Binary-join TreeLSTM (`baselines/layers.py:86-105`)."""
    pred_hid_ch: int = 64
    pred_out_ch: int = 64
    join_hid_ch: int = 64
    join_out_ch: int = 64
    mlp_hid_ch: int = 64

    @nn.compact
    def __call__(self, left_pred_x, right_pred_x, join_x,
                 left_mask=None, right_mask=None, join_mask=None):
        conv = SetConvolution(self.pred_hid_ch, self.pred_out_ch,
                              pool_type="min")
        left = conv(left_pred_x, left_mask)
        right = conv(right_pred_x, right_mask)
        pred = (left + right) / 2.0
        join = SetConvolution(self.join_hid_ch, self.join_out_ch)(join_x, join_mask)
        x = jnp.concatenate([pred, join], axis=1)
        h = _LSTMStep(self.mlp_hid_ch)(x)
        return _MLPHead(self.mlp_hid_ch)(h)


class TreeLSTMMultiJoin(nn.Module):
    """Plan-chain TreeLSTM (`baselines/layers.py:109-149`), evaluated as a
    scan over chain levels.

    Inputs (batch-padded chains of length L+1 leaves / L internal levels):
      leaf_pred_x   (B, L+1, P, F)  per-leaf predicate sets (padded)
      leaf_op_x     (B, L+1, OP)    leaf (table-scan) operator one-hots
      leaf_meta_x   (B, L+1, M)
      node_pred_x   (B, L, P2, F)   per-internal-node stacked pred sets
      node_op_x     (B, L, OP)
      node_meta_x   (B, L, M)
      node_valid    (B, L) bool     False for padding levels (short chains)
    """
    op_out_ch: int = 32
    meta_out_ch: int = 32
    pred_hid_ch: int = 64
    pred_out_ch: int = 64
    lstm_hid_ch: int = 64
    mlp_hid_ch: int = 64

    def setup(self):
        self.op_nn = nn.Dense(self.op_out_ch)
        self.meta_nn = nn.Dense(self.meta_out_ch)
        self.pred_conv = SetConvolution(self.pred_hid_ch, self.pred_out_ch,
                                        pool_type="min")
        self.cell = nn.OptimizedLSTMCell(features=self.lstm_hid_ch)
        self.head = _MLPHead(self.mlp_hid_ch)

    def _node_features(self, op_x, meta_x, pred_x, pred_mask):
        op = nn.relu(self.op_nn(op_x))
        meta = nn.relu(self.meta_nn(meta_x))
        pred = self.pred_conv(pred_x, pred_mask)
        return jnp.concatenate([op, meta, pred], axis=-1)

    def _step(self, child_h, feats):
        """One LSTM step from zero state: input = [child_h | feats]."""
        x = jnp.concatenate([child_h, feats], axis=-1)
        carry = jax.tree_util.tree_map(
            jnp.zeros_like,
            self.cell.initialize_carry(jax.random.PRNGKey(0),
                                       (x.shape[0], x.shape[-1])))
        _, h = self.cell(carry, x)
        return h

    def __call__(self, leaf_pred_x, leaf_op_x, leaf_meta_x,
                 node_pred_x, node_op_x, node_meta_x, node_valid,
                 leaf_pred_mask=None, node_pred_mask=None):
        b, n_leaves = leaf_op_x.shape[:2]
        n_levels = node_op_x.shape[1]
        zeros_h = jnp.zeros((b, self.lstm_hid_ch))

        # All leaf hidden states: h_leaf = LSTM([0 | feats])
        def leaf_h(i):
            mask = leaf_pred_mask[:, i] if leaf_pred_mask is not None else None
            feats = self._node_features(leaf_op_x[:, i], leaf_meta_x[:, i],
                                        leaf_pred_x[:, i], mask)
            return self._step(zeros_h, feats)

        leaf_hs = jnp.stack([leaf_h(i) for i in range(n_leaves)], axis=1)

        # Chain scan: root_0 = leaf 0; level l combines (leaf_{l+1}, root_{l-1}).
        h = leaf_hs[:, 0]
        for l in range(n_levels):
            mask = node_pred_mask[:, l] if node_pred_mask is not None else None
            feats = self._node_features(node_op_x[:, l], node_meta_x[:, l],
                                        node_pred_x[:, l], mask)
            child = (leaf_hs[:, l + 1] + h) / 2.0
            new_h = self._step(child, feats)
            valid = node_valid[:, l][:, None]
            h = jnp.where(valid, new_h, h)
        return self.head(h)
