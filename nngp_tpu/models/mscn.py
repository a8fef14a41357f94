"""MSCN-family set-convolution models (flax).

Parity surfaces from `/root/reference/baselines/layers.py`:
  SetConvolution  `:6-27`   per-element 2-layer MLP (ReLU after EVERY layer,
                            including the last) + mean/min pool over the set
  MSCN            `:74-83`  single-table: pred set conv -> MLP
  MSCNJoin        `:39-54`  binary join: concat pred sets -> set conv;
                            join set conv; concat -> MLP
  MSCNMultiJoin   `:56-71`  table/pred/join set convs -> MLP

The reference zero-pads variable-size sets (`baselines/dataset.py:40-69`) and
pools over the padded axis including the zero rows — kept for parity (a mask
argument is accepted for the corrected behavior; pass mask=None to match the
reference exactly).
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class SetConvolution(nn.Module):
    hid_ch: int
    out_ch: int
    num_layers: int = 2
    pool_type: str = "mean"

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        # x: (batch, set, feat); mask: (batch, set) True for real rows
        for i in range(self.num_layers):
            out = self.out_ch if i == self.num_layers - 1 else self.hid_ch
            x = nn.relu(nn.Dense(out)(x))
        if self.pool_type == "mean":
            if mask is None:
                return jnp.mean(x, axis=1)
            m = mask[..., None]
            return jnp.sum(x * m, axis=1) / jnp.maximum(
                jnp.sum(m, axis=1), 1.0)
        elif self.pool_type == "min":
            if mask is None:
                return jnp.min(x, axis=1)
            # Finite sentinel, not inf: an all-padding set would min to inf
            # and inf/NaN leaks into gradients through jnp.where (0 * inf).
            big = jnp.where(mask[..., None], x, jnp.asarray(1e30, x.dtype))
            pooled = jnp.min(big, axis=1)
            nonempty = jnp.any(mask, axis=1)[..., None]
            return jnp.where(nonempty, pooled, 0.0)
        raise ValueError(f"Unsupported pool type {self.pool_type!r}")


class _MLPHead(nn.Module):
    hid_ch: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hid_ch)(x))
        return nn.Dense(1)(x)


class MSCN(nn.Module):
    pred_hid_ch: int = 64
    pred_out_ch: int = 64
    mlp_hid_ch: int = 64

    @nn.compact
    def __call__(self, pred_x, pred_mask=None):
        x = SetConvolution(self.pred_hid_ch, self.pred_out_ch)(pred_x, pred_mask)
        return _MLPHead(self.mlp_hid_ch)(x)


class MSCNJoin(nn.Module):
    pred_hid_ch: int = 64
    pred_out_ch: int = 64
    join_hid_ch: int = 64
    join_out_ch: int = 64
    mlp_hid_ch: int = 64

    @nn.compact
    def __call__(self, left_pred_x, right_pred_x, join_x,
                 pred_mask=None, join_mask=None):
        pred_x = jnp.concatenate([left_pred_x, right_pred_x], axis=1)
        p = SetConvolution(self.pred_hid_ch, self.pred_out_ch)(pred_x, pred_mask)
        j = SetConvolution(self.join_hid_ch, self.join_out_ch)(join_x, join_mask)
        return _MLPHead(self.mlp_hid_ch)(jnp.concatenate([p, j], axis=1))


class MSCNMultiJoin(nn.Module):
    table_hid_ch: int = 64
    table_out_ch: int = 64
    pred_hid_ch: int = 64
    pred_out_ch: int = 64
    join_hid_ch: int = 64
    join_out_ch: int = 64
    mlp_hid_ch: int = 64

    @nn.compact
    def __call__(self, table_x, pred_x, join_x,
                 table_mask=None, pred_mask=None, join_mask=None):
        t = SetConvolution(self.table_hid_ch, self.table_out_ch)(table_x, table_mask)
        p = SetConvolution(self.pred_hid_ch, self.pred_out_ch)(pred_x, pred_mask)
        j = SetConvolution(self.join_hid_ch, self.join_out_ch)(join_x, join_mask)
        return _MLPHead(self.mlp_hid_ch)(jnp.concatenate([t, p, j], axis=1))
