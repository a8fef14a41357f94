"""Finite-width baseline models (flax) — the paper's DNN competitors.

Parity surfaces from `/root/reference/dnn/layers.py`:
  MLP                 `:15-23`   in -> hid -> relu -> out
  MultiTaskMLP        `:25-34`   shared trunk; regression head + log-softmax
                                 classification head over card-magnitude classes
  MLPDensityRegressor `:36-59`   mu head + softplus(sigma)+1e-6 head,
                                 Gaussian NLL loss
  MCDropoutModel      `:95-138`  always-on dropout; predictive mean/std from
                                 `num_samples` stochastic forwards
  DeepEnsemble        (`/root/reference/dnn/DeepEnsemble.py:18-151`)
                                 5x MLPDensityRegressor; mixture mean and
                                 std = sqrt(mean(sigma^2 + mu^2) - mu_bar^2)

TPU-native: MC-dropout samples and ensemble members run as a vmapped batch
dimension (one fused program) instead of the reference's Python loops of
forwards (`dnn/layers.py:127-138`, `dnn/DeepEnsemble.py:86-93`).
"""

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class MLP(nn.Module):
    hid_ch: int = 256
    out_ch: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hid_ch)(x))
        return nn.Dense(self.out_ch)(x)


class MultiTaskMLP(nn.Module):
    hid_ch: int = 256
    reg_out_ch: int = 1
    cla_out_ch: int = 10

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(self.hid_ch)(x))
        reg = nn.Dense(self.reg_out_ch)(h)
        cla = nn.log_softmax(nn.Dense(self.cla_out_ch)(h), axis=1)
        return reg, cla


def multitask_loss(reg, log_probs, y, classes, coeff: float = 1.0):
    """MSE + coeff * NLL (`/root/reference/dnn/train.py:211-244`)."""
    mse = jnp.mean((reg - y) ** 2)
    nll = -jnp.mean(jnp.take_along_axis(log_probs, classes[:, None], axis=1))
    return mse + coeff * nll


class MLPDensityRegressor(nn.Module):
    hid_ch: int = 256

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(self.hid_ch)(x))
        mu = nn.Dense(1)(h)
        sigma_pos = nn.softplus(nn.Dense(1)(h)) + 1e-6
        return mu, sigma_pos

    @staticmethod
    def loss(y, mu, sigma_pos):
        """Gaussian NLL (`dnn/layers.py:55-59`)."""
        return jnp.mean(0.5 * (jnp.log(sigma_pos) + (y - mu) ** 2 / sigma_pos))


class MCDropoutModel(nn.Module):
    hid_ch: int = 256
    out_ch: int = 1
    dropout: float = 0.5
    num_samples: int = 100

    @nn.compact
    def __call__(self, x, *, rng):
        h = nn.relu(nn.Dense(self.hid_ch)(x))
        # always-on dropout (`dnn/layers.py:113`)
        keep = jax.random.bernoulli(rng, 1.0 - self.dropout, h.shape)
        h = jnp.where(keep, h / (1.0 - self.dropout), 0.0)
        mu = nn.Dense(self.out_ch)(h)
        sigma = nn.Dense(self.out_ch)(h)  # unused in predict, kept for parity
        return mu, sigma

    @staticmethod
    def loss(mu, y, log_noise):
        sigma = jnp.exp(log_noise)
        return jnp.mean(jnp.log(sigma) + 0.5 * (mu - y) ** 2 / sigma ** 2)

    def predict(self, params, x, rng) -> Tuple[jax.Array, jax.Array]:
        """Predictive mean/std over vmapped stochastic forwards
        (replaces the 100-iteration loop at `dnn/layers.py:127-138`)."""
        rngs = jax.random.split(rng, self.num_samples)
        mus = jax.vmap(lambda r: self.apply(params, x, rng=r)[0])(rngs)
        mus = mus[..., 0]                    # (s, n)
        return jnp.mean(mus, axis=0), jnp.std(mus, axis=0)


class DeepEnsemble:
    """Ensemble of MLPDensityRegressors with vmapped members."""

    def __init__(self, num_models: int = 5, hid_ch: int = 256):
        self.num_models = num_models
        self.model = MLPDensityRegressor(hid_ch=hid_ch)

    def init(self, key, x):
        keys = jax.random.split(key, self.num_models)
        return jax.vmap(lambda k: self.model.init(k, x))(keys)

    def apply(self, params, x):
        """(mus, sigmas) stacked over members: (m, n, 1) each."""
        return jax.vmap(lambda p: self.model.apply(p, x))(params)

    def loss(self, params, x, y):
        mus, sigmas = self.apply(params, x)
        return jnp.mean(jax.vmap(
            lambda mu, s: MLPDensityRegressor.loss(y, mu, s))(mus, sigmas))

    def predict(self, params, x) -> Tuple[jax.Array, jax.Array]:
        """Mixture mean/std (`/root/reference/dnn/DeepEnsemble.py:92-93`).

        sigma_pos is a VARIANCE (the NLL is 0.5*(log s + (y-mu)^2/s)), so
        it enters the mixture moment un-squared — squaring it (a former
        bug) scaled every ensemble std by sqrt(sigma), corrupting the
        acquisition ranking."""
        mus, sigmas = self.apply(params, x)
        mu_bar = jnp.mean(mus, axis=0)
        var = jnp.mean(sigmas + mus ** 2, axis=0) - mu_bar ** 2
        return mu_bar[:, 0], jnp.sqrt(jnp.maximum(var, 0.0))[:, 0]
