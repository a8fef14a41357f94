"""Baseline training loops (optax) — the `dnn/train.py` surface.

Parity notes (`/root/reference/dnn/train.py`):
  - labels for the classification head are cardinality magnitude classes
    idx = ceil(log10(2^y)) capped at max_classes-1 (`:37-45`);
  - multi-task loss = MSE + coeff * NLL (`:232`);
  - uncertainty functions entropy/confident/margin/random/consist (`:60-82`);
  - Adam + exponential LR decay stepped every `decay_patience` epochs
    (`:277-279`, `:238-239`).

TPU-native: each epoch is a `lax.scan`-free loop of jitted minibatch steps on
device-resident data with a host-side permutation per epoch; the same jitted
step is reused across epochs (one compile).
"""

import math

import numpy as np

import jax
import jax.numpy as jnp
import optax

from nngp_tpu.models.baselines_flax import (
    DeepEnsemble,
    MCDropoutModel,
    MLPDensityRegressor,
    MultiTaskMLP,
)


def magnitude_class(y, max_classes: int = 10, label_base: float = 10.0):
    """idx = ceil(log_base(2^y)) capped (`/root/reference/dnn/train.py:37-45`).
    Vectorized over log2-card labels y."""
    y = np.asarray(y, dtype=np.float64).ravel()
    idx = np.ceil(y * np.log(2.0) / np.log(label_base))
    idx = np.clip(idx, None, max_classes - 1)
    return idx.astype(np.int32)


def compute_uncertainty(kind: str, log_probs, reg_output, rng=None):
    """Classification-head uncertainty (`/root/reference/dnn/train.py:60-82`)."""
    probs = np.exp(np.asarray(log_probs))
    reg = np.asarray(reg_output).ravel()
    if kind == "entropy":
        p = np.clip(probs, 1e-12, 1.0)
        return -np.sum(p * np.log(p), axis=-1)
    if kind == "confident":
        return 1.0 - np.max(probs, axis=-1)
    if kind == "margin":
        s = np.sort(probs, axis=-1)
        return s[:, -1] - s[:, -2]
    if kind == "random":
        rng = np.random.default_rng() if rng is None else rng
        return rng.random(reg.shape[0])
    if kind == "consist":
        reg_mag = np.ceil(np.log10(np.power(2.0, reg)))
        cla_mag = np.argmax(probs, axis=-1)
        return np.power(reg_mag - cla_mag, 2)
    raise ValueError(f"Unsupported uncertainty function {kind!r}")


def _optimizer(lr, weight_decay, decay_factor, decay_every_steps):
    sched = optax.exponential_decay(lr, transition_steps=decay_every_steps,
                                    decay_rate=decay_factor, staircase=True)
    # COUPLED L2 like torch's Adam(weight_decay=...) — wd*param is added to
    # the gradient BEFORE the Adam moment normalization
    # (`/root/reference/dnn/train.py:278-279`); optax.adamw would decay
    # AFTER (decoupled), a different optimizer from the reference's.
    return optax.chain(optax.add_decayed_weights(weight_decay),
                       optax.adam(sched))


def _epoch_perm(n, batch_size, rng):
    """Permutation padded (wrap-around) to a whole number of batches,
    reshaped to (num_batches, batch_size)."""
    perm = rng.permutation(n)
    nb = math.ceil(n / batch_size)
    pad = nb * batch_size - n
    if pad:
        perm = np.concatenate([perm, perm[:pad]])
    return perm.reshape(nb, batch_size)


def _fit(params, loss_fn, x, y_tuple, epochs, batch_size, lr, weight_decay,
         decay_factor, decay_patience, seed=0, verbose=None):
    """One device dispatch per epoch: lax.scan over the minibatches (host
    round-trips per minibatch are ruinous on a remote TPU)."""
    n = x.shape[0]
    steps_per_epoch = max(1, math.ceil(n / batch_size))
    opt = _optimizer(lr, weight_decay, decay_factor,
                     decay_patience * steps_per_epoch)
    state = opt.init(params)

    # Data is passed as arguments (NOT closed over): jit treats captured
    # arrays as compile-time constants, which re-compiles per dataset and
    # bakes the data into the executable.
    @jax.jit
    def epoch_fn(params, state, batch_idx, x, *y_arrays):
        def body(carry, idx):
            params, state = carry
            xb = jnp.take(x, idx, axis=0)
            yb = tuple(jnp.take(yy, idx, axis=0) for yy in y_arrays)
            loss, grads = jax.value_and_grad(loss_fn)(params, xb, *yb)
            updates, state = opt.update(grads, state, params)
            return (optax.apply_updates(params, updates), state), loss
        (params, state), losses = jax.lax.scan(body, (params, state),
                                               batch_idx)
        return params, state, jnp.sum(losses)

    rng = np.random.default_rng(seed)
    for epoch in range(epochs):
        batch_idx = jnp.asarray(_epoch_perm(n, batch_size, rng))
        params, state, total = epoch_fn(params, state, batch_idx, x, *y_tuple)
        if verbose:
            verbose(f"{epoch}-th Epochs: Train Loss={float(total):.4f}")
    return params


class StandardizedModel:
    """Input-standardizing wrapper around a baseline model: same
    `.apply(params, x, ...)` / `.predict(params, x, ...)` surface, with x
    mapped through the train-set (mean, std) first.

    The reference feeds RAW features into its torch MLPs
    (`/root/reference/dnn/train.py:129-163`) — [0,1000] range slots and
    2^chunk packed integers. At forest scale that degenerates the
    Gaussian-NLL heads: the variance head absorbs the error of a collapsed
    mean head (Density median q-error ~7e5, CPU and TPU alike; 4.05 once
    standardized — measured, BASELINE.md baselines table). Standardization
    is therefore the trainers' default; standardize=False restores the raw
    reference behavior."""

    def __init__(self, model, loc, scale):
        self.model = model
        self.loc = loc
        self.scale = scale

    def _scaled(self, x):
        return (jnp.asarray(x, jnp.float32) - self.loc) / self.scale

    def apply(self, params, x, **kw):
        return self.model.apply(params, self._scaled(x), **kw)

    def predict(self, params, x, *args, **kw):
        return self.model.predict(params, self._scaled(x), *args, **kw)


def _standardize(x, standardize):
    """(x_scaled, wrapper_fn): wrapper_fn wraps a model if standardizing."""
    if not standardize:
        return x, lambda model: model
    loc = jnp.mean(x, axis=0)
    scale = jnp.std(x, axis=0) + 1e-6
    return (x - loc) / scale, lambda model: StandardizedModel(model, loc,
                                                              scale)


def train_multitask(x_train, y_train, num_hid=256, max_classes=10,
                    epochs=40, batch_size=128, lr=1e-3, weight_decay=8e-5,
                    decay_factor=0.85, decay_patience=10, coeff=1.0,
                    seed=0, verbose=None, standardize=True):
    """MultiTaskMLP trainer (`/root/reference/dnn/train.py:211-244,274-281`).
    Returns (model, params)."""
    x = jnp.asarray(x_train, jnp.float32)
    y = jnp.asarray(y_train, jnp.float32)
    x, wrap = _standardize(x, standardize)
    labels = jnp.asarray(magnitude_class(y_train, max_classes))
    model = MultiTaskMLP(hid_ch=num_hid, cla_out_ch=max_classes)
    params = model.init(jax.random.PRNGKey(seed), x[:1])

    from nngp_tpu.models.baselines_flax import multitask_loss

    def loss_fn(p, xb, yb, lb):
        reg, log_probs = model.apply(p, xb)
        return multitask_loss(reg, log_probs, yb, lb, coeff=coeff)

    params = _fit(params, loss_fn, x, (y, labels), epochs, batch_size, lr,
                  weight_decay, decay_factor, decay_patience, seed, verbose)
    return wrap(model), params


def train_density(x_train, y_train, num_hid=256, epochs=40, batch_size=128,
                  lr=1e-3, weight_decay=8e-5, decay_factor=0.85,
                  decay_patience=10, seed=0, verbose=None, standardize=True):
    """Single MLPDensityRegressor with Gaussian NLL."""
    x = jnp.asarray(x_train, jnp.float32)
    y = jnp.asarray(y_train, jnp.float32)
    x, wrap = _standardize(x, standardize)
    model = MLPDensityRegressor(hid_ch=num_hid)
    params = model.init(jax.random.PRNGKey(seed), x[:1])

    def loss_fn(p, xb, yb):
        mu, s = model.apply(p, xb)
        return MLPDensityRegressor.loss(yb, mu, s)

    params = _fit(params, loss_fn, x, (y,), epochs, batch_size, lr,
                  weight_decay, decay_factor, decay_patience, seed, verbose)
    return wrap(model), params


def train_mc_dropout(x_train, y_train, num_hid=256, dropout=0.5,
                     num_samples=100, epochs=40, batch_size=128, lr=1e-3,
                     weight_decay=8e-5, decay_factor=0.85, decay_patience=10,
                     seed=0, verbose=None, standardize=True):
    """MCDropout trainer with plain MSE on the stochastic forward, as the
    reference trains it (`/root/reference/dnn/train.py:125-155` uses
    criterion=MSELoss despite the model's NLL loss being defined)."""
    x = jnp.asarray(x_train, jnp.float32)
    y = jnp.asarray(y_train, jnp.float32)
    x, wrap = _standardize(x, standardize)
    model = MCDropoutModel(hid_ch=num_hid, dropout=dropout,
                           num_samples=num_samples)
    key = jax.random.PRNGKey(seed)
    params = model.init(key, x[:1], rng=key)
    n = x.shape[0]
    steps_per_epoch = max(1, math.ceil(n / batch_size))
    opt = _optimizer(lr, weight_decay, decay_factor,
                     decay_patience * steps_per_epoch)
    state = opt.init(params)

    @jax.jit
    def epoch_fn(params, state, batch_idx, rngs, x, y):
        def body(carry, inputs):
            params, state = carry
            idx, rb = inputs
            xb = jnp.take(x, idx, axis=0)
            yb = jnp.take(y, idx, axis=0)

            def loss_fn(p):
                mu, _ = model.apply(p, xb, rng=rb)
                return jnp.mean((mu - yb) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, state = opt.update(grads, state, params)
            return (optax.apply_updates(params, updates), state), loss
        (params, state), losses = jax.lax.scan(body, (params, state),
                                               (batch_idx, rngs))
        return params, state, jnp.sum(losses)

    rng_np = np.random.default_rng(seed)
    for epoch in range(epochs):
        batch_idx = jnp.asarray(_epoch_perm(n, batch_size, rng_np))
        key, sub = jax.random.split(key)
        rngs = jax.random.split(sub, batch_idx.shape[0])
        params, state, total = epoch_fn(params, state, batch_idx, rngs, x, y)
        if verbose:
            verbose(f"{epoch}-th Epochs: Train Loss={float(total):.4f}")
    return wrap(model), params


def train_deep_ensemble(x_train, y_train, num_models=5, num_hid=256,
                        epochs=40, batch_size=128, lr=1e-3, weight_decay=8e-5,
                        decay_factor=0.85, decay_patience=10, seed=0,
                        verbose=None, standardize=True):
    """Deep ensemble: all members train in one vmapped program
    (`/root/reference/dnn/DeepEnsemble.py:28-63` trains them sequentially)."""
    x = jnp.asarray(x_train, jnp.float32)
    y = jnp.asarray(y_train, jnp.float32)
    x, wrap = _standardize(x, standardize)
    ens = DeepEnsemble(num_models=num_models, hid_ch=num_hid)
    params = ens.init(jax.random.PRNGKey(seed), x[:1])

    def loss_fn(p, xb, yb):
        return ens.loss(p, xb, yb)

    params = _fit(params, loss_fn, x, (y,), epochs, batch_size, lr,
                  weight_decay, decay_factor, decay_patience, seed, verbose)
    return wrap(ens), params


def train_mlp_regressor(x_train, y_train, num_hid=256, epochs=40,
                        batch_size=128, lr=1e-3, weight_decay=8e-5,
                        seed=0, verbose=None):
    """sklearn MLPRegressor wrapper (`/root/reference/dnn/train.py:299-319`),
    behind a StandardScaler pipeline (same rationale as StandardizedModel —
    the reference fits on raw features). Host-side; requires scikit-learn."""
    from sklearn import neural_network
    from sklearn.pipeline import make_pipeline
    from sklearn.preprocessing import StandardScaler
    reg = make_pipeline(StandardScaler(), neural_network.MLPRegressor(
        hidden_layer_sizes=num_hid, activation="relu", solver="adam",
        alpha=weight_decay, batch_size=batch_size, learning_rate="constant",
        learning_rate_init=lr, power_t=0.5, max_iter=epochs, shuffle=True,
        random_state=seed))
    reg.fit(np.asarray(x_train), np.asarray(y_train).ravel())
    return reg


def sklearn_gp_train_and_test(x_train, y_train, x_test):
    """sklearn exact-GP baseline (`/root/reference/dnn/train.py:428-445`)."""
    from sklearn.gaussian_process import GaussianProcessRegressor
    from sklearn.gaussian_process.kernels import RBF
    gp = GaussianProcessRegressor(kernel=RBF(), random_state=0)
    gp.fit(np.asarray(x_train), np.asarray(y_train).ravel())
    return gp.predict(np.asarray(x_test), return_std=True)


def krr_train_and_test(x_train, y_train, x_test, alpha=1.0):
    """Kernel-ridge baseline (`/root/reference/dnn/train.py:447-455`)."""
    from sklearn.kernel_ridge import KernelRidge
    clf = KernelRidge(alpha=alpha)
    clf.fit(np.asarray(x_train), np.asarray(y_train).ravel())
    return clf.predict(np.asarray(x_test))


def xgb_train_and_test(x_train, y_train, x_test, n_estimators=32, seed=123,
                       allow_sklearn_fallback=True):
    """Gradient-boosted-tree baseline (`/root/reference/dnn/train.py:323-345`:
    XGBRegressor with tree_method='hist', grow_policy='lossguide',
    n_estimators=32). xgboost is preferred when installed; in this image it
    is not, so by default the branch falls back to sklearn's
    HistGradientBoostingRegressor — the same algorithm family (histogram-
    binned leaf-wise GBT, squared-error objective) with the hyperparameters
    mapped (n_estimators -> max_iter boosting rounds, seed -> random_state;
    early stopping off to match XGB's fixed round count). Pass
    allow_sklearn_fallback=False to require real xgboost."""
    try:
        import xgboost as xgb
    except ImportError as e:
        if not allow_sklearn_fallback:
            raise RuntimeError(
                "xgboost is not installed in this environment; install it "
                "to run the XGB baseline, or use the sklearn "
                "HistGradientBoostingRegressor fallback "
                "(allow_sklearn_fallback=True)") from e
        from sklearn.ensemble import HistGradientBoostingRegressor
        reg = HistGradientBoostingRegressor(
            loss="squared_error", max_iter=n_estimators,
            early_stopping=False, random_state=seed)
        reg.fit(np.asarray(x_train), np.asarray(y_train).ravel())
        return reg.predict(np.asarray(x_test))
    reg = xgb.XGBRegressor(objective="reg:squarederror", tree_method="hist",
                           grow_policy="lossguide",
                           n_estimators=n_estimators, seed=seed)
    reg.fit(np.asarray(x_train), np.asarray(y_train).ravel())
    return reg.predict(np.asarray(x_test))
