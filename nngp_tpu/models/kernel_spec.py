"""Infinite-width network kernel specs (replaces neural-tangents stax).

The reference defines its model as ``stax.serial(stax.Dense(512),
stax.Relu(), stax.Dense(1))`` (`/root/reference/train.py:161-164`,
`/root/reference/active/active_train.py:40-43`,
`/root/reference/neuroestimator/estimator/estimator.py:27-30`) and asks
neural-tangents for its NNGP or NTK kernel. Here the same architecture
grammar is a list of layer dataclasses and the kernel is evaluated by a
closed-form recursion over (cross covariance, diag covariances):

    K0   = x1 @ x2.T / d            (NTK parameterization)
    Dense(w_std, b_std):  nngp' = w^2 nngp + b^2 ;  ntk' = w^2 ntk + nngp'
    Nonlinearity phi:     ntk'  = ntk * Tdot(nngp) ;  nngp' = T(nngp)

Layer widths only matter for finite-width sampling (`init_apply`), exactly as
in the reference where Dense(512)'s width never enters the kernel. Everything
is jit-friendly: static layer structure, purely elementwise maps fused by XLA
around one MXU matmul.
"""

import dataclasses
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from nngp_tpu.ops.dual_activations import DUALS
from nngp_tpu.ops.gram import input_diag, input_gram


@dataclasses.dataclass(frozen=True)
class Dense:
    width: int = 512
    w_std: float = 1.0
    b_std: float = 0.0  # neural-tangents Dense(..., b_std=None) == no bias == 0


@dataclasses.dataclass(frozen=True)
class Activation:
    name: str

    def __post_init__(self):
        if self.name not in DUALS:
            raise ValueError(f"Unknown activation {self.name!r}; have {list(DUALS)}")


def Relu() -> Activation:
    return Activation("relu")


def Erf() -> Activation:
    return Activation("erf")


Layer = object  # Dense | Activation


def mlp(depth: int = 1, width: int = 512, activation: str = "relu",
        w_std: float = 1.0, b_std: float = 0.0) -> Tuple[Layer, ...]:
    """`depth` hidden layers: Dense,Act,...,Dense(1). depth=1 reproduces the
    reference architecture."""
    layers = []
    for _ in range(depth):
        layers += [Dense(width, w_std, b_std), Activation(activation)]
    layers.append(Dense(1, w_std, b_std))
    return tuple(layers)


def _validate(layers: Sequence[Layer]):
    if not layers or not isinstance(layers[0], Dense):
        raise ValueError("Kernel spec must start with a Dense layer")
    for l in layers:
        if not isinstance(l, (Dense, Activation)):
            raise TypeError(f"Unknown layer {l!r}")


def apply_recursion(k, ntk, d1, d2, layers: Sequence[Layer], duals=None):
    """Run the dual recursion on a cross block.

    k:   (m, n) input covariance block  x1 @ x2.T / d
    ntk: (m, n) running NTK (zeros at input)
    d1:  (m, 1) input diag covariances of x1 rows
    d2:  (1, n) input diag covariances of x2 rows

    Pure elementwise given k — reused inside the Pallas Gram kernel.
    `duals` selects the activation-dual registry (default: precise DUALS;
    the Pallas kernel passes DUALS_FAST). Returns (nngp, ntk) for the block.
    """
    if duals is None:
        duals = DUALS
    for layer in layers:
        if isinstance(layer, Dense):
            w2 = layer.w_std ** 2
            b2 = layer.b_std ** 2
            k = w2 * k + b2
            ntk = w2 * ntk + k
            d1 = w2 * d1 + b2
            d2 = w2 * d2 + b2
        else:
            t, tdot, tdiag = duals[layer.name]
            ntk = ntk * tdot(k, d1, d2)
            k = t(k, d1, d2)
            d1 = tdiag(d1)
            d2 = tdiag(d2)
    return k, ntk


# Activations whose dual maps are positively 1-homogeneous in the input
# covariance (T(c*K) = c*T(K), Tdot(c*K) = Tdot(K) for c > 0): scaling every
# input by s scales the NNGP *and* NTK Grams by exactly s^2 when the stack
# also has no bias terms. erf/sin saturate and are NOT homogeneous.
_HOMOGENEOUS_ACTS = frozenset({"relu", "abs"})


def is_scale_equivariant(layers: Sequence[Layer]) -> bool:
    """True iff kernel(s*x1, s*x2) == s^2 * kernel(x1, x2) exactly, for both
    gets — the condition under which an input prescale can be compensated
    bit-safely (see `gp.posterior` input_scale). Requires every Dense to be
    bias-free and every activation dual to be 1-homogeneous."""
    for layer in layers:
        if isinstance(layer, Dense):
            if layer.b_std != 0.0:
                return False
        elif isinstance(layer, Activation):
            if layer.name not in _HOMOGENEOUS_ACTS:
                return False
    return True


def apply_diag_recursion(d, layers: Sequence[Layer]):
    """Propagate only diagonal covariances (for K_** diag / test variance).

    Uses the exact on-diagonal duals (DUALS_NTK_DIAG / tdiag) — the generic
    Tdot(k; k, k) evaluates acos at rho = 1 +- rounding, where its sqrt(eps)
    sensitivity injects ~1e-4 relative noise into fp32 NTK diagonals."""
    from nngp_tpu.ops.dual_activations import DUALS_NTK_DIAG

    nngp = d
    ntk = jnp.zeros_like(d)
    for layer in layers:
        if isinstance(layer, Dense):
            nngp = layer.w_std ** 2 * nngp + layer.b_std ** 2
            ntk = layer.w_std ** 2 * ntk + nngp
        else:
            _, _, tdiag = DUALS[layer.name]
            ntk = ntk * DUALS_NTK_DIAG[layer.name](nngp)
            nngp = tdiag(nngp)
    return nngp, ntk


def substitute_dense_params(layers, params):
    """Rebuild `layers` with each Dense's (w_std, b_std) replaced
    positionally from params = {"w_stds": (n_dense,), "b_stds": (n_dense,)}.

    The values may be TRACED scalars — this is the seam that lets kernel
    hyperparameters ride through jit as OPERANDS while the layer STRUCTURE
    stays a static program constant, so a hyperparameter-relearn loop
    reuses one compiled fit/predict program instead of recompiling per
    new constants (`gp.posterior fit_gp(spec_params=...)`). The returned
    Dense objects must never be hashed (tracers); params=None returns
    `layers` unchanged."""
    if params is None:
        return tuple(layers)
    out, j = [], 0
    for layer in layers:
        if isinstance(layer, Dense):
            out.append(Dense(layer.width, params["w_stds"][j],
                             params["b_stds"][j]))
            j += 1
        else:
            out.append(layer)
    return tuple(out)


def kernel_eval(layers, x1, x2=None, get="nngp"):
    """`KernelSpec.kernel_fn` as a free function over a (possibly traced-
    valued) layer tuple — call from inside an already-jitted caller."""
    if x2 is None:
        x2 = x1
    k0 = input_gram(x1, x2)
    d1 = input_diag(x1)[:, None]
    d2 = input_diag(x2)[None, :]
    nngp, ntk = apply_recursion(k0, jnp.zeros_like(k0), d1, d2, layers)
    return KernelSpec._select(nngp, ntk, get)


def diag_eval(layers, x, get="nngp"):
    """`KernelSpec.diag_fn` as a free function (traced-layer friendly)."""
    nngp, ntk = apply_diag_recursion(input_diag(x), layers)
    return KernelSpec._select(nngp, ntk, get)


def self_kernel_eval(layers, x, get="nngp"):
    """`KernelSpec.self_kernel` as a free function (traced-layer
    friendly): kernel_eval with the exact on-diagonal recursion scattered
    onto the diagonal (see KernelSpec.self_kernel for why)."""
    k = kernel_eval(layers, x, x, get)
    i = jnp.arange(x.shape[0])
    return k.at[i, i].set(diag_eval(layers, x, get))


class KernelSpec:
    """kernel_fn over a serial layer stack. get in {'nngp','ntk'} or a tuple.

    Hash/eq are structural (by layer tuple) so jit caches persist across
    KernelSpec instances with the same architecture.
    """

    def __init__(self, layers: Sequence[Layer]):
        _validate(layers)
        self.layers = tuple(layers)

    def __hash__(self):
        return hash(self.layers)

    def __eq__(self, other):
        return isinstance(other, KernelSpec) and self.layers == other.layers

    def __call__(self, x1, x2=None, get="nngp"):
        return self.kernel_fn(x1, x2, get)

    @partial(jax.jit, static_argnums=(0, 3))
    def kernel_fn(self, x1, x2=None, get="nngp"):
        """Dense Gram matrix of shape (n1, n2) for the requested kernel(s)."""
        if x2 is None:
            x2 = x1
        k0 = input_gram(x1, x2)
        d1 = input_diag(x1)[:, None]
        d2 = input_diag(x2)[None, :]
        ntk0 = jnp.zeros_like(k0)
        nngp, ntk = apply_recursion(k0, ntk0, d1, d2, self.layers)
        return self._select(nngp, ntk, get)

    @partial(jax.jit, static_argnums=(0, 2))
    def diag_fn(self, x, get="nngp"):
        """Diagonal entries kernel(x_i, x_i), shape (n,)."""
        nngp, ntk = apply_diag_recursion(input_diag(x), self.layers)
        return self._select(nngp, ntk, get)

    def self_kernel(self, x, get="nngp"):
        """kernel_fn(x, x) with the diagonal overwritten by the exact
        on-diagonal recursion: the generic dual carries acos(rho=1)
        sqrt(eps) noise exactly on the diagonal (~3e-4 relative in fp32),
        which matters to consumers that COMPARE posterior variances built
        from this prior (greedy acquisition argmaxes diag(k_ss) minus an
        explained term that can be 1e-3 of k_ss)."""
        k = self.kernel_fn(x, x, get)
        i = jnp.arange(x.shape[0])
        return k.at[i, i].set(self.diag_fn(x, get))

    @staticmethod
    def _select(nngp, ntk, get):
        if isinstance(get, (tuple, list)):
            out = {"nngp": nngp, "ntk": ntk}
            return tuple(out[g] for g in get)
        if get == "nngp":
            return nngp
        if get == "ntk":
            return ntk
        raise ValueError(f"get must be 'nngp' or 'ntk', got {get!r}")

    # ---- finite width sampling (parity check of conventions; the reference's
    # init_fn/apply_fn pair from stax.serial, unused at inference) ----
    def init_apply(self):
        layers = self.layers

        def init(key, input_dim):
            params = []
            d = input_dim
            for layer in layers:
                if isinstance(layer, Dense):
                    key, kw, kb = jax.random.split(key, 3)
                    w = jax.random.normal(kw, (d, layer.width)) * layer.w_std
                    b = jax.random.normal(kb, (layer.width,)) * layer.b_std
                    params.append((w, b, d))
                    d = layer.width
            return params

        acts = {"relu": jax.nn.relu, "erf": jax.lax.erf,
                "sin": jnp.sin, "abs": jnp.abs}

        def apply(params, x):
            h = x
            it = iter(params)
            for layer in layers:
                if isinstance(layer, Dense):
                    w, b, fan_in = next(it)
                    h = h @ w / jnp.sqrt(fan_in) + b
                else:
                    h = acts[layer.name](h)
            return h

        return init, apply


def reference_kernel(width: int = 512) -> KernelSpec:
    """The paper's architecture: Dense(width) -> Relu -> Dense(1)
    (`/root/reference/train.py:161-164`)."""
    return KernelSpec((Dense(width), Relu(), Dense(1)))
