"""Gradient-based kernel hyperparameter learning by exact marginal likelihood.

The reference only learns hyperparameters for its hand-rolled RBF baseline
(10 RMSProp steps on the MLL, `/root/reference/train.py:117-136`); its NNGP
kernel is pinned at stax defaults (w_std=1, b_std=0) with a hard-coded
diag_reg=1e-3 (`/root/reference/train.py:161-171`). This module closes that
gap for the NNGP/NTK tier itself: the dual-activation recursion is
closed-form and differentiable, so the continuous kernel hyperparameters

    w0    first-Dense weight std   — a LEARNED input scale (K0 = x x^T/d
          enters the stack only through w0^2 K0 + b^2)
    w     weight std of the remaining Dense layers
    b     bias std of every Dense layer (kernel geometry: rho offsets)
    reg   relative ridge (observation-noise-to-signal ratio)

can be trained by maximizing the exact GP log evidence with jax autodiff —
TPU-first: the WHOLE optimization (Gram rebuild + Cholesky + grad + Adam
step, `steps` times) is one jitted `lax.scan`, i.e. ONE tunnel dispatch,
with the O(n^3) per-step factorization on the MXU.

Differentiability care (the one real hazard): the ReLU/erf duals evaluate
arccos/arcsin at rho = +-1 on the Gram DIAGONAL and for duplicate rows,
where d(acos)/d(rho) = -inf. Two measures make the loss smooth:
  * a grad-safe dual registry clamps rho strictly inside (-1, 1)
    (forward error ~eps^1.5, far below the fp rounding of the Gram);
  * the diagonal is then REPLACED by `apply_diag_recursion`, which is
    algebraically exact and smooth in (w, b) — so the clamp never biases
    the trace and the backward pass never sees the acos singularity.

Parity anchor: with all hyperparameters pinned at the reference defaults
the loss equals `GPPosterior.log_marginal_likelihood` (tests).
"""

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nngp_tpu.models.kernel_spec import (Activation, Dense, KernelSpec,
                                         apply_diag_recursion,
                                         apply_recursion)
from nngp_tpu.ops.gram import input_diag, input_gram
from nngp_tpu.ops.math import acos_auto as _arccos, asin_auto as _arcsin

_PI = 3.141592653589793
_INV_2PI = 0.15915494309189535


def _grad_safe_duals(eps):
    """Dual-activation registry with rho clamped strictly inside (-1, 1):
    identical to `ops.dual_activations.DUALS` up to O(eps^1.5) forward error
    but with finite gradients everywhere (acos'(rho) ~ 1/sqrt(1-rho^2))."""
    hi = 1.0 - eps

    def relu_nngp_s(k12, k11, k22):
        kk = jnp.maximum(k11 * k22, 1e-36)
        inv = jax.lax.rsqrt(kk)
        cos_t = jnp.clip(k12 * inv, -hi, hi)
        theta = _arccos(cos_t)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, eps * eps))
        return (kk * inv) * (sin_t + (_PI - theta) * cos_t) * _INV_2PI

    def relu_ntk_mult_s(k12, k11, k22):
        cos_t = jnp.clip(k12 * jax.lax.rsqrt(jnp.maximum(k11 * k22, 1e-36)),
                         -hi, hi)
        return (_PI - _arccos(cos_t)) * _INV_2PI

    def relu_diag(k):
        return 0.5 * k

    def erf_nngp_s(k12, k11, k22):
        inv = jax.lax.rsqrt((1.0 + 2.0 * k11) * (1.0 + 2.0 * k22))
        ratio = jnp.clip(2.0 * k12 * inv, -hi, hi)
        return (2.0 / _PI) * _arcsin(ratio)

    def erf_ntk_mult_s(k12, k11, k22):
        denom_sq = (1.0 + 2.0 * k11) * (1.0 + 2.0 * k22) - 4.0 * k12 * k12
        return (4.0 / _PI) * jax.lax.rsqrt(jnp.maximum(denom_sq, eps))

    def erf_diag_s(k):
        return (2.0 / _PI) * _arcsin(2.0 * k / (1.0 + 2.0 * k))

    def abs_nngp_s(k12, k11, k22):
        return 2.0 * (relu_nngp_s(k12, k11, k22)
                      + relu_nngp_s(-k12, k11, k22))

    def abs_ntk_mult_s(k12, k11, k22):
        return 2.0 * (relu_ntk_mult_s(k12, k11, k22)
                      - relu_ntk_mult_s(-k12, k11, k22))

    from nngp_tpu.ops.dual_activations import (sin_diag, sin_nngp,
                                               sin_ntk_mult)
    return {
        "relu": (relu_nngp_s, relu_ntk_mult_s, relu_diag),
        "erf": (erf_nngp_s, erf_ntk_mult_s, erf_diag_s),
        "sin": (sin_nngp, sin_ntk_mult, sin_diag),   # smooth everywhere
        "abs": (abs_nngp_s, abs_ntk_mult_s, lambda k: k),
    }


def _build_layers(depth, activation, width, w0, w, b):
    """The `mlp` stack with traced (w0, w, b): first Dense carries w0 (the
    learned input scale), later Dense layers share w, all share b."""
    layers = [Dense(width, w0, b), Activation(activation)]
    for _ in range(depth - 1):
        layers += [Dense(width, w, b), Activation(activation)]
    layers.append(Dense(1, w, b))
    return tuple(layers)


def _nll_from_moments(k0, d1, y, layers, get, duals, reg_rel):
    """Exact negative log evidence of N(0, K + reg*mean(diag)*I) given the
    input moments and a (traced-hyperparameter) layer stack."""
    n = k0.shape[0]
    nngp, ntk = apply_recursion(k0, jnp.zeros_like(k0), d1[:, None],
                                d1[None, :], layers, duals=duals)
    k = ntk if get == "ntk" else nngp
    dn, dt = apply_diag_recursion(d1, layers)
    dvec = dt if get == "ntk" else dn
    # exact smooth diagonal (kills the acos-at-rho=1 singularity and the
    # clamp bias in one move)
    idx = jnp.arange(n)
    k = k.at[idx, idx].set(dvec)
    reg = reg_rel * jnp.mean(dvec)
    ell = jnp.linalg.cholesky(k + reg * jnp.eye(n, dtype=k.dtype))
    alpha = jax.scipy.linalg.cho_solve((ell, True), y)
    quad = jnp.sum(y * alpha)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(ell)))
    return 0.5 * (quad + logdet + n * jnp.log(2.0 * jnp.pi))


def _nll(theta, k0, d1, y, depth, activation, width, get, duals):
    """Scalar-hyperparameter loss. Smooth in theta. Takes the
    theta-independent input moments (k0 = x x^T/d, d1 = its diagonal) so
    the n^2 d input matmul is paid once per optimization, not per step."""
    w0, w, b, reg_rel = (jnp.exp(theta["log_w0"]), jnp.exp(theta["log_w"]),
                         jnp.exp(theta["log_b"]), jnp.exp(theta["log_reg"]))
    layers = _build_layers(depth, activation, width, w0, w, b)
    return _nll_from_moments(k0, d1, y, layers, get, duals, reg_rel)


def _nll_ard(theta, x, y, depth, activation, width, get, duals):
    """ARD loss: a learned per-feature input scale s (the first Dense sees
    x * s, so s subsumes the scalar w0 — k0 enters only through the scaled
    inputs). The n^2 d input matmul is s-dependent and re-runs per step —
    cheap at subsample sizes (2048^2 x d)."""
    s = jnp.exp(theta["log_s"])
    w, b, reg_rel = (jnp.exp(theta["log_w"]), jnp.exp(theta["log_b"]),
                     jnp.exp(theta["log_reg"]))
    xs = x * s[None, :]
    layers = _build_layers(depth, activation, width, 1.0, w, b)
    return _nll_from_moments(input_gram(xs, xs), input_diag(xs), y, layers,
                             get, duals, reg_rel)


def _nll_dtc(theta, x, y, m, depth, activation, width, get, duals,
             mask=None, mm_jitter_rel=None):
    """Exact negative log evidence of the DTC/Nystrom model the streaming
    tier actually serves (`gp/nystrom.py`): y ~ N(0, Q + r I) with
    Q = K_nm K_mm^-1 K_mn over the FIRST m rows as inducing points
    (`fit_kernel_hyperparams` permutes the rows once so the prefix is a
    uniform draw — matching `select_inducing`'s uniform default).

    Maximizing the exact-GP evidence tunes a different model than the DTC
    tier serves, and measurably loses there (BASELINE.md 90k Nystrom
    transferability row); this loss optimizes the served model itself.
    Cost per step O(n m^2 + m^3) vs the exact loss's O(n^3).

    mask: optional per-row 0/1 weights — rows with mask 0 contribute
    NOTHING (kernel rows, y, the ridge trace, and the n in the evidence
    all masked). This makes the loss row-shardable over a device mesh
    with inert padding: every term is a sum over rows except the m x m
    stage, so sharding x/y/mask row-wise lets XLA turn the moment
    contractions (psi psi^T, psi y, sum y^2, trace) into psums over ICI.

    Differentiability: same grad-safe duals; K_mm's diagonal is replaced
    by the exact smooth `apply_diag_recursion` values (rho=1), and the
    K_nm rows that coincide with inducing rows are handled by the clamp.
    Both Choleskys are jittered relative to the model's own scales; a
    blown-up iterate is rejected by optax.apply_if_finite upstream."""
    if "log_s" in theta:
        x = x * jnp.exp(theta["log_s"])[None, :]
        w0 = 1.0
    else:
        w0 = jnp.exp(theta["log_w0"])
    w, b, reg_rel = (jnp.exp(theta["log_w"]), jnp.exp(theta["log_b"]),
                     jnp.exp(theta["log_reg"]))
    layers = _build_layers(depth, activation, width, w0, w, b)
    if mask is None:
        n_eff = jnp.asarray(x.shape[0], x.dtype)
        ym = y
    else:
        n_eff = jnp.sum(mask)
        ym = y * mask[:, None]
    x_m = x[:m]
    d_all = input_diag(x)
    d_m = d_all[:m]
    dn, dt = apply_diag_recursion(d_all, layers)
    dvec = dt if get == "ntk" else dn
    tr = jnp.sum(dvec) if mask is None else jnp.sum(dvec * mask)
    r = reg_rel * tr / n_eff

    k0_mm = input_gram(x_m, x_m)
    nngp_mm, ntk_mm = apply_recursion(k0_mm, jnp.zeros_like(k0_mm),
                                      d_m[:, None], d_m[None, :], layers,
                                      duals=duals)
    k_mm = ntk_mm if get == "ntk" else nngp_mm
    idx = jnp.arange(m)
    k_mm = k_mm.at[idx, idx].set(dvec[:m])
    # fp32 needs a MUCH larger relative jitter than fp64: near-duplicate
    # rows (shared categorical chunk patterns on join workloads) make
    # kappa(K_mm) exceed 1/eps_fp32, and Cholesky breakdown scales like
    # m * eps * ||K|| — at m=512 that is ~6e-5 relative. Measured on
    # synth6_big chunk_norm (experiments log, /tmp/dtc_jitter sweep):
    # 1e-6 -> NaN factor, 1e-5 marginal, 1e-4 stable with fp32/fp64 loss
    # agreement within 0.2 nats at the same jitter. The jitter-induced
    # evidence shift is shared by every candidate theta, so the argmax is
    # preserved; fp64 keeps 1e-10 (the recorded CPU results' setting).
    if mm_jitter_rel is None:
        mm_jitter_rel = 1e-10 if x.dtype == jnp.float64 else 1e-4
    jitter = mm_jitter_rel * jnp.mean(dvec[:m])
    l_mm = jnp.linalg.cholesky(k_mm + jitter * jnp.eye(m, dtype=x.dtype))

    k0_nm = input_gram(x, x_m)
    nngp_nm, ntk_nm = apply_recursion(k0_nm, jnp.zeros_like(k0_nm),
                                      d_all[:, None], d_m[None, :], layers,
                                      duals=duals)
    k_nm = ntk_nm if get == "ntk" else nngp_nm
    if mask is not None:
        # padded rows get NONZERO kernel values whenever b > 0 (the bias
        # enters every layer) — mask AFTER the recursion, not before
        k_nm = k_nm * mask[:, None]
    psi = jax.scipy.linalg.solve_triangular(l_mm, k_nm.T, lower=True)
    c = psi @ psi.T
    b_m = psi @ ym
    l_c = jnp.linalg.cholesky(c + r * jnp.eye(m, dtype=x.dtype))
    t = jax.scipy.linalg.solve_triangular(l_c, b_m, lower=True)
    quad = (jnp.sum(ym * ym) - jnp.sum(t * t)) / r
    logdet = ((n_eff - m) * jnp.log(r)
              + 2.0 * jnp.sum(jnp.log(jnp.diagonal(l_c))))
    return 0.5 * (quad + logdet + n_eff * jnp.log(2.0 * jnp.pi))


@partial(jax.jit, static_argnames=("depth", "activation", "width", "get",
                                   "steps", "lr", "eps", "ard", "objective",
                                   "dtc_m"))
def _optimize(x, y, theta0s, depth, activation, width, get, steps, lr, eps,
              ard=False, objective="exact", dtc_m=0, mask=None,
              mm_jitter_rel=None):
    """ONE dispatch: `steps` Adam iterations of the exact-MLL loss via
    lax.scan, vmapped over a BATCH of restarts (leading axis of theta0s —
    the evidence is multimodal in the ridge: a small-reg init settles into
    an interpolating local optimum, measured in tests). Non-finite steps
    (a mid-trajectory Cholesky blow-up at an extreme candidate) are
    rejected by optax.apply_if_finite — that trajectory continues from its
    last good iterate."""
    duals = _grad_safe_duals(eps)
    # HIGHEST matmul precision throughout: on TPU the default 1-pass bf16
    # matmuls inside the per-step Cholesky/solves NaN at the [0,1000]
    # feature scale (same measured failure mode as the main fit and the
    # DKL trainer — CLAUDE.md MXU precision notes).
    with jax.default_matmul_precision("highest"):
        if objective == "dtc":
            # handles scalar AND ARD parameterizations via the theta keys
            loss = partial(_nll_dtc, x=x, y=y, m=dtc_m, depth=depth,
                           activation=activation, width=width, get=get,
                           duals=duals, mask=mask,
                           mm_jitter_rel=mm_jitter_rel)
        elif ard:
            loss = partial(_nll_ard, x=x, y=y, depth=depth,
                           activation=activation, width=width, get=get,
                           duals=duals)
        else:
            k0 = input_gram(x, x)
            d1 = input_diag(x)
            loss = partial(_nll, k0=k0, d1=d1, y=y, depth=depth,
                           activation=activation, width=width, get=get,
                           duals=duals)
        opt = optax.apply_if_finite(optax.adam(lr), max_consecutive_errors=8)

        def run_one(theta0):
            def step(carry, _):
                theta, state = carry
                val, grad = jax.value_and_grad(loss)(theta)
                updates, state = opt.update(grad, state, theta)
                theta = optax.apply_updates(theta, updates)
                return (theta, state), val

            (theta, _), hist = jax.lax.scan(step, (theta0, opt.init(theta0)),
                                            None, length=steps)
            return theta, hist, loss(theta)

        thetas, hists, finals = jax.vmap(run_one)(theta0s)
        best = jnp.nanargmin(jnp.where(jnp.isfinite(finals), finals,
                                       jnp.inf))
        return (jax.tree_util.tree_map(lambda a: a[best], thetas),
                hists[best], finals[best])


@dataclasses.dataclass(frozen=True)
class HyperoptResult:
    """Learned kernel hyperparameters + the spec/ridge to fit with."""

    spec: KernelSpec                 # mlp stack with the learned (w0, w, b)
    diag_reg: float                  # learned RELATIVE ridge
    log_evidence: float              # exact MLL at the optimum (subsample)
    nll_history: np.ndarray          # per-step loss trajectory
    w0: float
    w: float
    b: float
    num_points: int                  # subsample size the MLL was scored on
    depth: int = 1
    activation: str = "relu"
    # ARD mode: learned per-feature input scale (None for scalar w0 mode).
    # The kernel was learned on x * feature_scale — apply `scale_inputs`
    # to EVERY x that meets this spec (fit, predict, extend).
    feature_scale: Optional[np.ndarray] = None
    # which evidence the hypers maximized: "exact" (full GP) or "dtc"
    # (the streaming Nystrom tier's own model, gp/nystrom.py)
    objective: str = "exact"
    # provenance guards for --hyper_file artifacts: the kernel type the
    # evidence was computed under, and the feature dimension learned on —
    # installing an ntk artifact into an nngp server (or one from a
    # different encoding width) silently degrades every prediction, so
    # consumers validate these when present (None = pre-guard artifact)
    get: str = "nngp"
    num_features: Optional[int] = None

    def spec_params(self) -> dict:
        """Learned Dense stds as the TRACED-operand dict for
        `fit_gp(spec_params=...)`: pass a FIXED structure spec (same
        depth/activation/width — e.g. the one this result was learned
        for) and these values ride as jit operands, so per-round relearn
        refits and the resulting posterior's predict/extend programs
        never recompile for new constants."""
        denses = [l for l in self.spec.layers if isinstance(l, Dense)]
        return {
            "w_stds": np.asarray([d.w_std for d in denses], np.float64),
            "b_stds": np.asarray([d.b_std for d in denses], np.float64),
        }

    def fit_kwargs(self) -> dict:
        """Ready-to-splat kwargs for `fit_gp` / `fit_nystrom`. b != 0 breaks
        scale equivariance, so the prescale shortcut must stay off."""
        kw = dict(diag_reg=self.diag_reg)
        if self.b != 0.0:
            kw["input_scale"] = 1.0
        return kw

    def scale_inputs(self, x):
        """Apply the learned ARD feature scaling (identity in scalar mode)."""
        if self.feature_scale is None:
            return x
        return x * jnp.asarray(self.feature_scale, dtype=jnp.asarray(x).dtype)

    def to_json(self) -> str:
        """Serialize to a standalone JSON artifact. Learning costs minutes
        (multi-start Adam, O(n^3) or O(n m^2) per step) while the result is
        a handful of floats + the ARD scale vector — persist it once and
        reuse across runs / CLIs (`--hyper_file`). fp64 repr round-trips
        every field exactly; `from_json` rebuilds the spec from
        (depth, activation, width, w0, w, b)."""
        import json
        denses = [l for l in self.spec.layers if isinstance(l, Dense)]
        return json.dumps({
            "w0": self.w0, "w": self.w, "b": self.b,
            "diag_reg": self.diag_reg,
            "log_evidence": self.log_evidence,
            "num_points": self.num_points,
            "depth": self.depth, "activation": self.activation,
            "width": denses[0].width,
            "objective": self.objective,
            "get": self.get,
            "num_features": self.num_features,
            "feature_scale": (None if self.feature_scale is None else
                              np.asarray(self.feature_scale,
                                         np.float64).tolist()),
            "nll_history": np.asarray(self.nll_history,
                                      np.float64).tolist(),
        }, indent=1)

    @classmethod
    def from_json(cls, text: str) -> "HyperoptResult":
        import json
        d = json.loads(text)
        fs = (None if d["feature_scale"] is None
              else np.asarray(d["feature_scale"], np.float64))
        spec = KernelSpec(_build_layers(d["depth"], d["activation"],
                                        d["width"], d["w0"], d["w"], d["b"]))
        return cls(spec=spec, diag_reg=float(d["diag_reg"]),
                   log_evidence=float(d["log_evidence"]),
                   nll_history=np.asarray(d["nll_history"], np.float64),
                   w0=float(d["w0"]), w=float(d["w"]), b=float(d["b"]),
                   num_points=int(d["num_points"]), depth=int(d["depth"]),
                   activation=d["activation"], feature_scale=fs,
                   objective=d["objective"],
                   get=d.get("get", "nngp"),
                   num_features=(int(d["num_features"])
                                 if d.get("num_features") is not None
                                 else None))

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "HyperoptResult":
        with open(path) as f:
            return cls.from_json(f.read())


def fit_kernel_hyperparams(x, y, depth: int = 1, activation: str = "relu",
                           get: str = "nngp", steps: int = 100,
                           lr: float = 0.1,
                           max_points: Optional[int] = 4096,
                           seed: int = 0, width: int = 512,
                           init: Tuple[float, float, float, float] =
                           (1.0, 1.0, 0.1, 1e-3),
                           reg_restarts: Tuple[float, ...] =
                           (1e-3, 3e-2, 0.3),
                           eps: Optional[float] = None,
                           ard: bool = False,
                           init_feature_scale=None,
                           objective: str = "exact",
                           dtc_m: int = 512,
                           mesh=None,
                           mm_jitter_rel: Optional[float] = None
                           ) -> HyperoptResult:
    """Learn (w0, w, b, diag_reg) for an `mlp(depth, activation)` kernel by
    maximizing the exact log evidence on (a subsample of) the training set.

    Cost: one compile + one dispatch; per step one n x n Gram + Cholesky on
    the MXU (n = min(len(x), max_points); 4096^3/3 * steps ~ 2 TFLOP at the
    default — sub-second on a v5e chip). Returns a `HyperoptResult` whose
    `spec` / `fit_kwargs()` plug into ANY tier (fit_gp, fit_nystrom,
    distributed_fit) — hyperparameters are data-size-transferable because
    the relative-ridge semantics and the kernel are both row-wise.

    Notes:
      * inputs are used as-is — run on [0,1000]-scale / chunk_norm features
        (raw 2^64-packed chunks overflow fp32 squared Gram entries;
        CLAUDE.md prescale note). With b != 0 the spec is NOT scale
        equivariant, so `fit_kwargs` pins input_scale=1.
      * init = (w0, w, b, diag_reg); all four are log-parameterized, so
        every iterate stays positive. b can reach ~0 but never exactly —
        exact-zero-bias models should just pin b via the plain spec.
      * the evidence is MULTIMODAL in the ridge (measured: a 1e-3 init on
        noisy data settles into an interpolating optimum 17 nats worse
        than the 0.05 init) — `reg_restarts` ridge inits run as one
        vmapped batch and the best final evidence wins, still one
        dispatch. init's own diag_reg is always included.
      * ard=True learns a PER-FEATURE input scale s (d parameters; the
        first Dense sees x * s, so s subsumes the scalar w0 — the
        principled version of the chunk_norm heuristic). The result's
        `feature_scale` must be applied to every input that meets the
        spec: `post = fit_gp(res.spec, res.scale_inputs(x), y, ...)` and
        likewise at predict/extend. `init_feature_scale` seeds s (e.g.
        1000/max_abs per column to start at chunk_norm-like geometry —
        recommended for wildly mixed-scale features, since Adam moves
        log_s only ~lr per step).
      * objective='dtc' maximizes the evidence of the DTC/Nystrom model
        (dtc_m inducing rows — a seeded uniform draw: the rows are
        permuted once and the prefix is the inducing set) instead of the
        exact GP: use it when the hypers will serve the streaming tier
        (`fit_nystrom` / Estimator(nystrom_m=...)) — the exact-GP optimum
        measurably loses there (BASELINE.md 90k row). O(n m^2) per step;
        composes with ard=True. mm_jitter_rel overrides the K_mm jitter
        floor (default 1e-10 fp64 / 1e-4 fp32 — the fp32 floor is the
        measured Cholesky-breakdown scale, _nll_dtc docstring); it is a
        TRACED operand, so sweeping it recompiles nothing.
      * max_points=None disables the subsample — affordable with
        objective='dtc' (linear in n per step) where the exact O(n^3)
        loss is not. Measured: scalar hypers saturate by ~2k rows (a 4x
        subsample did NOT improve 90k serving, BASELINE.md); full-n is
        for the high-dimensional ARD parameterization.
      * mesh (requires objective='dtc'): shard the rows of x/y over the
        mesh's first axis — every loss term except the m x m stage is a
        sum over rows, so XLA turns the moment contractions into psums
        over ICI (GSPMD; no shard_map needed — the sharding rides on the
        arrays). Ragged n is padded with mask-inert rows. Combined with
        max_points=None this learns hypers from the FULL training set.
    """
    if ard and init_feature_scale is not None:
        scaled_probe = np.abs(np.asarray(x)) * np.asarray(init_feature_scale)
        max_abs = float(np.max(scaled_probe)) if np.size(x) else 0.0
    else:
        max_abs = float(np.max(np.abs(np.asarray(x)))) if np.size(x) else 0.0
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    if x.dtype != jnp.float64 and max_abs > 2.0 ** 20:
        # packed categorical chunks reach 2^64: their squared fp32 Gram
        # entries overflow, and the learned spec (b != 0) is not scale
        # equivariant, so the fit-time prescale cannot rescue it either
        raise ValueError(
            f"fit_kernel_hyperparams: max|feature| = {max_abs:.3g} "
            "overflows squared fp32 Gram entries; encode with "
            "chunk_norm=True (or pass fp64 inputs on CPU)")
    if y.ndim == 1:
        y = y[:, None]
    n = x.shape[0]
    if max_points is not None and n > max_points:
        sel = np.sort(np.random.default_rng(seed).choice(
            n, size=max_points, replace=False))
        x, y = x[sel], y[sel]
    if objective == "dtc":
        # the inducing set is the row prefix — permute once so it is a
        # uniform draw even when the (sub)sample preserves dataset order
        # (the sorted `sel` above biases a raw prefix toward early rows)
        perm = np.random.default_rng(seed + 1).permutation(int(x.shape[0]))
        x, y = x[perm], y[perm]
    if eps is None:
        eps = 1e-12 if x.dtype == jnp.float64 else 1e-6
    regs = [float(init[3])] + [r for r in reg_restarts
                               if float(r) != float(init[3])]
    theta0s = {
        "log_w": jnp.log(jnp.full(len(regs), init[1], x.dtype)),
        "log_b": jnp.log(jnp.full(len(regs), init[2], x.dtype)),
        "log_reg": jnp.log(jnp.asarray(regs, x.dtype)),
    }
    if ard:
        s0 = (jnp.full(x.shape[1], float(init[0]), x.dtype)
              if init_feature_scale is None
              else jnp.asarray(init_feature_scale, x.dtype))
        theta0s["log_s"] = jnp.broadcast_to(
            jnp.log(s0)[None, :], (len(regs), x.shape[1]))
    else:
        theta0s["log_w0"] = jnp.log(jnp.full(len(regs), init[0], x.dtype))
    if objective not in ("exact", "dtc"):
        raise ValueError(
            f"objective must be 'exact' or 'dtc', got {objective!r}")
    dtc_m = min(int(dtc_m), int(x.shape[0])) if objective == "dtc" else 0
    mask = None
    n_scored = int(x.shape[0])   # rows the evidence is scored on (pre-pad)
    if mesh is not None:
        if objective != "dtc":
            raise ValueError(
                "mesh-sharded hyperopt requires objective='dtc' — the "
                "exact O(n^3) loss is not row-shardable")
        from jax.sharding import NamedSharding, PartitionSpec
        n_rows = int(x.shape[0])
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        pad = (-n_rows) % n_dev
        mask = jnp.concatenate([jnp.ones(n_rows, x.dtype),
                                jnp.zeros(pad, x.dtype)])
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad, x.shape[1]), x.dtype)])
            y = jnp.concatenate(
                [y, jnp.zeros((pad, y.shape[1]), y.dtype)])
        row_sharding = NamedSharding(mesh, PartitionSpec(mesh.axis_names))
        x = jax.device_put(x, NamedSharding(
            mesh, PartitionSpec(mesh.axis_names, None)))
        y = jax.device_put(y, NamedSharding(
            mesh, PartitionSpec(mesh.axis_names, None)))
        mask = jax.device_put(mask, row_sharding)
    theta, hist, final = _optimize(x, y, theta0s, depth, activation, width,
                                   get, steps, float(lr), float(eps),
                                   ard=ard, objective=objective,
                                   dtc_m=dtc_m, mask=mask,
                                   mm_jitter_rel=mm_jitter_rel)
    if not np.isfinite(float(final)):
        # nanargmin over all-inf finals returns index 0 — without this
        # check the UN-learned init would be reported as a success
        raise FloatingPointError(
            "hyperopt: every restart diverged (non-finite loss at all "
            "inits) — check the features/labels for NaN/overflow, or "
            "widen init/reg_restarts")
    w = float(np.exp(theta["log_w"]))
    b = float(np.exp(theta["log_b"]))
    reg = float(np.exp(theta["log_reg"]))
    feature_scale = None
    if ard:
        w0 = 1.0
        feature_scale = np.exp(np.asarray(theta["log_s"], np.float64))
    else:
        w0 = float(np.exp(theta["log_w0"]))
    spec = KernelSpec(_build_layers(depth, activation, width, w0, w, b))
    return HyperoptResult(
        spec=spec, diag_reg=reg, log_evidence=-float(final),
        nll_history=np.asarray(hist), w0=w0, w=w, b=b,
        num_points=n_scored, depth=depth, activation=activation,
        feature_scale=feature_scale, objective=objective,
        get=get, num_features=int(x.shape[1]))


def select_kernel(x, y, depths: Tuple[int, ...] = (1, 2, 3),
                  activations: Tuple[str, ...] = ("relu", "erf"),
                  get: str = "nngp", verbose=None,
                  **kwargs) -> Tuple[HyperoptResult, list]:
    """Discrete model selection by evidence: run `fit_kernel_hyperparams`
    for every (depth, activation) and return (best, all_results) ranked by
    log evidence. Bayesian-complete selection — the continuous parameters
    are optimized per structure, then structures compete on evidence; no
    validation split is consumed (the reference's only structure choice is
    a hard-coded 1-hidden-layer ReLU stack, `/root/reference/train.py:161-164`).

    Evidences are comparable across configs because every run scores the
    SAME seeded subsample (`seed`/`max_points` in kwargs). Each (depth,
    activation) is a different program, so this costs one compile per
    config (30-300 s each through the TPU tunnel — on-device the math is
    sub-second; prefer CPU or a warm cache for wide grids)."""
    results = []
    for d in depths:
        for a in activations:
            res = fit_kernel_hyperparams(x, y, depth=d, activation=a,
                                         get=get, **kwargs)
            results.append(res)
            if verbose:
                verbose(f"depth={d} act={a}: log evidence "
                        f"{res.log_evidence:.2f} (w0={res.w0:.3f} "
                        f"w={res.w:.3f} b={res.b:.3f} "
                        f"reg={res.diag_reg:.2e})")
    results.sort(key=lambda r: r.log_evidence, reverse=True)
    return results[0], results
