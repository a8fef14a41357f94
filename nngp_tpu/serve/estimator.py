"""Serving estimator — the PostgreSQL-facing API.

Parity surface of `neuroestimator.estimator.Estimator`
(`/root/reference/neuroestimator/estimator/estimator.py:16-68`): constructor
loads schema + training queries (optionally hard aux queries), builds the
posterior once; `predict(query_lines)` parses card-less query lines
(grammar `neuroestimator/README.md:36-48`), encodes, and returns
(pred_mean, pred_std) in log2-card space.

TPU-native upgrades over the reference:
  - the fitted posterior state (Cholesky factor + alpha + encoder stats) is a
    real checkpoint: `save()` / `Estimator.restore()` restart the server
    without re-reading CSVs or refitting (the reference recomputes everything
    on every construction — SURVEY.md section 5 "checkpoint/resume: none");
  - prediction runs the fused cross-Gram + triangular solves on device;
    std comes from the diag-only covariance path (no m x m matrix);
  - stats can come from a JSON artifact, so serving hosts don't need the raw
    relational CSVs at all.
"""

import collections
import os
import json
import time
from typing import Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from nngp_tpu.featurize.join import MultiJoinEncoder
from nngp_tpu.featurize.schema import DBSchema
from nngp_tpu.featurize.stats import TableStats
from nngp_tpu.gp import GPPosterior, fit_gp
from nngp_tpu.models.kernel_spec import (
    Activation,
    Dense,
    KernelSpec,
    reference_kernel,
)

# Scaled-feature magnitude ceiling for incremental extends, mirroring the
# fit-time prescale threshold (`gp.posterior._PRESCALE_MAX_ABS`): beyond it
# squared fp32 Gram entries head toward overflow.
_EXTEND_MAX_SCALED_ABS = 2.0 ** 20


def _spec_to_json(spec: KernelSpec):
    out = []
    for layer in spec.layers:
        if isinstance(layer, Dense):
            out.append({"dense": [layer.width, layer.w_std, layer.b_std]})
        else:
            out.append({"activation": layer.name})
    return out


def _spec_from_json(items) -> KernelSpec:
    layers = []
    for it in items:
        if "dense" in it:
            w, ws, bs = it["dense"]
            layers.append(Dense(int(w), float(ws), float(bs)))
        else:
            layers.append(Activation(it["activation"]))
    return KernelSpec(tuple(layers))


def _build_schema_stats(schema_name: str, data_path: str, chunk_size: int):
    from nngp_tpu.data.loaders import SCHEMAS
    if schema_name not in SCHEMAS:
        raise ValueError(f"Unsupported schema {schema_name!r}; have {list(SCHEMAS)}")
    loaders, table_names = SCHEMAS[schema_name]
    dfs, col_types_list, pks = [], [], []
    for fn in loaders:
        df, col_types, pk = fn(data_path)
        dfs.append(df)
        col_types_list.append(col_types)
        pks.append(pk)
    schema = DBSchema(dfs, col_types_list, table_names, pks, chunk_size)
    return schema.stats


class Estimator:
    # Cross-call prediction memo capacity (entries). A class attribute so
    # checkpoint-restored instances (built via __new__) get it too; override
    # per instance with the `predict_cache_size` constructor argument.
    predict_cache_size = 4096
    # Configuration-routing mode (class attribute so checkpoint-restored
    # instances report one too; the restored flags themselves are concrete).
    quality = "reference"

    @property
    def posterior(self):
        return self._posterior

    @posterior.setter
    def posterior(self, value):
        # EVERY posterior change (fit, extend, forget, grow, relearn,
        # restore, rollback) must invalidate the prediction memo — a stale
        # entry would silently serve the OLD model's answer.
        self._posterior = value
        self._pred_cache = collections.OrderedDict()

    def __init__(self, schema_name: str, data_path: str, train_query_path: str,
                 chunk_size: int = 64, use_aux: bool = False,
                 q_error_threshold: float = 100.0,
                 coef_var_threshold: float = 1.0,
                 kernel_type: str = "nngp", diag_reg: float = 1e-3,
                 spec: Optional[KernelSpec] = None,
                 stats: Optional[Sequence[TableStats]] = None,
                 stats_dir: Optional[str] = None,
                 dtype=np.float32, verbose: bool = True,
                 mesh=None, dist_block_size: Optional[int] = None,
                 chunk_norm: Optional[bool] = None,
                 nystrom_m: Optional[int] = None,
                 nystrom_moments: Optional[str] = None,
                 learn_hyper=False, hyper_steps: int = 100,
                 hyper_points: int = 4096, hyper_ard: Optional[bool] = None,
                 hyper_objective: str = "auto",
                 predict_cache_size: int = 4096,
                 pad_slots: Optional[int] = None,
                 quality: str = "reference",
                 calibrate_frac: Optional[float] = None,
                 calibrate_seed: int = 7,
                 tier: Optional[str] = None,
                 auto_nystrom_m: int = 2048,
                 exact_max_n: int = 55000):
        """mesh: optional jax.sharding.Mesh — fit and serve with the
        row-sharded distributed posterior (parallel.distributed_fit), for
        training sets whose n^2 Gram/factor exceed one chip's HBM. Any
        train-set size works (the layout pads with inert rows).

        nystrom_m: fit the streaming Nystrom/DTC tier (gp/nystrom.py) with
        this many inducing rows instead of the exact posterior — O(m^2)
        device state at any n, for train sets beyond the exact fit's
        single-chip edge. Combined with mesh, the panel moments shard over
        the mesh (psum over ICI) instead of using the exact row-sharded
        distributed posterior.

        nystrom_moments: moment-streaming precision for the Nystrom tier
        ('fp32' default, or 'df64': kernel entries + whitened projection +
        accumulators in emulated fp64, `gp/nystrom.py` moments=... — the
        tails ride through extend/forget/grow and checkpoints).

        chunk_norm: rescale packed categorical chunk slots onto the
        [0, 1000] numeric scale (featurize.SingleTableEncoder) — measured
        3.4x median q-error on the 6-table join workload; off = bit-exact
        reference encoding.

        learn_hyper: learn (w0, w, b, diag_reg) by exact-MLL gradient
        descent on (a subsample of) the training queries before fitting
        (gp/hyperopt.py) — replaces `spec`'s Dense stds and `diag_reg`
        with the learned values. Requires fp32-safe feature magnitudes:
        with packed categorical chunks, pass chunk_norm=True. Instead of
        True, a `gp.hyperopt.HyperoptResult` (e.g. loaded from the JSON
        artifact of an earlier run, `HyperoptResult.load`) applies the
        already-learned spec/ridge/ARD-scale directly — no re-learning.

        hyper_ard: with learn_hyper, learn a PER-FEATURE input scale by
        evidence (ARD — the principled replacement for the chunk_norm
        heuristic; measured median q 2.69 -> 2.32 and p95 33 -> 28 on the
        synth6 join, BASELINE.md). The learned `feature_scale` is applied
        to every encoded query (fit, predict, extend, forget) and rides
        through checkpoints.

        hyper_objective: which evidence learn_hyper maximizes — 'exact'
        (full-GP MLL), 'dtc' (the streaming Nystrom tier's own model), or
        'auto' (default): 'dtc' when nystrom_m is set, else 'exact'.
        Measured at 90k (BASELINE.md): DTC-objective hypers beat
        exact-objective hypers on every quantile of the served Nystrom
        tier. hyper_points=0 disables the subsample (DTC objective only —
        its loss is linear in n), and with mesh set the DTC hyperopt rows
        shard over the mesh (GSPMD psums over ICI).

        pad_slots: SHAPE-STABLE online learning (single-chip exact nngp
        tier only): the fit pads its storage with this many inert rows
        (`fit_gp(pad_to=n + pad_slots)`) and `extend_with_lines` buckets
        each feedback batch to a power-of-two in-place append — so online
        extends reuse a handful of compiled programs instead of paying a
        fresh-shape compile (30-300 s through a remote-TPU tunnel)
        MID-TRAFFIC per batch. When the slots run out the posterior falls
        back to dense appends (one compile per shape again); size
        pad_slots to the expected feedback volume between refits.

        quality: configuration routing. 'reference' (default) honors every
        flag exactly as passed — bit-exact reference encoding + pinned
        hyperparameters unless opted in otherwise. 'best' routes the
        measured-best decision table (BASELINE.md) for any flag still at
        its unset default:
          * chunk_norm=True — the fp32 on-ramp for packed categorical
            chunks (no-op on all-numerical schemas);
          * learn_hyper=True with hyper_ard=True and the auto DTC
            objective — ARD evidence learning beats the reference's
            pinned hypers on every measured workload (forest, synth6,
            synthimdb, 90k Nystrom serving);
          * nystrom_moments='df64' when nystrom_m is set and dtype is
            fp32 — emulated-fp64 moment streaming + deeper rank cuts,
            measured median q 2.52 -> 2.40 at 90k on chip at equal
            serving cost (experiments/nystrom_df64_moments_ab2.log);
          * calibrate_frac=0.1 — auto-calibrated uncertainty (below).
        Flags you pass explicitly still win; 'best' only fills unset ones.
        (Exception: learn_hyper=False IS the unset sentinel — to serve
        'best' minus hyperopt, pass a HyperoptResult artifact or use
        quality='reference' with individual flags.)
        Requires an mlp-shaped spec (the default). Budget for the hyperopt
        dispatch at construction (~30 s warm on TPU, ~12-15 min on a
        1-core fp64 CPU at d~114).

        calibrate_frac: hold out this (seeded) fraction of the training
        queries from the fit and calibrate uncertainty on them after it —
        fits the MLE std temperature (`eval.calibration.fit_std_scale`,
        applied to every later predict std) and the split-conformal score
        set enabling `predict_interval`, exactly as an explicit
        `calibrate_uncertainty` call would. Measured on forest (fp64 CPU,
        default kernel, val-fitted temperature, test-evaluated):
        expected-vs-observed coverage MAE 0.413 -> 0.022 (std_scale 0.20
        — the default kernel is strongly underconfident). The reference
        only PLOTS calibration (`/root/reference/util.py:296-313`); it
        cannot repair it.

        tier: posterior-tier routing. None (default) derives the tier from
        the flags exactly as before: nystrom_m set -> streaming Nystrom,
        mesh set -> distributed, else single-chip exact. 'auto' picks by
        measured capability ladder (BASELINE.md scale tables): exact while
        the train set fits one chip's exact tier (n <= exact_max_n,
        default 55k of the measured ~70k edge — headroom for online
        extends), then the mesh-distributed exact tier when a mesh is
        given, else the streaming Nystrom tier with auto_nystrom_m
        inducing rows (O(m^2) device state at any n; 90k median q 2.40
        with quality='best'). Explicit 'exact' / 'nystrom' /
        'distributed' force a tier ('nystrom' without nystrom_m uses
        auto_nystrom_m; 'distributed' requires mesh).

        predict_cache_size: capacity of the cross-call prediction memo.
        PostgreSQL plan enumeration re-submits the same sub-queries across
        plan candidates and across optimizer invocations; `predict` dedups
        each batch and memoizes (query line -> raw mean/std), so repeats
        never reach the device. Invalidated on any posterior change; 0
        disables retention (within-batch dedup still applies)."""
        (chunk_norm, learn_hyper, hyper_ard, nystrom_moments,
         calibrate_frac) = self.resolve_quality_flags(
            quality, chunk_norm=chunk_norm, learn_hyper=learn_hyper,
            hyper_ard=hyper_ard, nystrom_m=nystrom_m,
            nystrom_moments=nystrom_moments, dtype=dtype,
            calibrate_frac=calibrate_frac)
        chunk_norm = bool(chunk_norm) if chunk_norm is not None else False
        hyper_ard = bool(hyper_ard) if hyper_ard is not None else False
        self._moments_unset = nystrom_moments is None
        nystrom_moments = (str(nystrom_moments)
                           if nystrom_moments is not None else "fp32")
        calibrate_frac = float(calibrate_frac or 0.0)
        if not 0.0 <= calibrate_frac < 1.0:
            raise ValueError(
                f"calibrate_frac must be in [0, 1), got {calibrate_frac}")
        self.quality = quality
        self.schema_name = schema_name
        self.chunk_size = chunk_size
        self.predict_cache_size = int(predict_cache_size)
        self.kernel_type = kernel_type
        self.diag_reg = diag_reg
        self.dtype = dtype
        self.mesh = mesh
        self.dist_block_size = dist_block_size
        self.chunk_norm = bool(chunk_norm)
        self.nystrom_m = nystrom_m
        self.nystrom_moments = str(nystrom_moments)
        if pad_slots is not None and (nystrom_m is not None
                                      or mesh is not None
                                      or kernel_type != "nngp"):
            raise ValueError(
                "pad_slots is the single-chip exact-nngp shape-stability "
                "feature; the Nystrom tier is already shape-stable and the "
                "distributed tier pads internally")
        self.pad_slots = int(pad_slots) if pad_slots is not None else None
        self.spec = spec if spec is not None else reference_kernel()

        if stats is None:
            if stats_dir is not None:
                from nngp_tpu.data.loaders import SCHEMAS
                from nngp_tpu.featurize.stats import load_stats_dir
                names = (SCHEMAS[schema_name][1]
                         if schema_name in SCHEMAS else None)
                stats = load_stats_dir(stats_dir, table_names=names)
            else:
                stats = _build_schema_stats(schema_name, data_path, chunk_size)
        self.stats = list(stats)
        self.encoder = MultiJoinEncoder(self.stats, chunk_norm=self.chunk_norm)
        self._fast = self._try_fast_encoder()

        queries, cards, _infos = self.encoder.load_queries(
            train_query_path, use_aux=use_aux,
            q_error_threshold=q_error_threshold,
            coef_var_threshold=coef_var_threshold)
        x, y = self.encoder.transform_to_arrays(queries, cards, dtype=dtype)
        if verbose:
            print(f"training queries: {x.shape[0]}  feature dim: {x.shape[1]}")
        # Resolve the calibration-holdout size FIRST so tier routing sees
        # the row count actually fitted (routing on the pre-holdout count
        # could send a near-boundary fit to the wrong tier). The holdout is
        # capped at half the rows so tiny train sets under quality='best'
        # (calibrate_frac=0.1, min 10 rows) keep at least half for the fit.
        n_cal = 0
        if calibrate_frac > 0.0 and x.shape[0] >= 20:
            n_cal = min(max(10, int(round(calibrate_frac * x.shape[0]))),
                        x.shape[0] // 2)
        if tier is not None:
            self._route_tier(tier, x.shape[0] - n_cal, auto_nystrom_m,
                             exact_max_n, verbose)
        self.std_scale = 1.0            # post-hoc std recalibration (MLE)
        self._conformal_scores = None   # sorted |y-mu|/std calibration set
        self.drift_monitor = None       # created lazily by record_feedback
        self.feature_scale = None
        self.hyper_result = None        # HyperoptResult in effect (if any)
        x_cal = y_cal = None
        if n_cal > 0:
            # Seeded holdout BEFORE hyperopt/fit: calibration rows must be
            # genuinely held out or the coverage guarantee is void.
            perm = np.random.default_rng(calibrate_seed).permutation(
                x.shape[0])
            cal_idx, fit_idx = perm[:n_cal], perm[n_cal:]
            x_cal, y_cal = x[cal_idx], y[cal_idx]
            x, y = x[fit_idx], y[fit_idx]
            if verbose:
                print(f"calibration holdout: {n_cal} queries "
                      f"(fit on {x.shape[0]})")
        if learn_hyper:
            if isinstance(learn_hyper, bool):
                self._learn_hyperparams(x, y, hyper_steps, hyper_points,
                                        verbose, ard=hyper_ard,
                                        objective=hyper_objective)
            else:
                if hyper_ard and learn_hyper.feature_scale is None:
                    raise ValueError(
                        "hyper_ard=True but the hyper artifact is scalar-"
                        "mode (no feature_scale) — relearn it with ard=True "
                        "or drop hyper_ard")
                self._apply_hyper_result(learn_hyper, x, verbose)
            x = self._apply_feature_scale(x)
        elif hyper_ard:
            raise ValueError("hyper_ard requires learn_hyper=True")
        self.posterior = self._fit(x, y)
        self._validate_fit()
        if x_cal is not None:
            self._calibrate_arrays(self._apply_feature_scale(x_cal),
                                   np.asarray(y_cal, np.float64).ravel(),
                                   verbose, source="holdout")

    @staticmethod
    def resolve_quality_flags(quality, *, chunk_norm, learn_hyper, hyper_ard,
                              nystrom_m, nystrom_moments, dtype,
                              calibrate_frac):
        """Resolve quality='best' routing into concrete flag values.

        Fills ONLY flags still at their unset (None) sentinel — explicit
        arguments always win. Decision table: BASELINE.md. Pure function of
        its arguments so the routing matrix is testable without a fit
        (tests/test_routing_gate.py). Returns the tuple
        (chunk_norm, learn_hyper, hyper_ard, nystrom_moments,
        calibrate_frac) with None sentinels preserved for downstream
        normalization."""
        if quality not in ("reference", "best"):
            raise ValueError(
                f"quality must be 'reference' or 'best', got {quality!r}")
        if quality == "best":
            if chunk_norm is None:
                chunk_norm = True
            if learn_hyper is False:
                # learn_hyper=False IS the unset sentinel (documented
                # exception: pass a HyperoptResult or quality='reference'
                # to serve 'best' minus hyperopt)
                learn_hyper = True
            if hyper_ard is None:
                # respect a scalar hyper artifact if one was passed
                hyper_ard = (learn_hyper is True
                             or getattr(learn_hyper, "feature_scale", None)
                             is not None)
            if (nystrom_moments is None and nystrom_m is not None
                    and np.dtype(dtype) == np.float32):
                nystrom_moments = "df64"
            if calibrate_frac is None:
                calibrate_frac = 0.1
        return (chunk_norm, learn_hyper, hyper_ard, nystrom_moments,
                calibrate_frac)

    def _route_tier(self, tier: str, n: int, auto_m: int, exact_max_n: int,
                    verbose: bool):
        """Resolve tier='auto'/'exact'/'nystrom'/'distributed' into the
        concrete (nystrom_m, mesh) configuration before the fit. 'auto'
        follows the measured capability ladder (BASELINE.md): single-chip
        exact while n fits it, the mesh tier when a mesh is available,
        the streaming Nystrom tier beyond."""
        if tier not in ("auto", "exact", "nystrom", "distributed"):
            raise ValueError(
                "tier must be 'auto', 'exact', 'nystrom' or 'distributed'; "
                f"got {tier!r}")
        if tier == "auto":
            if self.nystrom_m is not None:
                tier = "nystrom"
            elif n <= exact_max_n:
                tier = "distributed" if self.mesh is not None else "exact"
            elif self.mesh is not None:
                tier = "distributed"
            else:
                tier = "nystrom"
        if tier == "exact":
            if self.mesh is not None:
                raise ValueError(
                    "tier='exact' is the single-chip tier; drop mesh= or "
                    "use tier='distributed'")
            self.nystrom_m = None
        elif tier == "distributed":
            if self.mesh is None:
                raise ValueError("tier='distributed' requires mesh=")
            self.nystrom_m = None
        else:                                   # nystrom
            if self.pad_slots is not None:
                raise ValueError(
                    "pad_slots is the single-chip exact-tier feature but "
                    f"the routed tier for n={n} is the Nystrom tier")
            if self.nystrom_m is None:
                self.nystrom_m = min(int(auto_m), n)
            if (self.quality == "best" and self._moments_unset
                    and np.dtype(self.dtype) == np.float32):
                # same decision-table rule as the constructor bundle — the
                # tier was not known yet when the bundle was resolved
                self.nystrom_moments = "df64"
        if verbose:
            print(f"tier routing: n={n} -> {tier}"
                  + (f" (m={self.nystrom_m}, moments="
                     f"{self.nystrom_moments})" if tier == "nystrom" else ""))

    def _require_mlp_spec(self, op_name: str):
        """Hyperopt only parameterizes mlp-shaped stacks — silently
        learning a DIFFERENT kernel family than the server's would swap
        the model out from under the user. Returns (acts, denses)."""
        acts = [l for l in self.spec.layers if isinstance(l, Activation)]
        denses = [l for l in self.spec.layers if isinstance(l, Dense)]
        if not acts or len(denses) != len(acts) + 1 or len(
                {a.name for a in acts}) != 1:
            raise ValueError(
                f"{op_name} requires an mlp-shaped spec "
                "((Dense, Activation)*depth + Dense, one activation); got "
                f"{self.spec.layers}")
        return acts, denses

    def _learn_hyperparams(self, x, y, steps, max_points, verbose,
                           ard: bool = False, objective: str = "auto"):
        """Replace self.spec / self.diag_reg with exact-MLL-learned values
        (gp/hyperopt.py). The learned spec round-trips through checkpoints
        unchanged — save() already serializes Dense (w_std, b_std); an ARD
        feature_scale is serialized alongside it in meta.json."""
        acts, denses = self._require_mlp_spec("learn_hyper")
        max_abs = float(np.max(np.abs(x))) if x.size else 0.0
        if max_abs > _EXTEND_MAX_SCALED_ABS:
            raise ValueError(
                f"learn_hyper: max|feature| = {max_abs:.3g} exceeds the "
                "fp32-safe range (squared Gram entries overflow); pass "
                "chunk_norm=True to put packed categorical chunks on the "
                "[0, 1000] scale")
        from nngp_tpu.gp.hyperopt import fit_kernel_hyperparams
        if objective == "auto":
            objective = "dtc" if self.nystrom_m else "exact"
        if not max_points and objective != "dtc":
            raise ValueError(
                "hyper_points=0 (full-n hyperopt) requires the DTC "
                "objective — the exact loss is O(n^3) per step")
        dtc_m = min(512, self.nystrom_m) if (
            objective == "dtc" and self.nystrom_m) else 512
        res = fit_kernel_hyperparams(
            x, y, depth=len(acts), activation=acts[0].name,
            get=self.kernel_type, steps=steps,
            max_points=max_points or None,   # 0 -> full-n (dtc is O(n m^2))
            width=denses[0].width, ard=ard, objective=objective,
            dtc_m=dtc_m,
            mesh=self.mesh if objective == "dtc" else None)
        if res.feature_scale is not None:
            self.feature_scale = np.asarray(res.feature_scale, np.float64)
        if verbose:
            print(f"learned hyperparameters: w0={res.w0:.4f} w={res.w:.4f} "
                  f"b={res.b:.4f} diag_reg={res.diag_reg:.3e} "
                  f"({res.objective} log evidence {res.log_evidence:.2f} "
                  f"on {res.num_points} rows)")
        self.spec = res.spec
        self.diag_reg = res.diag_reg
        self.hyper_result = res

    def _apply_hyper_result(self, res, x: np.ndarray, verbose: bool):
        """Install an already-learned `gp.hyperopt.HyperoptResult` (e.g.
        `HyperoptResult.load(path)` from a `--hyper_file` artifact) as this
        server's spec/ridge/ARD-scale — the cheap path when the learning
        run already happened elsewhere. Validates the artifact's
        provenance (kernel type, feature width) and the fp32 magnitude
        regime before installing — a mismatched artifact degrades every
        prediction with no other diagnostic."""
        num_features = x.shape[1]
        for art_features in (getattr(res, "num_features", None),
                             (len(np.ravel(res.feature_scale))
                              if res.feature_scale is not None else None)):
            if art_features is not None and art_features != num_features:
                raise ValueError(
                    f"hyper artifact was learned on {art_features} "
                    f"features but this schema encodes {num_features} — "
                    "wrong workload/stats?")
        if getattr(res, "get", None) and res.get != self.kernel_type:
            raise ValueError(
                f"hyper artifact maximized the {res.get!r} evidence but "
                f"this server fits kernel_type={self.kernel_type!r} — "
                "relearn with the matching get")
        # b != 0 pins input_scale=1.0 (fit_kwargs: the spec is no longer
        # scale-equivariant), so raw 2^64-packed chunks would overflow the
        # squared fp32 Gram — same guard _learn_hyperparams applies
        scaled_max = float(np.max(np.abs(x))) if x.size else 0.0
        if res.feature_scale is not None:
            scaled_max *= float(np.max(np.abs(res.feature_scale)))
        if (self.dtype == np.float32 and res.b != 0.0
                and scaled_max > _EXTEND_MAX_SCALED_ABS):
            raise ValueError(
                f"hyper artifact has b={res.b:g} (prescale off) but "
                f"max|feature| ~ {scaled_max:.3g} exceeds the fp32-safe "
                "range; pass chunk_norm=True (or use fp64)")
        if res.feature_scale is not None:
            self.feature_scale = np.asarray(res.feature_scale, np.float64)
        if verbose:
            print(f"loaded hyperparameters: w0={res.w0:.4f} w={res.w:.4f} "
                  f"b={res.b:.4f} diag_reg={res.diag_reg:.3e} "
                  f"({res.objective} log evidence {res.log_evidence:.2f} "
                  f"on {res.num_points} rows)")
        self.spec = res.spec
        self.diag_reg = res.diag_reg
        self.hyper_result = res

    def relearn_hyperparams(self, labeled_lines: Optional[Sequence[str]] =
                            None, steps: int = 40,
                            max_points: Optional[int] = 2048,
                            verbose: bool = True) -> float:
        """Warm hyperparameter RECALIBRATION for a live server: re-learn
        (w0, w, b, diag_reg) [+ the ARD feature scale if one is active]
        warm-started from the CURRENT values, then refit the posterior with
        the new kernel. Online extends (`extend_with_lines`) shift the
        training distribution, and the evidence optimum moves with it —
        measured on the active-learning analog of this loop, per-round
        relearning beats learn-once on every round (BASELINE.md,
        experiments/hyper_active_relearn.log). Warm start = single restart,
        few steps: ~5x cheaper than the cold multi-start learn.

        labeled_lines: `query@...@card` lines to learn from. Default None
        pulls the posterior's own training rows — exact tiers only; the
        streaming Nystrom tier has streamed its rows away (O(m^2) state),
        so there it is required (pass the full current training log: the
        refit installs exactly these lines as the new training set).

        The refit is transactional like extend_with_lines: on a NaN factor
        the previous spec/ridge/scale/posterior all stay authoritative.
        Returns the new log evidence. The reference has no serving-side
        hyperparameter machinery at all (diag_reg pinned at 1e-3,
        `/root/reference/train.py:171`)."""
        if labeled_lines is not None:
            x_fs, cards = self._encode_labeled_lines(labeled_lines,
                                                     "relearn_hyperparams")
            y = np.log2(cards).reshape(-1, 1).astype(self.dtype)
        else:
            p = self.posterior
            if isinstance(p, GPPosterior) and p.n_real is not None:
                p = p.strip_padding()   # drop inert rows before reading
            if hasattr(p, "x_natural"):          # distributed (real rows)
                x_fs = np.asarray(p.x_natural()) * float(p.input_scale)
                y = np.asarray(p.y_natural())
            elif hasattr(p, "x_train"):          # single-chip exact
                x_fs = np.asarray(p.x_train) * float(p.input_scale)
                y = np.asarray(p.y_train)
            else:
                raise ValueError(
                    "relearn_hyperparams: the streaming Nystrom tier does "
                    "not retain its training rows (O(m^2) state) — pass "
                    "labeled_lines (e.g. the serving feedback log)")
        # back to RAW feature units: the relearn may produce a NEW scale
        x_raw = (x_fs / self.feature_scale.astype(x_fs.dtype)
                 if self.feature_scale is not None else x_fs)

        from nngp_tpu.gp.hyperopt import fit_kernel_hyperparams
        acts, denses = self._require_mlp_spec("relearn_hyperparams")
        # warm init from the live spec; b is log-parameterized in the
        # hyperopt so a pinned-zero bias warm-starts at the default 0.1
        w0 = denses[0].w_std
        w = denses[1].w_std if len(denses) > 1 else denses[0].w_std
        b = denses[0].b_std if denses[0].b_std > 0 else 0.1
        objective = "dtc" if self.nystrom_m else "exact"
        res = fit_kernel_hyperparams(
            x_raw, y, depth=max(len(acts), 1),
            activation=acts[0].name if acts else "relu",
            get=self.kernel_type, steps=steps, max_points=max_points,
            width=denses[0].width, init=(w0, w, b, self.diag_reg),
            reg_restarts=(), ard=self.feature_scale is not None,
            init_feature_scale=self.feature_scale,
            objective=objective,
            dtc_m=min(512, self.nystrom_m) if self.nystrom_m else 512,
            mesh=self.mesh if objective == "dtc" else None)
        if verbose:
            print(f"relearned hyperparameters: w0={res.w0:.4f} "
                  f"w={res.w:.4f} b={res.b:.4f} diag_reg={res.diag_reg:.3e} "
                  f"({res.objective} log evidence {res.log_evidence:.2f} "
                  f"on {res.num_points} rows)")
        old = (self.spec, self.diag_reg, self.feature_scale, self.posterior)
        try:
            self.spec = res.spec
            self.diag_reg = res.diag_reg
            if res.feature_scale is not None:
                self.feature_scale = np.asarray(res.feature_scale,
                                                np.float64)
            self.posterior = self._fit(
                self._apply_feature_scale(x_raw), y)
            self._validate_fit()
            self.hyper_result = res
        except BaseException:
            # roll back on ANY failure, not just a NaN factor: a tunnel
            # outage / OOM mid-refit would otherwise leave the NEW
            # spec/ridge/ARD-scale installed against the OLD posterior —
            # every later encode would meet the factor in the wrong
            # geometry and predictions would be silently wrong
            (self.spec, self.diag_reg,
             self.feature_scale, self.posterior) = old
            raise
        return float(res.log_evidence)

    def _fit(self, x, y):
        # x/y arrive as HOST numpy: the fp32 prescale probe (max|x|) runs
        # on host for free instead of costing a blocking ~30 ms device
        # fetch per fit. (A layout-derived bound was tried and reverted:
        # scaling by the encoder's 2^64 chunk ceiling when the actual
        # training features are ~1e3 underflows the solve from the other
        # end — alpha ~ y/K blows past fp32 max. The scale must match the
        # DATA; extends beyond the fitted coverage are guarded loudly in
        # extend_with_lines.)
        if self.nystrom_m is not None:
            from nngp_tpu.gp import fit_nystrom
            return fit_nystrom(self.spec, x, y,
                               num_inducing=self.nystrom_m,
                               diag_reg=self.diag_reg, get=self.kernel_type,
                               mesh=self.mesh,
                               moments=self.nystrom_moments)
        if self.mesh is None:
            pad_to = (x.shape[0] + self.pad_slots
                      if getattr(self, "pad_slots", None) else None)
            return fit_gp(self.spec, x, y, diag_reg=self.diag_reg,
                          get=self.kernel_type, pad_to=pad_to)
        # any n: distributed_fit pads to the layout quantum with inert rows
        from nngp_tpu.parallel import distributed_fit
        return distributed_fit(self.spec, x, y, self.mesh,
                               diag_reg=self.diag_reg, get=self.kernel_type,
                               block_size=self.dist_block_size)

    def _validate_fit(self):
        """Fail loudly at construction if the factorization degenerated
        (non-SPD Gram from corrupt inputs shows up as NaNs in L/alpha) —
        the reference has no failure detection at all (SURVEY.md section 5)."""
        p = self.posterior
        if not hasattr(p, "l"):
            # Nystrom tier: the model is (whitened weights, inverse factor)
            probes = jnp.stack([
                jnp.isfinite(p.beta_w).all(),
                jnp.isfinite(p.ic).all(),
            ])
            ok_b, ok_ic = np.asarray(probes)
            if not (ok_b and ok_ic):
                raise FloatingPointError(
                    "Nystrom fit produced non-finite state (beta finite: "
                    f"{bool(ok_b)}, ic finite: {bool(ok_ic)}). "
                    "Check training cards > 0 and feature encodings.")
            return
        g2e = getattr(p, "g2e", None)
        if g2e is not None:
            # Block-cyclic storage: storage row s holds elimination row
            # g2e[s], so the factor's pivots live at l[s, g2e[s]] — the
            # plain array diagonal is an arbitrary (often zero) entry.
            n = p.l.shape[0]
            diag = p.l[jnp.arange(n), jnp.asarray(g2e)]
        elif hasattr(p.l, "blocks"):
            diag = p.l.diagonal()       # BlockLowerTriangular (>28k fits)
        else:
            diag = jnp.diagonal(p.l)
        probes = jnp.stack([
            jnp.isfinite(p.alpha).all(),
            jnp.isfinite(diag).all(),
        ])
        ok_alpha, ok_l = np.asarray(probes)
        if not (ok_alpha and ok_l):
            raise FloatingPointError(
                "GP fit produced non-finite factors (alpha finite: "
                f"{bool(ok_alpha)}, chol diag finite: {bool(ok_l)}). "
                "Check training cards > 0 and feature encodings.")

    # Alternate constructor: restore from checkpoint (no CSVs, no refit).
    @classmethod
    def restore(cls, ckpt_dir: str, spec: Optional[KernelSpec] = None,
                mesh=None):
        self = cls.__new__(cls)
        with open(os.path.join(ckpt_dir, "meta.json")) as f:
            meta = json.load(f)
        self.schema_name = meta["schema_name"]
        self.chunk_size = meta["chunk_size"]
        self.quality = meta.get("quality", "reference")
        self.kernel_type = meta["kernel_type"]
        self.diag_reg = meta["diag_reg"]
        self.dtype = np.dtype(meta["dtype"]).type
        if spec is not None:
            self.spec = spec
        elif "spec" in meta:
            self.spec = _spec_from_json(meta["spec"])
        else:
            self.spec = reference_kernel()
        self.stats = [TableStats.from_json(s) for s in meta["stats"]]
        self.chunk_norm = bool(meta.get("chunk_norm", False))
        self.feature_scale = (np.asarray(meta["feature_scale"], np.float64)
                              if "feature_scale" in meta else None)
        # the spec/ridge/scale already carry the learned values; the
        # standalone artifact is not checkpoint state
        self.hyper_result = None
        # slot budget is construction-time config; a restored PADDED
        # posterior (meta n_real) still bucket-extends into its remaining
        # slots — pad_slots only governs future _fit calls
        self.pad_slots = None
        self.std_scale = float(meta.get("std_scale", 1.0))
        self.drift_monitor = None
        self.encoder = MultiJoinEncoder(self.stats, chunk_norm=self.chunk_norm)
        self._fast = self._try_fast_encoder()
        arrs = np.load(os.path.join(ckpt_dir, "posterior.npz"))
        self._conformal_scores = (np.asarray(arrs["conformal_scores"])
                                  if "conformal_scores" in arrs else None)
        if "nystrom" in meta:
            # mesh is runtime config, not checkpoint state: restoring with
            # one reattaches sharded moment streaming for extend
            from nngp_tpu.gp import NystromPosterior
            d = meta["nystrom"]
            self.mesh = mesh
            self.dist_block_size = None
            self.nystrom_m = int(arrs["x_m"].shape[0])
            self.nystrom_moments = d.get("moments", "fp32")
            ntk = "m1_w" in arrs
            self.posterior = NystromPosterior(
                x_m=jnp.asarray(arrs["x_m"]),
                w_solve=jnp.asarray(arrs["w_solve"]),
                ic=jnp.asarray(arrs["ic"]),
                beta_w=jnp.asarray(arrs["beta_w"]),
                reg=jnp.asarray(arrs["reg"]),
                c_raw=jnp.asarray(arrs["c_raw"]),
                b_w=jnp.asarray(arrs["b_w"]),
                diag_sum=jnp.asarray(arrs["diag_sum"]),
                m1_w=jnp.asarray(arrs["m1_w"]) if ntk else None,
                w_kmm=jnp.asarray(arrs["w_kmm"]) if ntk else None,
                spec=self.spec, get=self.kernel_type,
                diag_reg=self.diag_reg,
                num_train=int(d["num_train"]),
                input_scale=float(d["input_scale"]),
                precision=d["precision"],
                rank_rtol=float(d["rank_rtol"]),
                panel_size=int(d["panel_size"]),
                finalize=d.get("finalize", "host"),
                mesh=mesh,
                yty=(jnp.asarray(arrs["yty"]) if "yty" in arrs else None),
                moments=d.get("moments", "fp32"),
                c_lo=(jnp.asarray(arrs["c_lo"]) if "c_lo" in arrs else None),
                b_lo=(jnp.asarray(arrs["b_lo"]) if "b_lo" in arrs else None),
                m1_lo=(jnp.asarray(arrs["m1_lo"])
                       if "m1_lo" in arrs else None),
                w_solve_lo=(jnp.asarray(arrs["w_solve_lo"])
                            if "w_solve_lo" in arrs else None),
                w_kmm_lo=(jnp.asarray(arrs["w_kmm_lo"])
                          if "w_kmm_lo" in arrs else None))
            return self
        if "distributed" in meta:
            if mesh is None:
                raise ValueError(
                    "checkpoint holds a distributed (row-sharded) posterior;"
                    " pass mesh= to restore it over a device mesh")
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P
            from nngp_tpu.parallel import DistributedPosterior
            from nngp_tpu.parallel.cholesky import cyclic_storage_order
            d = meta["distributed"]
            ax, b = d["axis_name"], int(d["block_size"])
            saved_p = int(d.get("mesh_size", 0))
            if saved_p and mesh.devices.size != saved_p:
                # The block-cyclic storage permutation is a function of the
                # fit-time mesh size; a different p would silently
                # mispermute every row.
                raise ValueError(
                    f"checkpoint was fit on a {saved_p}-device mesh; "
                    f"restore mesh has {mesh.devices.size} devices")
            ns = NamedSharding(mesh, P(ax, None))
            n = arrs["l"].shape[0]
            g2e = cyclic_storage_order(n, b, mesh.devices.size)
            k_tt = (jax.device_put(arrs["k_tt"], ns)
                    if "k_tt" in arrs else None)
            self.posterior = DistributedPosterior(
                x_storage=jax.device_put(arrs["x_storage"], ns),
                y_storage=jax.device_put(arrs["y_storage"], ns),
                l=jax.device_put(arrs["l"], ns),
                alpha=jax.device_put(arrs["alpha"], ns),
                reg=jnp.asarray(arrs["reg"]), k_tt=k_tt,
                spec=self.spec, get=self.kernel_type, mesh=mesh,
                axis_name=ax, block_size=b,
                g2e=tuple(int(i) for i in g2e),
                n_real=int(d.get("n_real", n)),
                input_scale=float(d.get("input_scale", 1.0)))
            self.mesh = mesh
            self.dist_block_size = b
            self.nystrom_m = None
            return self
        if mesh is not None:
            raise ValueError(
                "checkpoint holds a single-chip posterior but mesh= was "
                "passed; refit with Estimator(mesh=...) to get a row-sharded "
                "model, or restore without mesh")
        self.mesh = None
        self.dist_block_size = None
        self.nystrom_m = None
        k_tt = jnp.asarray(arrs["k_tt_nngp"]) if "k_tt_nngp" in arrs else None
        if "l_block_starts" in meta:
            from nngp_tpu.ops.linalg import BlockLowerTriangular
            starts = [int(s) for s in meta["l_block_starts"]]
            blocks = [jnp.asarray(arrs[f"l_block_{i}"])
                      for i in range(len(starts) - 1)]
            l = BlockLowerTriangular(blocks, starts, starts[-1])
        else:
            l = jnp.asarray(arrs["l"])
        self.posterior = GPPosterior(
            x_train=jnp.asarray(arrs["x_train"]),
            y_train=jnp.asarray(arrs["y_train"]),
            l=l,
            alpha=jnp.asarray(arrs["alpha"]),
            reg=jnp.asarray(arrs["reg"]),
            k_tt_nngp=k_tt,
            spec=self.spec, get=self.kernel_type, diag_reg=self.diag_reg,
            input_scale=float(meta.get("input_scale", 1.0)),
            n_real=(jnp.asarray(int(meta["n_real"]), jnp.int32)
                    if "n_real" in meta else None))
        return self

    def save(self, ckpt_dir: str):
        """Persist Cholesky factor + alpha + encoder stats — the 'model'.
        (A distributed posterior is gathered to host for the npz; restore
        re-shards it over the mesh passed to `restore`.)"""
        os.makedirs(ckpt_dir, exist_ok=True)
        meta = {
            "schema_name": self.schema_name,
            "chunk_size": self.chunk_size,
            "kernel_type": self.kernel_type,
            "diag_reg": self.diag_reg,
            "dtype": np.dtype(self.dtype).name,
            "spec": _spec_to_json(self.spec),
            "stats": [s.to_json() for s in self.stats],
            "chunk_norm": self.chunk_norm,
            # construction-time routing mode: the routed flags themselves
            # are concrete and persisted below; this keeps introspection
            # honest after a restore (a 'best'-built server reports 'best')
            "quality": self.quality,
        }
        if self.feature_scale is not None:
            meta["feature_scale"] = [float(v) for v in self.feature_scale]
        if self.std_scale != 1.0:
            meta["std_scale"] = float(self.std_scale)
        p = self.posterior
        if self.nystrom_m is not None:
            meta["nystrom"] = {
                "num_train": int(p.num_train),
                "input_scale": float(p.input_scale),
                "precision": p.precision,
                "rank_rtol": float(p.rank_rtol),
                "panel_size": int(p.panel_size),
                "finalize": p.finalize,
                "moments": p.moments,
            }
            arrs = dict(
                x_m=np.asarray(p.x_m), w_solve=np.asarray(p.w_solve),
                ic=np.asarray(p.ic), beta_w=np.asarray(p.beta_w),
                reg=np.asarray(p.reg), c_raw=np.asarray(p.c_raw),
                b_w=np.asarray(p.b_w), diag_sum=np.asarray(p.diag_sum),
            )
            if p.yty is not None:
                arrs["yty"] = np.asarray(p.yty)
            if p.m1_w is not None:
                arrs["m1_w"] = np.asarray(p.m1_w)
                arrs["w_kmm"] = np.asarray(p.w_kmm)
            if p.c_lo is not None:
                # df64 moment tails: dropping them on a round-trip would
                # silently downgrade every later extend/forget to fp32
                arrs["c_lo"] = np.asarray(p.c_lo)
                arrs["b_lo"] = np.asarray(p.b_lo)
                if p.m1_lo is not None:
                    arrs["m1_lo"] = np.asarray(p.m1_lo)
            if p.w_solve_lo is not None:
                # df64 whitening-basis tails: dropping them would round
                # the basis to fp32, which breaks deep rank cuts
                # (gp/nystrom.NystromPosterior.w_solve_lo)
                arrs["w_solve_lo"] = np.asarray(p.w_solve_lo)
                if p.w_kmm_lo is not None:
                    arrs["w_kmm_lo"] = np.asarray(p.w_kmm_lo)
        elif self.mesh is not None:
            meta["distributed"] = {"block_size": int(p.block_size),
                                   "axis_name": p.axis_name,
                                   "mesh_size": int(self.mesh.devices.size),
                                   "n_real": int(p.num_train),
                                   "input_scale": float(p.input_scale)}
            arrs = dict(
                x_storage=np.asarray(p.x_storage),
                y_storage=np.asarray(p.y_storage),
                l=np.asarray(p.l), alpha=np.asarray(p.alpha),
                reg=np.asarray(p.reg),
            )
            if p.k_tt is not None:
                arrs["k_tt"] = np.asarray(p.k_tt)
        else:
            # x_train is stored PRE-SCALED; the scale must ride along or a
            # restored posterior would mis-scale every incoming query
            meta["input_scale"] = float(p.input_scale)
            if p.n_real is not None:
                # shape-bucketed posterior (fit_gp pad_to): the real-row
                # count must ride along or the restored posterior would
                # treat inert pad rows as training data (wrong variances)
                meta["n_real"] = int(p.n_real)
            arrs = dict(
                x_train=np.asarray(p.x_train), y_train=np.asarray(p.y_train),
                alpha=np.asarray(p.alpha), reg=np.asarray(p.reg),
            )
            if hasattr(p.l, "blocks"):
                # Column-block factor (>28k fits): persist the blocks as-is —
                # assembling a dense n x n for the npz would reintroduce the
                # very buffer the layout exists to avoid.
                meta["l_block_starts"] = list(p.l.starts)
                for i, blk in enumerate(p.l.blocks):
                    arrs[f"l_block_{i}"] = np.asarray(blk)
            else:
                arrs["l"] = np.asarray(p.l)
            if p.k_tt_nngp is not None:
                arrs["k_tt_nngp"] = np.asarray(p.k_tt_nngp)
        if self._conformal_scores is not None:
            arrs["conformal_scores"] = np.asarray(self._conformal_scores)
        with open(os.path.join(ckpt_dir, "meta.json"), "w") as f:
            json.dump(meta, f)
        np.savez(os.path.join(ckpt_dir, "posterior.npz"), **arrs)

    def load_model(self, verbose: bool = True):
        """Warm-up prediction on the train set (compiles the predict program;
        mirrors `/root/reference/neuroestimator/estimator/estimator.py:37-40`)."""
        x_warm = getattr(self.posterior, "x_train", None)
        if x_warm is None and hasattr(self.posterior, "x_m"):
            # Nystrom tier: warm up on the inducing rows (m x m cross Gram)
            x_warm = self.posterior.x_m
            mean, std = self.posterior.predict_mean_std(x_warm)
        elif x_warm is None:
            # distributed posterior: the (n, n) warm-up cross Gram stays
            # row-sharded (n^2/p per device) — full train set is fine
            x_warm = self.posterior.x_storage
            mean, std = self.posterior.predict_mean_std(x_warm)
        else:
            # chunked predict caps the warm-up cross Gram at chunk x n —
            # a full-train (n, n) pass would reintroduce the dense n^2 the
            # >28k block-factor layout exists to avoid (below one chunk
            # this is identical to the direct call)
            mean, std = self.posterior.predict_mean_std_chunked(x_warm)
        if verbose:
            print(mean.shape, std.shape)
            print("Model construction complete.")

    def _try_fast_encoder(self):
        """Native C++ line parser/encoder for the serving hot path
        (~30-100x the Python encoder); silently unavailable without g++."""
        try:
            from nngp_tpu.native import FastEncoder, is_available
            if is_available():
                return FastEncoder(self.stats)
        except Exception:
            pass
        return None

    def _apply_chunk_norm(self, x: np.ndarray) -> np.ndarray:
        """The native encoder emits bit-exact RAW features; chunk_norm is a
        post-multiply by the encoder's per-slot scale vector (cached — the
        layout is fixed at construction; rebuilding the concat per serving
        batch was measurable hot-path churn)."""
        if self.chunk_norm:
            scale = getattr(self, "_chunk_norm_scale", None)
            if scale is None or scale.dtype != x.dtype:
                scale = self.encoder.col_scale.astype(x.dtype)
                self._chunk_norm_scale = scale
            x = x * scale
        return x

    def _apply_feature_scale(self, x: np.ndarray) -> np.ndarray:
        """ARD: the kernel was learned (and the posterior fitted) on
        x * feature_scale — EVERY encoded query must get the same scaling
        or its cross-Gram meets the factor in the wrong geometry."""
        if self.feature_scale is None:
            return x
        return x * self.feature_scale.astype(x.dtype)

    def encode_lines(self, query_lines: Sequence[str]) -> np.ndarray:
        if self._fast is not None:
            x, *_ = self._fast.encode_multi("\n".join(query_lines),
                                            with_card=False, dtype=self.dtype)
            return self._apply_feature_scale(self._apply_chunk_norm(x))
        parsed = [self.encoder.parse_line_without_card(l) for l in query_lines
                  if l.strip()]
        return self._apply_feature_scale(
            self.encoder.encode_batch(parsed, dtype=self.dtype))

    def _encode_labeled_lines(self, labeled_lines, op_name: str):
        """Shared parse/encode for the online-learning surfaces: labeled
        `query@...@card` lines -> (x, cards), card >= 1 enforced."""
        if self._fast is not None:
            x, cards, *_ = self._fast.encode_multi("\n".join(labeled_lines),
                                                   with_card=True,
                                                   dtype=self.dtype)
            x = self._apply_chunk_norm(x)
        else:
            parsed, cards = [], []
            for line in labeled_lines:
                if not line.strip():
                    continue
                tids, preds, joins, card = self.encoder.parse_line(line)
                parsed.append((tids, preds, joins))
                cards.append(card)
            x = self.encoder.encode_batch(parsed, dtype=self.dtype)
            cards = np.asarray(cards, dtype=np.float64)
        if np.any(cards < 1):
            raise ValueError(f"{op_name} requires card >= 1 on every "
                             "labeled line (log2 of 0 is -inf)")
        return self._apply_feature_scale(x), cards

    def _guard_feature_magnitude(self, x: np.ndarray, op_name: str):
        """A factor fitted through __init__ uses the encoder's layout
        bound, which covers ANY encodable line; a restored checkpoint from
        an older data-probed fit may carry a smaller input_scale. Guard
        here (x is host numpy — free) instead of letting oversized fp32
        features overflow the cross Gram into a NaN factor."""
        scale = float(self.posterior.input_scale)
        if (x.dtype == np.float32 and x.size
                and float(np.max(np.abs(x))) / max(scale, 1.0)
                > _EXTEND_MAX_SCALED_ABS):
            raise ValueError(
                f"{op_name}: new features exceed the magnitude the "
                f"posterior was fitted for (input_scale={scale:g}); the "
                "factor cannot be rescaled in place — refit (a fresh "
                "Estimator picks a covering scale from the encoder layout)")

    def _install_posterior(self, candidate):
        """Validate BEFORE installing so a bad batch cannot corrupt a live
        server — the old posterior stays authoritative on failure."""
        old = self.posterior
        try:
            self.posterior = candidate
            self._validate_fit()
        except FloatingPointError:
            self.posterior = old
            raise

    def extend_with_lines(self, labeled_lines: Sequence[str]):
        """Online learning: fold freshly-labeled queries (the aux-feedback
        loop's `query@...@card` lines) into the posterior with an O(n^2 k)
        block-Cholesky extension — no CSVs, no refit, no restart. The
        reference can only retrain from scratch with a new Estimator
        (SURVEY.md section 3.3)."""
        x, cards = self._encode_labeled_lines(labeled_lines,
                                              "extend_with_lines")
        self._guard_feature_magnitude(x, "extend_with_lines")
        y = np.log2(cards).reshape(-1, 1).astype(self.dtype)
        # Both regimes extend incrementally: single-chip via the block-
        # Cholesky append, a mesh via the distributed block-cyclic append
        # (O(n^2 k / p) — no refit, no restart).
        if (isinstance(self.posterior, GPPosterior)
                and self.posterior.n_real is not None):
            # padded posterior: bucket the batch to a power-of-two inert-
            # padded in-place append — no fresh-shape compile mid-traffic.
            # (isinstance: DistributedPosterior also carries an n_real
            # attribute, but pads internally with its own layout)
            cand = self.posterior.extend(jnp.asarray(x), jnp.asarray(y),
                                         bucket=64)
        else:
            cand = self.posterior.extend(jnp.asarray(x), jnp.asarray(y))
        self._install_posterior(cand)
        return x.shape[0]

    def forget_with_lines(self, labeled_lines: Sequence[str]):
        """Online FORGETTING (Nystrom tier only): remove previously-
        incorporated labeled queries — expired feedback, sliding-window
        serving — by exact moment subtraction (`NystromPosterior.forget`,
        O(s m^2 + m^3)). Lines must be the same query@...@card lines that
        were trained/extended in. The exact tier refuses: a Cholesky
        downdate is unstable at this conditioning, refit instead (the
        reference refits for ANY change)."""
        if not hasattr(self.posterior, "forget"):
            raise NotImplementedError(
                "forget_with_lines requires the streaming Nystrom tier "
                "(Estimator(nystrom_m=...)); the exact factor has no "
                "stable downdate — refit a fresh Estimator instead")
        x, cards = self._encode_labeled_lines(labeled_lines,
                                              "forget_with_lines")
        y = np.log2(cards).reshape(-1, 1).astype(self.dtype)
        self._install_posterior(self.posterior.forget(x, y))
        return x.shape[0]

    def grow_inducing(self, labeled_lines: Sequence[str],
                      num_new: int = 512, seed: int = 0) -> int:
        """Grow the Nystrom tier's CAPACITY (Nystrom tier only): enlarge
        the inducing set by `num_new` uniform rows of `labeled_lines` and
        refit on exactly those lines (`NystromPosterior.grow_inducing`,
        O(n (m+s)^2) streamed — growth changes the whitening basis, so
        unlike `extend_with_lines` it needs the full training log back;
        pass the same lines the server was trained + extended with).

        When to grow: online extends hold m fixed while n grows, and once
        m/n gets small the approximation gap is the error floor — measured
        at 90k rows, growing m 512 -> 1024 recovers ~90% of a fresh
        refit's gain where fixed-m extends recover none (BASELINE.md,
        experiments/nystrom_grow_big.log). `posterior.elbo()` (monotone in
        the inducing set) is the principled trigger. Transactional:
        on a NaN factor the previous posterior stays authoritative.
        Returns the new inducing count."""
        if not hasattr(self.posterior, "grow_inducing"):
            raise NotImplementedError(
                "grow_inducing requires the streaming Nystrom tier "
                "(Estimator(nystrom_m=...)); the exact tier has no "
                "inducing set — its capacity is n itself")
        x, cards = self._encode_labeled_lines(labeled_lines,
                                              "grow_inducing")
        self._guard_feature_magnitude(x, "grow_inducing")
        y = np.log2(cards).reshape(-1, 1).astype(self.dtype)
        rng = np.random.default_rng(seed)
        pick = rng.choice(x.shape[0], size=min(num_new, x.shape[0]),
                          replace=False)
        self._install_posterior(self.posterior.grow_inducing(x[pick], x, y))
        self.nystrom_m = self.posterior.num_inducing
        return self.posterior.num_inducing

    def _bucketed_predict(self, x: np.ndarray):
        """(mean, std) with the batch padded to a power-of-two bucket
        (min 64, last row tiled) so varying batch sizes reuse compiled
        programs — the ONE place the serving bucketing policy lives."""
        n = x.shape[0]
        bucket = max(64, 1 << (n - 1).bit_length())
        if n < bucket:
            x = np.concatenate([x, np.tile(x[-1:], (bucket - n, 1))],
                               axis=0)
        mean, std = self.posterior.predict_mean_std(jnp.asarray(x))
        # ONE device->host transfer: on the tunneled TPU every blocking
        # fetch is a ~28 ms serialized roundtrip, so materializing mean and
        # std separately doubles the serving batch's fixed cost (measured,
        # experiments/stream_tpu_profile.log). The stack is dispatched
        # asynchronously; only the single np.asarray blocks.
        ms = np.asarray(jnp.stack([jnp.ravel(mean), jnp.ravel(std)]))
        return ms[0, :n], ms[1, :n]

    def _feature_dim(self) -> int:
        """Encoded feature width of the fitted posterior, whatever the tier
        (exact: x_train; Nystrom: x_m inducing rows; distributed:
        x_storage)."""
        p = self.posterior
        for attr in ("x_train", "x_m", "x_storage"):
            xa = getattr(p, attr, None)
            if xa is not None:
                return int(xa.shape[-1])
        raise AttributeError(
            "posterior exposes none of x_train/x_m/x_storage")

    def warmup(self, max_batch: int = 4096, verbose: bool = True) -> list:
        """Pre-compile every serving bucket shape up to `max_batch`.

        The FIRST batch at each power-of-two bucket pays a jit compile
        (seconds to minutes behind a remote-TPU tunnel) plus a cold
        host->device transfer program (~1.4 s measured,
        experiments/stream_tpu_profile.log) — mid-traffic that is an SLO
        breach, not a warmup. Run once after fit/restore (`serve_demo
        --listen` does it before accepting connections). Synthetic rows go
        straight through `_bucketed_predict`, so the prediction memo, the
        drift monitor and the posterior itself are untouched.

        Returns the list of bucket sizes warmed.
        """
        d = self._feature_dim()
        buckets, b = [], 64
        while b <= max_batch:
            buckets.append(b)
            b *= 2
        for b in buckets:
            t0 = time.perf_counter()
            # benign non-zero rows: zero vectors have zero norm, which
            # exercises the acos(rho) edge instead of the serving path.
            # dtype MUST match the serving tier's — jit programs are keyed
            # on input dtype, so a float32 probe warms nothing for an fp64
            # estimator (verified: the fp64 batch recompiled from scratch)
            self._bucketed_predict(np.ones((b, d), dtype=self.dtype))
            if verbose:
                print(f"warmup: bucket {b} ready "
                      f"({time.perf_counter() - t0:.1f} s)")
        return buckets

    def _predict_raw(self, query_lines: Sequence[str]):
        """Bucketed batch predict returning the posterior's OWN std (no
        recalibration applied) — the base for predict/predict_interval.

        Duplicate lines are predicted ONCE: the batch is deduped before
        encoding, and results persist in a bounded memo keyed by the query
        text (PostgreSQL plan enumeration re-submits the same sub-queries
        across plan candidates — the reference re-predicts every repeat,
        `/root/reference/neuroestimator/estimator/estimator.py:42`). The
        memo holds RAW posterior values so later `calibrate_uncertainty`
        reruns rescale cached entries too; any posterior change clears it
        (see the `posterior` setter)."""
        # One result PER LINE is the contract: both encoders silently skip
        # blank lines, which would positionally misalign every later
        # client's prediction — fail loudly instead.
        keys = []
        for i, line in enumerate(query_lines):
            k = line.strip()
            if not k:
                raise ValueError(f"blank query line at index {i}")
            keys.append(k)
        cache = self._pred_cache
        fresh = {}  # this call's results (also the cap=0 dedup surface)
        need, seen = [], set()
        for k in keys:
            if k in cache:
                cache.move_to_end(k)  # keep hot serving queries resident
            elif k not in seen:
                seen.add(k)
                need.append(k)
        if need:
            mean, std = self._bucketed_predict(self.encode_lines(need))
            fresh = dict(zip(need, zip(mean, std)))
        pairs = [fresh[k] if k in fresh else cache[k] for k in keys]
        cap = self.predict_cache_size
        if cap > 0:
            cache.update(fresh)
            while len(cache) > cap:
                cache.popitem(last=False)
        out = np.asarray(pairs, dtype=self.dtype)
        return out[:, 0].copy(), out[:, 1].copy()

    def predict(self, query_lines: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        """(pred_mean, pred_std) in log2-card space, one entry per line.

        Batch sizes are bucketed to powers of two (min 64) so PostgreSQL
        plans with varying sub-query counts reuse compiled programs instead
        of recompiling per shape (compiles cost seconds-to-minutes on a
        remote TPU; padding rows cost microseconds).

        std is multiplied by the recalibration scale fitted by
        `calibrate_uncertainty` (1.0 until then) — downstream consumers
        (the coef_var aux threshold, confidence intervals) see calibrated
        uncertainty."""
        mean, std = self._predict_raw(query_lines)
        if self.std_scale != 1.0:
            std = std * self.std_scale
        return mean, std

    def calibrate_uncertainty(self, labeled_lines: Sequence[str],
                              verbose: bool = True) -> float:
        """Post-hoc uncertainty calibration on HELD-OUT labeled lines
        (`query@...@card`, e.g. the serving feedback log — lines the
        posterior was NOT trained on, or the guarantees are void).

        Two artifacts, both checkpointed:
          * a closed-form MLE std scale (`eval.calibration.fit_std_scale`)
            applied to every later `predict` std;
          * the split-conformal score set enabling `predict_interval` —
            distribution-free >= 1-alpha coverage per query.

        Re-run after large online extends or `relearn_hyperparams` (the
        posterior moved, so the residual geometry did too). Returns the
        fitted std scale. The reference only PLOTS calibration
        (`/root/reference/util.py:296-313`); it cannot repair it."""
        x, cards = self._encode_labeled_lines(labeled_lines,
                                              "calibrate_uncertainty")
        return self._calibrate_arrays(x, np.log2(cards), verbose,
                                      source="held-out lines")

    def _calibrate_arrays(self, x, y, verbose: bool, source: str) -> float:
        """Shared core of `calibrate_uncertainty` and the constructor's
        `calibrate_frac` holdout: x must already be on the serving feature
        surface (chunk_norm + ARD scale applied); y in log2-card space.
        Fits the MLE std temperature and the conformal score set from the
        RAW posterior std (std_scale deliberately not applied twice)."""
        from nngp_tpu.eval.calibration import conformal_scores, fit_std_scale
        mean, std = self._bucketed_predict(x)
        self.std_scale = fit_std_scale(y, mean, std)
        self._conformal_scores = conformal_scores(y, mean, std)
        if verbose:
            print(f"calibrated on {x.shape[0]} {source}: std_scale="
                  f"{self.std_scale:.4f}")
        return self.std_scale

    def predict_interval(self, query_lines: Sequence[str],
                         alpha: float = 0.1):
        """(mean, lo, hi) in log2-card space: split-conformal central
        intervals with finite-sample >= 1-alpha coverage for exchangeable
        queries (no Gaussianity assumed — the score is |y-mu|/std on the
        calibration set from `calibrate_uncertainty`, so harder queries get
        proportionally wider intervals). Cardinality bounds are
        2**lo .. 2**hi. Returns inf-wide intervals when the calibration set
        is too small for the requested alpha (needs >= ceil(1/alpha)-ish
        lines) rather than pretending."""
        if self._conformal_scores is None:
            raise ValueError(
                "predict_interval requires calibrate_uncertainty(labeled_"
                "lines) first (held-out lines, e.g. the feedback log)")
        from nngp_tpu.eval.calibration import conformal_quantile
        qhat = conformal_quantile(self._conformal_scores, alpha)
        mean, std = self._predict_raw(query_lines)
        return mean, mean - qhat * std, mean + qhat * std

    def record_feedback(self, labeled_lines: Sequence[str]):
        """Fold freshly-labeled serving feedback (`query@...@card` lines,
        e.g. `build_aux_file` output) into the workload-drift monitor and
        return a `serve.drift.DriftReport` saying whether the model still
        explains the live workload — and, if not, WHICH remediation is
        measured to help this tier (BASELINE.md round-3g):

          exact/distributed tier -> 'relearn_hyperparams'
          Nystrom tier           -> 'grow_inducing'

        This only OBSERVES — remediation (and the routine
        `extend_with_lines` of the same labels) stays with the caller, who
        should `est.drift_monitor.reset()` after acting so the detector
        evaluates the new posterior from scratch. The reference's loop has
        no drift signal at all: its aux tool thresholds single-query
        q-error offline (`/root/reference/neuroestimator/
        merge_subquery_card.py:56-58`)."""
        from nngp_tpu.serve.drift import DriftMonitor, DriftReport
        if getattr(self, "drift_monitor", None) is None:
            self.drift_monitor = DriftMonitor()
        x, cards = self._encode_labeled_lines(labeled_lines,
                                              "record_feedback")
        y = np.log2(cards)
        mean, std = self._bucketed_predict(x)
        std = np.maximum(std * self.std_scale, self.drift_monitor.std_floor)
        abs_z = np.abs(y - mean) / std
        drift = self.drift_monitor.update(abs_z)
        action = None
        if drift:
            action = ("grow_inducing"
                      if hasattr(self.posterior, "grow_inducing")
                      else "relearn_hyperparams")
        q = np.exp2(np.abs(y - mean))  # symmetric q-error in card space
        return DriftReport(
            drift=drift, action=action,
            mean_abs_z=float(np.mean(abs_z)),
            median_q_error=float(np.median(q)),
            n_observed=self.drift_monitor.n,
            ph_stat=self.drift_monitor.stat,
            threshold=self.drift_monitor.threshold)
