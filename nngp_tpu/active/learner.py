"""Posterior-variance active learning.

Parity surface of `/root/reference/active/ActiveLearner.py:14-77`: each round
predicts the unlabeled pool, normalizes std by max(mean) (coefficient of
variation, `:47`), selects `budget` points either by biased sampling with
probability proportional to normalized std (`jax.random.choice(p=std_prob)`,
`:52-53`) or by top-k std (`:54`), merges them into the train set and refits.

TPU-native differences:
  - selection math is jitted on device (no host round-trip of the pool);
  - the refit uses `GPPosterior.extend` — an O(n^2 k) block-Cholesky append —
    instead of the reference's full O(n^3) refit per round (SURVEY.md
    section 3.2 "nothing incremental"). `refit='full'` restores the exact
    reference behavior (fresh relative ridge each round);
  - `mesh=` runs the whole loop over a device mesh with the row-sharded
    posterior (`parallel.distributed_fit`) — active learning keeps working
    when the train Gram outgrows one chip, and acquisition rounds stay
    incremental there too (`DistributedPosterior.extend`, O(n^2 k / p)
    instead of the O(n^3/p) refit).
"""

import numpy as np

import jax
import jax.numpy as jnp

from nngp_tpu.eval.qerror import PredictionStatistics
from nngp_tpu.gp import GPPosterior, fit_gp
from nngp_tpu.models.kernel_spec import KernelSpec


@jax.jit
def _pool_cov_scaled(post, x_pool):
    """(mean, cov) of the pool in the posterior's SCALED units — one
    compiled dispatch (posteriors are pytrees). Greedy selection only
    compares variances, so the raw-unit prescale compensation (which can
    overflow fp32 at the 2^64 packed-categorical scale) is skipped."""
    return post._predict_scaled(x_pool, True)


class ActiveLearner:
    def __init__(self, spec: KernelSpec, budget: int = 1000,
                 active_iters: int = 3, kernel_type: str = "nngp",
                 biased_sample: bool = True, diag_reg: float = 1e-3,
                 refit: str = None, seed: int = 10,
                 mesh=None, dist_block_size=None, input_scale=None,
                 nystrom_m=None, nystrom_grow: int = 0,
                 nystrom_moments: str = "fp32", relearn_hyper=None,
                 hyper_warm_steps: int = 40, hyper_points=2048,
                 hyper_ard: bool = False, selection: str = None,
                 partition_keys: str = "num_predicates",
                 pad_acquisitions: bool = False):
        """mesh: optional jax.sharding.Mesh — fit/predict with the
        row-sharded distributed posterior. Any train-set / selection size
        works (the distributed layout pads with inert rows). refit defaults
        to 'incremental' in BOTH regimes: single-chip uses the block-
        Cholesky append, a mesh uses the distributed block-cyclic append
        (`DistributedPosterior.extend`, O(n^2 k / p) per round).

        input_scale: optional pinned fp32 feature prescale, e.g.
        `gp.posterior.input_scale_for_bound(encoder.max_abs_bound(), ...)`
        — skips the per-refit data probe (a blocking device fetch when the
        pools live on device) and guarantees every later acquisition fits
        the factor's scale.

        nystrom_m: run the loop on the streaming Nystrom/DTC tier
        (gp/nystrom.py) with this many inducing rows — O(m^2) device state
        at any pool/train size, and acquisition rounds extend EXACTLY for
        that model class (moments are row sums). With mesh, the moment
        panels shard across chips.

        nystrom_moments: 'fp32' (default) or 'df64' — the emulated-fp64
        accuracy tier (DF-pair whitening basis + deep rank cut; fp64-
        grade serving from the fp32 pipeline, `gp/nystrom.fit_nystrom`).
        Per-round extends stay df64 through the posterior's moment tails.

        nystrom_grow: with nystrom_m, additionally GROW the inducing set
        by this many rows per acquisition round — a seeded uniform
        subsample of the freshly acquired batch becomes new inducing rows
        and the posterior refits via `NystromPosterior.grow_inducing`
        (O(n (m+s)^2) streamed refit; row-extends alone hold capacity m
        fixed while n grows, so the approximation gap widens over rounds).
        Uniform-within-the-batch matches the acquisition density the new
        labels follow (uniform beat trace-optimal rpchol on predictive
        q-error for the same reason, gp/nystrom.py).

        relearn_hyper: RE-learn the kernel hyperparameters after every
        acquisition round, warm-started from the previous optimum
        (`gp.hyperopt`, `hyper_warm_steps` Adam steps, no restarts), then
        full-refit with the new spec — std-driven acquisition shifts the
        train distribution, so the evidence optimum moves (measured on
        forest fp64: relearn 5.27/5.10/4.92 val MSE vs learn-once
        5.45/5.24/5.08, experiments/hyper_active_relearn.log). Pass the
        initial `HyperoptResult` (recommended: its spec/ridge seed the
        loop), or True to cold-learn on the first train split inside
        `active_train`. Inputs to train/select/test stay RAW — the learner
        applies the current learned feature scale itself (each relearn may
        produce a new ARD scale). `refit` is ignored on relearn rounds
        (a changed kernel cannot extend an old factor). Measured: relearn
        wins on the EXACT tier (forest) but LOSES to learn-once + moment
        extends on the Nystrom tier (synth6, BASELINE.md) — prefer
        learn_hyper-once when nystrom_m is set.

        selection: acquisition rule — 'biased' / 'topk' are the
        reference's two independent-scoring rules (default: 'biased' when
        biased_sample else 'topk'); 'greedy' is batch-diverse greedy
        conditional-variance selection (`active/greedy.py`: partial
        pivoted Cholesky of the pool posterior covariance with fantasy
        noise conditioning — exact sequential uncertainty reduction for
        get='nngp'). Works on every tier: single-chip, Nystrom (low-rank
        covariance, composes with a mesh), and the row-sharded exact tier
        (`DistributedPosterior.predict(compute_cov=True)` assembles the
        (P, P) pool covariance from sharded contractions). Pools beyond
        GREEDY_POOL_MAX are pre-filtered to the top-M marginal-variance
        slice before the O(k M^2) greedy loop.

        pad_acquisitions: SHAPE-STABLE acquisition rounds (single-chip
        exact nngp tier only): the initial fit pads its storage to
        n0 + budget * active_iters inert rows (`fit_gp(pad_to=...)`), so
        incremental extends and the per-round pool/val predicts reuse ONE
        compiled program instead of compiling a fresh train shape per
        round (30-300 s each through a remote-TPU tunnel; measured
        dominating the round cost in experiments/active_relearn_tpu.log).
        Composes with relearn_hyper: single-chip relearn rounds use the
        traced-hyperparameter fit (learned constants as jit operands, the
        structure spec fixed), so relearn + pad_acquisitions loops compile
        every program exactly ONCE (asserted in
        test_spec_params_programs_stable_across_values)."""
        if refit is None:
            refit = "incremental"
        if refit not in ("incremental", "full"):
            raise ValueError("refit must be 'incremental' or 'full'")
        if selection is None:
            selection = "biased" if biased_sample else "topk"
        if selection not in ("biased", "topk", "greedy"):
            raise ValueError("selection must be 'biased', 'topk' or "
                             "'greedy'")
        self.selection = selection
        self.spec = spec
        self.budget = budget
        self.active_iters = active_iters
        self.kernel_type = kernel_type
        self.biased_sample = biased_sample
        self.diag_reg = diag_reg
        self.refit = refit
        self.mesh = mesh
        self.dist_block_size = dist_block_size
        self.input_scale = input_scale
        self.nystrom_m = nystrom_m
        self.nystrom_moments = nystrom_moments
        if nystrom_grow and nystrom_m is None:
            raise ValueError("nystrom_grow requires nystrom_m")
        if nystrom_grow and refit == "full":
            raise ValueError(
                "nystrom_grow needs refit='incremental': a full refit "
                "rebuilds the inducing set at the original nystrom_m each "
                "round, silently discarding the growth")
        if nystrom_grow and relearn_hyper:
            raise ValueError(
                "nystrom_grow is incompatible with relearn_hyper: relearn "
                "rounds full-refit with the new kernel at the original "
                "nystrom_m, silently discarding the growth (and relearning "
                "measurably loses on this tier anyway — BASELINE.md)")
        if pad_acquisitions and (nystrom_m is not None or mesh is not None
                                 or kernel_type != "nngp"):
            raise ValueError(
                "pad_acquisitions is the single-chip exact-nngp shape-"
                "stability feature (fit_gp pad_to); the Nystrom tier is "
                "already shape-stable (O(m^2) state) and the distributed "
                "tier pads internally")
        self.pad_acquisitions = bool(pad_acquisitions)
        self._pad_to = None          # set per active_train run
        self.nystrom_grow = int(nystrom_grow)
        self._grow_rng = np.random.default_rng(seed)
        self.relearn = relearn_hyper is not None and relearn_hyper is not False
        # Single-chip exact relearn loops run TRACED-hyperparameter fits
        # (`fit_gp(spec_params=...)`): the structure spec is FIXED at the
        # first learn and later rounds pass the learned Dense stds as jit
        # OPERANDS, so fit/predict/extend programs compile once per
        # structure+shape instead of per learned constants (with
        # pad_acquisitions the whole loop is compile-once). The Nystrom /
        # distributed tiers take static specs, so they keep concrete specs.
        self._use_traced_hypers = (self.relearn and nystrom_m is None
                                   and mesh is None)
        self._structure_spec = None
        self._spec_params = None
        # the current HyperoptResult (None until the cold learn when
        # relearn_hyper=True was passed instead of a result)
        self._hyper = relearn_hyper if self.relearn and \
            relearn_hyper is not True else None
        if self._hyper is not None:
            self._adopt_hyper(self._hyper)
        self.hyper_warm_steps = hyper_warm_steps
        self.hyper_points = hyper_points
        self.hyper_ard = hyper_ard
        self.key = jax.random.PRNGKey(seed)
        self.partition_keys = partition_keys
        self.pred_stat = PredictionStatistics()

    # -- per-round hyperparameter relearning ------------------------------

    def _adopt_hyper(self, res):
        """Point the learner at a HyperoptResult's spec/ridge/prescale."""
        self._hyper = res
        kw = res.fit_kwargs()
        self.diag_reg = kw["diag_reg"]
        if "input_scale" in kw:          # b != 0: prescale shortcut off
            self.input_scale = kw["input_scale"]
        if self._use_traced_hypers:
            if self._structure_spec is None:
                self._structure_spec = res.spec   # first learn fixes it
            self.spec = self._structure_spec     # values ride as operands
            self._spec_params = res.spec_params()
        else:
            self.spec = res.spec

    def _hscale(self, x):
        """Apply the CURRENT learned ARD feature scale (identity unless a
        relearn produced one). Only active in relearn mode, where the
        caller hands the learner raw features."""
        if self._hyper is None or self._hyper.feature_scale is None:
            return x
        return self._hyper.scale_inputs(x)

    def _relearn_step(self, x_train, y_train):
        """Cold multi-start learn the first time, warm single-start after."""
        from nngp_tpu.gp.hyperopt import fit_kernel_hyperparams
        from nngp_tpu.models.kernel_spec import Activation, Dense
        objective = "dtc" if self.nystrom_m is not None else "exact"
        acts = [l for l in self.spec.layers if isinstance(l, Activation)]
        kw = dict(get=self.kernel_type, max_points=self.hyper_points,
                  depth=max(len(acts), 1),
                  activation=acts[0].name if acts else "relu",
                  width=next(l.width for l in self.spec.layers
                             if isinstance(l, Dense)),
                  objective=objective,
                  dtc_m=min(512, self.nystrom_m or 512),
                  mesh=self.mesh if objective == "dtc" else None)
        prev = self._hyper
        if prev is None:                 # cold start: full restarts
            res = fit_kernel_hyperparams(x_train, y_train,
                                         ard=self.hyper_ard, **kw)
        else:
            res = fit_kernel_hyperparams(
                x_train, y_train, steps=self.hyper_warm_steps,
                init=(prev.w0, prev.w, prev.b, prev.diag_reg),
                reg_restarts=(), ard=prev.feature_scale is not None,
                init_feature_scale=prev.feature_scale, **kw)
        self._adopt_hyper(res)
        return res

    def train(self, x_train, y_train) -> GPPosterior:
        x_train = self._hscale(x_train)
        if self.nystrom_m is not None:
            from nngp_tpu.gp import fit_nystrom
            return fit_nystrom(self.spec, x_train, y_train,
                               num_inducing=self.nystrom_m,
                               diag_reg=self.diag_reg, get=self.kernel_type,
                               input_scale=self.input_scale, mesh=self.mesh,
                               moments=self.nystrom_moments)
        if self.mesh is not None:
            # any n: distributed_fit pads to the layout quantum internally
            from nngp_tpu.parallel import distributed_fit
            return distributed_fit(self.spec, x_train, y_train, self.mesh,
                                   diag_reg=self.diag_reg,
                                   get=self.kernel_type,
                                   block_size=self.dist_block_size,
                                   input_scale=self.input_scale)
        pad_to = None
        if self.pad_acquisitions and self._pad_to is not None:
            pad_to = max(self._pad_to, x_train.shape[0])
        return fit_gp(self.spec, x_train, y_train, diag_reg=self.diag_reg,
                      get=self.kernel_type, input_scale=self.input_scale,
                      pad_to=pad_to, spec_params=self._spec_params)

    def test(self, post: GPPosterior, x_val, y_val, query_infos_val=None,
             printer=print):
        mean, _ = post.predict_mean_std(self._hscale(x_val))
        errors = np.asarray(mean).ravel() - np.asarray(y_val).ravel()
        mse = float(np.mean(errors ** 2))
        if printer:
            printer(f"Test MSE Loss:{mse}")
        self.pred_stat.get_prediction_details(
            errors, query_infos_val, partition_keys=self.partition_keys,
            printer=printer)
        return mse

    # pools larger than this predict in chunks: one (pool, n) or (pool, m)
    # cross Gram would otherwise spike device memory in a selection step
    # that is latency-insensitive anyway
    CHUNKED_POOL_MIN = 32768
    # greedy selection pre-filters pools beyond this to the top-M
    # marginal-variance slice: the (P, P) covariance + the O(k P^2) loop
    # are the cost, and the greedy batch lives inside the high-variance
    # slice anyway (M is also floored at the budget)
    GREEDY_POOL_MAX = 4096

    def _select_greedy(self, post, x_pool, num_select):
        """Batch-diverse greedy conditional-variance acquisition
        (`active/greedy.py`). x_pool is already hyper-scaled."""
        from nngp_tpu.active.greedy import greedy_variance_select
        pre = None
        # 2x headroom over the budget: pre-filtering to EXACTLY the budget
        # would force greedy to take the whole slice — top-k in disguise,
        # after paying for the covariance
        cap = max(self.GREEDY_POOL_MAX, 2 * num_select)
        if x_pool.shape[0] > cap:
            if x_pool.shape[0] > self.CHUNKED_POOL_MIN:
                _, std = post.predict_mean_std_chunked(np.asarray(x_pool))
            else:
                _, std = post.predict_mean_std(x_pool)
            pre = jnp.argsort(jnp.asarray(std))[-cap:]
            x_pool = x_pool[pre]
        num_pool = x_pool.shape[0]
        if num_select >= num_pool:
            # everything gets selected — conditioning can only reorder
            idx = jnp.arange(num_pool, dtype=jnp.int32)
            return pre if pre is not None else idx
        # zero-pad the slice to a power-of-two bucket: the pool shrinks
        # by `budget` every round, and an exact-shape covariance program
        # would recompile each time (30-300 s per compile on the tunnel);
        # pad rows are masked out of the selection via num_valid
        bucket = max(256, 1 << (num_pool - 1).bit_length())
        if bucket > num_pool:
            x_pad = jnp.concatenate(
                [x_pool, jnp.broadcast_to(x_pool[:1],
                                          (bucket - num_pool,
                                           x_pool.shape[1]))])
        else:
            x_pad = x_pool
        # select on the SCALED-unit covariance (prescale^2 below raw
        # units): greedy pivots are invariant to a uniform positive
        # scaling, and the raw-unit compensation can overflow fp32 at the
        # 2^64 packed-categorical prescale (raw VARIANCE exceeds fp32
        # range — same reason predict_mean_std compensates after the sqrt)
        _, cov = _pool_cov_scaled(post, x_pad)
        # fantasy observation noise = the fit's effective ridge (already
        # in scaled units, like the factor it regularized)
        idx = greedy_variance_select(cov, num_select, post.reg,
                                     num_valid=num_pool)
        return pre[idx] if pre is not None else idx

    def select(self, post: GPPosterior, x_pool):
        """Acquisition indices into the pool (device-side)."""
        x_pool = self._hscale(x_pool)
        num_pool = x_pool.shape[0]
        # no mesh-quantum snapping: the distributed layout pads with inert
        # rows, so the full budget is acquired in every regime
        num_select = min(self.budget, num_pool)
        if num_select <= 0:
            # explicit empty selection — argsort(std)[-0:] would silently
            # return the WHOLE pool (slice [-0:] == [0:])
            return jnp.zeros((0,), dtype=jnp.int32)
        if self.selection == "greedy":
            return self._select_greedy(post, x_pool, num_select)
        if num_pool > self.CHUNKED_POOL_MIN:
            mean, std = post.predict_mean_std_chunked(np.asarray(x_pool))
            mean, std = jnp.asarray(mean), jnp.asarray(std)
        else:
            mean, std = post.predict_mean_std(x_pool)
        # coefficient-of-variation normalization (`ActiveLearner.py:47`)
        std = std / jnp.max(mean)
        if self.selection == "biased":
            # guard: an all-zero/underflowed std pool would give 0/0 = NaN
            # probabilities, and jax.random.choice does no p validation on
            # device — fall back to uniform instead of silently selecting
            # garbage indices
            std = jnp.nan_to_num(std)
            total = jnp.sum(std)
            std_prob = jnp.where(total > 0, std / total,
                                 1.0 / std.shape[0])
            self.key, sub = jax.random.split(self.key)
            indices = jax.random.choice(sub, num_pool, shape=(num_select,),
                                        replace=False, p=std_prob)
        else:
            indices = jnp.argsort(std)[-num_select:]
        return indices

    @staticmethod
    def merge_data(select_indices, x_train, y_train, x_pool, y_pool):
        sel = np.asarray(select_indices)
        x_delta, y_delta = x_pool[sel], y_pool[sel]
        keep = np.setdiff1d(np.arange(x_pool.shape[0]), sel)
        return (jnp.concatenate([x_train, x_delta]),
                jnp.concatenate([y_train, y_delta]),
                x_pool[keep], y_pool[keep], x_delta, y_delta)

    def active_train(self, x_train, y_train, x_pool, y_pool, x_val, y_val,
                     query_infos_val=None, printer=print):
        x_train, y_train = jnp.asarray(x_train), jnp.asarray(y_train)
        x_pool, y_pool = jnp.asarray(x_pool), jnp.asarray(y_pool)
        x_val, y_val = jnp.asarray(x_val), jnp.asarray(y_val)
        if self.pad_acquisitions:
            # one storage size covers the whole run: every round's fit /
            # extend / predict program is compiled exactly once
            self._pad_to = int(x_train.shape[0]
                               + self.budget * self.active_iters)
        if printer:
            printer(f"# Initial Training samples: {x_train.shape[0]}")
        if self.relearn and self._hyper is None:
            # relearn_hyper=True without an initial result: cold-learn on
            # the initial train split (multi-start; later rounds warm-start)
            res = self._relearn_step(x_train, y_train)
            if printer:
                printer(f"learned hyperparameters: w0={res.w0:.4f} "
                        f"w={res.w:.4f} b={res.b:.4f} "
                        f"diag_reg={res.diag_reg:.3e}")
        post = self.train(x_train, y_train)
        self.test(post, x_val, y_val, query_infos_val, printer)
        history = []
        for i in range(self.active_iters):
            if x_pool.shape[0] == 0:
                break
            select = self.select(post, x_pool)
            if select.shape[0] == 0:
                break
            if printer:
                printer(f"Active Iteration {i}: Selection {select.shape[0]}")
            (x_train, y_train, x_pool, y_pool,
             x_delta, y_delta) = self.merge_data(select, x_train, y_train,
                                                 x_pool, y_pool)
            if printer:
                printer(f"# Training samples: {x_train.shape[0]}")
            if self.relearn:
                # the evidence optimum moves as std-driven acquisitions
                # shift the train distribution: warm relearn + full refit
                # (a changed kernel cannot extend the old factor)
                res = self._relearn_step(x_train, y_train)
                if printer:
                    printer(f"relearned: w0={res.w0:.4f} w={res.w:.4f} "
                            f"b={res.b:.4f} diag_reg={res.diag_reg:.3e} "
                            f"logev={res.log_evidence:.1f}")
                post = self.train(x_train, y_train)
            elif self.refit == "incremental":
                if self.nystrom_grow > 0:
                    s = min(self.nystrom_grow, x_delta.shape[0])
                    pick = self._grow_rng.choice(x_delta.shape[0], size=s,
                                                 replace=False)
                    post = post.grow_inducing(
                        np.asarray(self._hscale(x_delta))[pick],
                        self._hscale(x_train), y_train)
                else:
                    post = post.extend(self._hscale(x_delta), y_delta)
            else:
                post = self.train(x_train, y_train)
            mse = self.test(post, x_val, y_val, query_infos_val, printer)
            history.append({"iter": i, "num_train": int(x_train.shape[0]),
                            "val_mse": mse})
        return post, history
