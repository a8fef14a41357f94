"""Exact GP posterior with neural-tangents `gradient_descent_mse_ensemble`
t=infinity semantics.

The reference builds ``predict_fn = nt.predict.gradient_descent_mse_ensemble(
kernel_fn, X_train, Y_train, diag_reg=1e-3)`` and calls
``predict_fn(x_test=..., get='nngp'|'ntk', compute_cov=True)``
(`/root/reference/train.py:171-172,155-159`). At t=infinity those semantics
are:

  get='nngp' (Bayesian NNGP posterior):
      mean = K_*t (K_tt + r I)^-1 Y
      cov  = K_** - K_*t (K_tt + r I)^-1 K_t*
  get='ntk'  (infinite-time gradient-descent ensemble):
      mean = T_*t (T_tt + r I)^-1 Y
      cov  = K_** + T_*t T^-1 K_tt T^-1 T_t*
                  - T_*t T^-1 K_t*  -  K_*t T^-1 T_t*
  with r = diag_reg * mean(diag(solve kernel))   (relative ridge, nt default)

where K is the NNGP kernel and T (Theta) the NTK, and T^-1 abbreviates
(T_tt + r I)^-1.

TPU-first design: fit factorizes the train Gram once with on-device Cholesky;
the factor L and alpha = (K + rI)^-1 Y are device-resident state (this pair
*is* the model checkpoint — see `nngp_tpu/serve`). Predictions are a cross
Gram (one MXU matmul + fused recursion) and triangular solves. An incremental
`extend` appends rows via a block Cholesky update — the fast path for active
learning that the reference lacks (it refits from scratch each round,
`/root/reference/active/ActiveLearner.py:67-77`).
"""

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nngp_tpu.models.kernel_spec import (KernelSpec, diag_eval,
                                         kernel_eval, self_kernel_eval,
                                         substitute_dense_params)
from nngp_tpu.ops.linalg import cholesky_append_rows

# Above this size the fit stops using XLA's Cholesky expander (full-width
# masked updates, ~2x flops) in favor of statically-blocked factorizations.
# Below it, plain XLA wins on compile time.
_FUSED_FIT_MIN_N = 4096

# Optional tier within the blocked regime: below this bound the fit builds
# the WHOLE Gram in one fused XLA op and factorizes it with the
# right-looking `ops.linalg.blocked_cholesky`. Settled LOSER (the round-3
# "session disagreement" was wrapper bias, not variance): fit_ab2.log's
# "mono 25% faster" arm compared bare-jit mono against `fit_gp`, whose
# `_auto_input_scale` probe on a committed device array is a ~28 ms
# blocking fetch (78.8 - 28 = 50.8 ms, matching the FAIR fit_ab3.py
# measurement where both arms invoke `_fit_impl`: fused 54.1 vs mono
# 60.0 ms at 10.8k). Default 0 = disabled: the fused panel fit is ~10%
# faster and holds one fewer live n^2 buffer (no resident Gram). The tier
# stays selectable via `_fit_impl(..., mono_max_n=16384)` and
# parity-tested (test_monolithic_tier_matches_plain).
_MONOLITHIC_MAX_N = 0

# Pallas-Gram fit tier (TPU fp32 nngp only): build the lower triangle of
# K + reg I with the fused Mosaic kernel (`ops.gram_pallas`, mirror='lower'
# — strictly-upper tiles are never computed NOR written) and factorize with
# the statically-blocked right-looking Cholesky. Default 0 = DISABLED,
# settled by a FAIR interleaved A/B (pallas_fit_ab3.log: both arms invoke
# `_fit_impl` directly, alternating trial by trial): fused panel fit wins
# 48.2 vs 55.4 ms at 10.8k, 95.1 vs 105.7 at 16.4k, 170.7 vs 195.9 at
# 21.6k (11-15%, every pair disjoint). Earlier A/Bs that showed pallas
# "winning" (pallas_fit.log, pallas_fit_ab2.log) had the fused arm calling
# `fit_gp`, whose `_auto_input_scale` probe on a committed device array
# costs a ~28 ms blocking fetch the pallas arm never paid — never compare
# arms through different wrappers. Tier stays selectable
# (`_fit_impl(..., pallas_max_n=...)`) and parity-tested
# (test_pallas_fit_tier_matches_plain).
_PALLAS_FIT_MAX_N = 0


def _pallas_fit_enabled() -> bool:
    # The Mosaic kernel is fp32/TPU; off-TPU the tier would silently run in
    # interpret mode (Python-speed). Tests monkeypatch this to force the
    # tier on the virtual CPU backend.
    return jax.default_backend() == "tpu"


# Above this size the fused fit keeps the factor as triangular COLUMN BLOCKS
# (`BlockLowerTriangular`) end to end — factor, solves, predict, extend all
# read the blocks — so peak memory is ~n^2/2 and the dense assembly's
# ~1.5 n^2 transient (the round-2 43.2k OOM) never happens. Below it the
# dense in-place layout compiles to fewer HLOs and wins on wall-clock.
_BLOCK_LAYOUT_MIN_N = 28000


def _cholesky(solve_k):
    # Only reached below _FUSED_FIT_MIN_N (larger fits factorize through
    # the fused panel path); XLA's expander is fine at these sizes.
    # `ops.linalg.blocked_cholesky` remains the dense fast path for
    # externally-supplied Grams (e.g. gram_pallas lower-triangle output).
    return jax.lax.linalg.cholesky(solve_k)


def _tri_solve(l, b, transpose=False):
    """Lower-triangular solve, routed to the statically-blocked version at
    large n (XLA's solve expander is latency-bound on wide right-hand
    sides — the predict path's O(n^2 m) hot op). Accepts either a dense
    factor or a `BlockLowerTriangular` (the >28k single-chip form)."""
    from nngp_tpu.ops.linalg import (
        BlockLowerTriangular,
        block_tri_solve_lower,
        block_tri_solve_lower_t,
        blocked_tri_solve_lower,
        blocked_tri_solve_lower_t,
    )
    if isinstance(l, BlockLowerTriangular):
        fn = block_tri_solve_lower_t if transpose else block_tri_solve_lower
        return fn(l, b)
    if l.shape[0] >= _FUSED_FIT_MIN_N:
        fn = blocked_tri_solve_lower_t if transpose else blocked_tri_solve_lower
        return fn(l, b, block_size=1024)
    return jax.lax.linalg.triangular_solve(
        l, b, left_side=True, lower=True, transpose_a=transpose)


def _fused_fit_factor(layers, x, reg, get="nngp", block_size=512,
                      precision=jax.lax.Precision.HIGHEST,
                      block_min_n=None, row_mask=None):
    """L = chol(K_get + reg I) with Gram panels generated on the fly —
    the single-chip large-n fit path (see _FUSED_FIT_MIN_N).

    row_mask: optional (n,) 1/0 inert-padding mask (`fit_gp(pad_to=...)`):
    pad rows/cols are zeroed after the recursion (their feature rows are
    COPIES of a real row, so every kernel value is finite pre-mask) and
    their diagonal is set to 1 — the factor comes out block-diagonal
    [chol(K_real + reg I), I]."""
    from nngp_tpu.models.kernel_spec import (
        apply_diag_recursion,
        apply_recursion,
    )
    from nngp_tpu.ops.gram import input_diag, input_gram
    from nngp_tpu.ops.linalg import fused_panel_cholesky

    n = x.shape[0]
    dvec = input_diag(x)
    diag_nngp, diag_ntk = apply_diag_recursion(dvec, layers)
    diag_solve = diag_nngp if get == "nngp" else diag_ntk

    def panel_fn(s, e):
        k0 = input_gram(x[s:], x[s:e])
        d1 = dvec[s:][:, None]
        d2 = dvec[s:e][None, :]
        nngp, ntk = apply_recursion(k0, jnp.zeros_like(k0), d1, d2,
                                    layers)
        col = nngp if get == "nngp" else ntk
        idx = jnp.arange(e - s)
        if row_mask is not None:
            col = col * (row_mask[s:][:, None] * row_mask[s:e][None, :])
            return col.at[idx, idx].set(
                jnp.where(row_mask[s:e] > 0, diag_solve[s:e] + reg, 1.0))
        # Exact diagonal from the O(n) recursion + fused ridge (the computed
        # diagonal carries sqrt(eps) acos(rho=1) noise, worst for NTK).
        return col.at[idx, idx].set(diag_solve[s:e] + reg)

    if block_min_n is None:
        block_min_n = _BLOCK_LAYOUT_MIN_N
    if n < block_min_n:
        # Fastest form; its ~2-3 n^2 peak fits comfortably here. Panel
        # width stays small: the per-panel update contracts over the
        # FINISHED prefix (large), so wider panels only add serial
        # panel-factor cost (measured: b=512 beats 1024/2048 at both 10.8k
        # and 21.6k, experiments/fit_bsweep.log).
        return fused_panel_cholesky(
            panel_fn, n, x.dtype, layout="inplace", block_size=block_size,
            precision=precision)
    # Memory-lean column blocks kept AS the factor (BlockLowerTriangular):
    # peak stays ~n^2/2 — the dense assembly's 1.5 n^2 transient is what
    # OOMed 43.2k. Panel width: smallest block_size multiple giving ~<=21
    # panels (2048 at 32.4k, 2560 at 43.2k) — measured optimal on the chip.
    # Narrower panels lose MXU rate on the (n-s, b) x (b, b) trailing dots
    # (fp32-HIGHEST: 21.9 TF/s at 2048 vs 3.8 at 512, mxu_panels.log);
    # wider ones (n/14) and fat-contraction merged operands both measured
    # SLOWER (serial panel-factor cost / concat copies — fit_tpu9.log,
    # fit_tpu8.log). The cap also bounds the unrolled HLO count for the
    # remote compiler (~500 big matmuls got it SIGKILLed at 32.4k/b=1024).
    bs = block_size * -(-n // (21 * block_size))
    return fused_panel_cholesky(
        panel_fn, n, x.dtype, layout="blocks", block_size=bs,
        precision=precision)


@jax.jit
def _gauss_mll_terms(diag, y, alpha):
    """(y^T alpha, 2 sum log diag): the two device reductions of the exact
    GP evidence. Standalone on raw arrays so its jit cache keys on SHAPES
    only — every ridge candidate in `select_diag_reg` hits one program."""
    return jnp.sum(y * alpha), 2.0 * jnp.sum(jnp.log(diag))


def chunked_predict(predict_fn, x_test, chunk: int = 8192):
    """Run a (mean, std) batch-predict callable over arbitrarily large test
    sets, `chunk` rows per device dispatch. Tail blocks are padded to the
    chunk shape so every full chunk reuses ONE compiled program (compiles
    cost seconds-to-minutes behind a remote-TPU tunnel). Shared by
    `GPPosterior` and `parallel.DistributedPosterior`.

    Two tunnel-cost rules shape the loop (measured,
    experiments/stream_tpu_profile.log): every blocking fetch is a ~28 ms
    serialized roundtrip, so (a) mean and std are stacked on device and
    materialized in ONE fetch per chunk, and (b) the pipeline keeps ONE
    chunk dispatched ahead of the fetch — dispatch is asynchronous, so
    chunk k+1's device compute overlaps chunk k's fetch, while device
    residency stays bounded at two chunks' inputs + their (2, chunk)
    result stacks (dispatching ALL chunks up front would hold the whole
    padded test set on device — an OOM hazard next to a near-HBM-limit
    factor)."""
    import numpy as np
    from collections import deque
    m = x_test.shape[0]

    def dispatch(s):
        block = jnp.asarray(x_test[s:s + chunk])
        pad = 0
        if block.shape[0] < chunk and s > 0:
            pad = chunk - block.shape[0]
            block = jnp.concatenate(
                [block, jnp.tile(block[-1:], (pad, 1))], axis=0)
        mean, std = predict_fn(block)
        n_keep = chunk - pad if pad else block.shape[0]
        return jnp.stack([jnp.ravel(mean), jnp.ravel(std)]), n_keep

    means, stds = [], []
    inflight: deque = deque()
    for s in range(0, m, chunk):
        inflight.append(dispatch(s))
        if len(inflight) > 2:
            stacked, n_keep = inflight.popleft()
            ms = np.asarray(stacked)
            means.append(ms[0, :n_keep])
            stds.append(ms[1, :n_keep])
    while inflight:
        stacked, n_keep = inflight.popleft()
        ms = np.asarray(stacked)
        means.append(ms[0, :n_keep])
        stds.append(ms[1, :n_keep])
    return np.concatenate(means), np.concatenate(stds)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GPPosterior:
    """Device-resident GP posterior state. A pytree — safe to pass through jit,
    donate, or save/restore (orbax) as the serving checkpoint."""

    x_train: jax.Array          # (n, d)
    y_train: jax.Array          # (n, 1)
    l: jax.Array                # (n, n) lower Cholesky of solve-kernel + r I;
                                # a BlockLowerTriangular above n ~ 28k
    alpha: jax.Array            # (n, 1) (solve-kernel + r I)^-1 Y
    reg: jax.Array              # scalar ridge actually added
    # (n, n) train NNGP Gram, used only by the NTK posterior covariance.
    # None for get='nngp' — and ALSO for large-n NTK fits (>= block
    # threshold), where the covariance recomputes it panel-wise per predict
    # (ops.gram.panel_symm_matmul): O(n^2) memory traded for an O(n^2 d)
    # rebuild that measures <10% of predict time, which is what gives the
    # NTK posterior the same one-live-n^2 footprint (and ~70k single-chip
    # ceiling) as NNGP.
    k_tt_nngp: Optional[jax.Array]
    spec: KernelSpec = dataclasses.field(metadata=dict(static=True))
    get: str = dataclasses.field(metadata=dict(static=True), default="nngp")
    # a DATA leaf (not static): it is bookkeeping — the ridge actually
    # applied is the traced `reg` — and a static float here would key every
    # predict/extend program on the learned ridge VALUE, recompiling each
    # hyperparameter-relearn round (spec_params exists to prevent exactly
    # that). Host code reads it as a plain number either way.
    diag_reg: float = 1e-3
    # Input prescale (fp32 overflow guard): x_train is STORED divided by
    # this power of two, and every incoming x is divided on entry. For
    # scale-equivariant specs (bias-free + 1-homogeneous activations,
    # `kernel_spec.is_scale_equivariant`) the Grams scale by exactly
    # scale^-2, so the posterior mean is invariant and std/cov are
    # multiplied back by scale / scale^2 on exit — the reference runs the
    # raw features in fp64 where e.g. chunk_size=64 factorized categorical
    # slots reach 2^64 (`/root/reference/QuerySampler.py:224-235`); their
    # squared Gram entries overflow fp32, which this removes bit-safely
    # (power-of-two division is exact: mantissas are untouched).
    input_scale: float = dataclasses.field(metadata=dict(static=True),
                                           default=1.0)
    # Shape-bucketed fits (`fit_gp(pad_to=...)`): x_train/y_train/l/alpha are
    # padded to a fixed size with INERT rows (zero kernel row/col, unit
    # factor diagonal, zero y/alpha) and this int32 scalar counts the REAL
    # leading rows. A TRACED data field on purpose: every program stays
    # keyed on the PADDED shapes, so acquisition loops and serving extends
    # reuse one compiled program as n grows (through the remote-TPU tunnel a
    # fresh shape costs a 30-300 s compile; the distributed tier already
    # works this way — `parallel/sharded.py` inert-row padding). None =
    # ordinary exact-shape posterior.
    n_real: Optional[jax.Array] = None
    # Traced kernel hyperparameters ({"w_stds": (n_dense,), "b_stds":
    # (n_dense,)}; `fit_gp(spec_params=...)`). When set, `spec` provides
    # the STRUCTURE only (its Dense std values are ignored) and every
    # kernel evaluation substitutes these values positionally — so a
    # hyperparameter-relearn loop reuses ONE compiled fit/predict/extend
    # program per structure+shape instead of recompiling per learned
    # constants (the spec is a static program key; these are operands).
    spec_params: Optional[dict] = None

    def _eff_layers(self):
        return substitute_dense_params(self.spec.layers, self.spec_params)

    @property
    def num_train(self) -> int:
        """Number of REAL training rows (host int; on a padded posterior
        this fetches the n_real scalar — one device roundtrip)."""
        if self.n_real is None:
            return self.x_train.shape[0]
        return int(self.n_real)

    @property
    def num_padded(self) -> int:
        """Storage rows including inert padding (= num_train when dense)."""
        return self.x_train.shape[0]

    def _row_mask(self):
        """(n,) 1/0 mask of real rows, or None for a dense posterior."""
        if self.n_real is None:
            return None
        return (jnp.arange(self.x_train.shape[0])
                < self.n_real).astype(self.x_train.dtype)

    def _ktt_matmul(self, w):
        """K_tt @ w for the NTK covariance: dense when the train NNGP Gram
        is resident, panel-wise recompute when it is not (large-n fits —
        see the k_tt_nngp field comment)."""
        if self.k_tt_nngp is not None:
            return self.k_tt_nngp @ w
        from nngp_tpu.ops.gram import panel_symm_matmul
        return panel_symm_matmul(self._eff_layers(), self.x_train, w, "nngp")

    # -------------------------------------------------------------- predict
    def _predict_scaled(self, x_test, compute_cov):
        """Predict body in PRESCALED input units: mean is exact raw-space,
        var/cov come back divided by input_scale^2 (the caller compensates).
        Traced inside `predict` / `predict_mean_std` — one dispatch each."""
        if self.input_scale != 1.0:
            x_test = x_test * (1.0 / self.input_scale)
        mask = self._row_mask()
        eff = self._eff_layers()
        if self.get == "nngp":
            cross = kernel_eval(eff, x_test, self.x_train, "nngp")  # (m, n)
            if mask is not None:
                # inert padding: the pad FEATURE rows still produce nonzero
                # kernel values (b > 0 reaches every input) — zero their
                # cross columns so the identity factor block and zero alpha
                # rows see exactly the dense-posterior system
                cross = cross * mask[None, :]
            mean = cross @ self.alpha
            if compute_cov is False:
                return mean
            v = _tri_solve(self.l, cross.T)  # (n, m)
            if compute_cov == "diag":
                var = diag_eval(eff, x_test, "nngp") - jnp.sum(v * v, axis=0)
                return mean, jnp.maximum(var, 0.0)
            k_ss = self_kernel_eval(eff, x_test, "nngp")  # exact diagonal
            return mean, k_ss - v.T @ v

        # get == 'ntk'
        nngp_cross, ntk_cross = kernel_eval(
            eff, x_test, self.x_train, ("nngp", "ntk")
        )
        if mask is not None:
            nngp_cross = nngp_cross * mask[None, :]
            ntk_cross = ntk_cross * mask[None, :]
        mean = ntk_cross @ self.alpha
        if compute_cov is False:
            return mean
        # w = (T + rI)^-1 T_t*  via two triangular solves, shape (n, m)
        u = _tri_solve(self.l, ntk_cross.T)
        w = _tri_solve(self.l, u, transpose=True)
        kw = self._ktt_matmul(w)                     # K_tt T^-1 T_t*, (n, m)
        if compute_cov == "diag":
            var = (
                diag_eval(eff, x_test, "nngp")
                + jnp.sum(w * kw, axis=0)
                - 2.0 * jnp.sum(nngp_cross.T * w, axis=0)
            )
            return mean, jnp.maximum(var, 0.0)
        k_ss = self_kernel_eval(eff, x_test, "nngp")  # exact diagonal
        cross_term = nngp_cross @ w                  # K_*t T^-1 T_t*, (m, m)
        cov = k_ss + w.T @ kw - cross_term - cross_term.T
        return mean, cov

    @partial(jax.jit, static_argnames=("compute_cov",))
    def predict(self, x_test, compute_cov=True):
        """Posterior (mean, cov) at x_test, in raw input units.

        compute_cov: True -> full (m, m) covariance (reference behavior,
        `/root/reference/train.py:157-158`); 'diag' -> (m,) variances only
        (cheaper, what std actually needs); False -> mean only.

        Note: with a fit-time input_scale s, raw-unit variances are
        var_scaled * s^2 — for extreme scales (2^64-packed categorical
        chunks) that product exceeds fp32's range even though the std does
        not; use `predict_mean_std`, which compensates at the std level
        (sqrt first, then * s) and stays finite.
        """
        out = self._predict_scaled(x_test, compute_cov)
        if compute_cov is False or self.input_scale == 1.0:
            return out
        mean, v = out
        return mean, v * (self.input_scale * self.input_scale)

    @jax.jit
    def predict_mean_std(self, x_test):
        """Convenience: (mean, std) with variance clamped at zero — the
        quantity the estimator serves (`/root/reference/neuroestimator/
        estimator/estimator.py:55`). std compensation happens after the
        sqrt so fp32 stays finite at any input_scale (see `predict`)."""
        mean, var = self._predict_scaled(x_test, "diag")
        return mean, jnp.sqrt(var) * self.input_scale

    def predict_mean_std_chunked(self, x_test, chunk: int = 8192):
        """(mean, std) over arbitrarily large test sets: processes `chunk`
        rows per device dispatch so the (m, n) cross Gram never exceeds
        chunk x n (the reference materializes the full test covariance,
        capping m; this path is O(chunk * n) memory)."""
        return chunked_predict(self.predict_mean_std, x_test, chunk)

    # ------------------------------------------------------- model evidence
    def log_marginal_likelihood(self) -> float:
        """Exact GP log evidence log p(y | X) of the fitted model
        N(0, K_solve + reg I) in RAW input units — free given the factor:
        -0.5 (y^T alpha + 2 sum log diag L + n log 2pi). The reference has
        no model selection at all (diag_reg pinned at 1e-3,
        `/root/reference/train.py:171`); this powers `select_diag_reg`.

        With an input prescale the stored system is the raw one divided by
        scale^2, so the raw-unit evidence adds n log scale^2 to the logdet
        and divides the quadratic term by scale^2 (exact: the scale is a
        power of two). Host compensation on purpose: the device part
        (`_gauss_mll_terms`) is keyed on shapes only, so a ridge sweep
        reuses ONE compiled program across candidates regardless of the
        posterior's static fields (on a tunnel, compiles cost
        seconds-to-minutes)."""
        n = self.num_train
        diag = (self.l.diagonal() if hasattr(self.l, "blocks")
                else jnp.diagonal(self.l))
        quad, logdet = _gauss_mll_terms(diag, self.y_train, self.alpha)
        quad, logdet = float(quad), float(logdet)
        if self.input_scale != 1.0:
            s2 = float(self.input_scale) ** 2
            quad /= s2
            logdet += n * np.log(s2)
        return -0.5 * (quad + logdet + n * np.log(2.0 * np.pi))

    # --------------------------------------------------------------- extend
    def extend(self, x_new, y_new, bucket: Optional[int] = None):
        """Append labeled points with an O(n^2 m) block-Cholesky update
        instead of a full refit. Only the solve-kernel blocks are recomputed.

        On a padded posterior (`fit_gp(pad_to=...)`) the new rows OVERWRITE
        inert pad slots in place — shapes never change, so every acquisition
        round reuses one compiled program (the point of padding). When the
        slots run out the padding is stripped and the append falls back to
        the dense path (one-time shape change; re-pad by refitting with a
        larger pad_to).

        bucket (padded posteriors only): round the append block itself up
        to the next power of two >= max(bucket, m) with inert rows, so
        VARIABLE batch sizes (online serving feedback) share a handful of
        compiled append programs instead of one per distinct m. The
        bucket-pad rows are rewritten as the unit rows they already were
        and stay reusable; only the real rows advance n_real. The slot
        check is against the BUCKETED size (a tail batch may fall back to
        the dense path slightly before the slots are truly full)."""
        if self.n_real is not None:
            x_new = jnp.asarray(x_new)
            y_new = jnp.asarray(y_new)
            m = x_new.shape[0]
            if bucket is not None and m > 0:
                mb = max(int(bucket), 1 << (m - 1).bit_length())
                if self.num_train + mb <= self.num_padded:
                    if y_new.ndim == 1:
                        y_new = y_new[:, None]
                    pad = mb - m
                    if pad:
                        # pad on HOST: a jnp.concatenate here is itself a
                        # tiny XLA program compiled PER (m, pad) shape —
                        # measured ~2 s per fresh ragged size through the
                        # tunnel, exactly the cost bucketing exists to
                        # avoid (one ~30 ms fetch when x_new is already on
                        # device is the cheaper trade)
                        x_np = np.asarray(x_new)
                        y_np = np.asarray(y_new)
                        x_new = jnp.asarray(np.concatenate(
                            [x_np, np.broadcast_to(
                                x_np[:1], (pad, x_np.shape[1]))]))
                        y_new = jnp.asarray(np.concatenate(
                            [y_np, np.zeros((pad, y_np.shape[1]),
                                            y_np.dtype)]))
                    return _padded_append(self, x_new, y_new,
                                          m_real=jnp.asarray(m, jnp.int32))
            elif self.num_train + m <= self.num_padded:
                return _padded_append(self, x_new, y_new)
            return self.strip_padding().extend(x_new, y_new)
        return self._extend_dense(x_new, y_new)

    def strip_padding(self) -> "GPPosterior":
        """Materialize the dense exact-shape posterior from a padded one
        (drops the inert rows; host-side slice, no device math)."""
        if self.n_real is None:
            return self
        n = int(self.n_real)
        return dataclasses.replace(
            self,
            x_train=self.x_train[:n],
            y_train=self.y_train[:n],
            l=self.l[:n, :n],
            alpha=self.alpha[:n],
            k_tt_nngp=(self.k_tt_nngp[:n, :n]
                       if self.k_tt_nngp is not None else None),
            n_real=None,
        )

    @jax.jit
    def _extend_dense(self, x_new, y_new):
        if self.input_scale != 1.0:
            x_new = x_new * (1.0 / self.input_scale)
        eff = self._eff_layers()
        if self.get == "nngp":
            k21 = kernel_eval(eff, x_new, self.x_train, "nngp")  # (m, n)
            k22 = kernel_eval(eff, x_new, x_new, "nngp")
            n21 = n22 = None
        else:
            # tuple get: one recursion yields both kernels per block
            n21, k21 = kernel_eval(eff, x_new, self.x_train,
                                   ("nngp", "ntk"))
            n22, k22 = kernel_eval(eff, x_new, x_new, ("nngp", "ntk"))
        m = x_new.shape[0]
        # Keep the ridge the fit chose (relative reg is defined by the fit-time
        # Gram; re-deriving it from the extended Gram would silently change
        # the model the factor represents).
        k22 = k22 + self.reg * jnp.eye(m, dtype=k22.dtype)
        from nngp_tpu.ops.linalg import (
            BlockLowerTriangular,
            block_cholesky_append_rows,
        )
        y_ext = jnp.concatenate([self.y_train, y_new], axis=0)
        if isinstance(self.l, BlockLowerTriangular):
            # >28k fits keep the factor as column blocks; the append extends
            # each block in place of a dense O((n+m)^2) rebuild.
            l_ext = block_cholesky_append_rows(self.l, k21, k22)
            alpha = _tri_solve(l_ext, _tri_solve(l_ext, y_ext),
                               transpose=True)
        else:
            l_ext = cholesky_append_rows(self.l, k21, k22)
            # _tri_solve, not jax.scipy.cho_solve: XLA's triangular-solve
            # expander allocates an extra n^2 workspace at the sizes the
            # dense incremental path serves (same routing as _fit_impl)
            alpha = _tri_solve(l_ext, _tri_solve(l_ext, y_ext),
                               transpose=True)
        k_tt = None
        if self.get == "ntk" and self.k_tt_nngp is not None:
            # resident k_tt extends densely; the lazy (None) form needs
            # nothing — panel_symm_matmul reads the extended x_train
            k_tt = jnp.block([[self.k_tt_nngp, n21.T], [n21, n22]])
        return dataclasses.replace(
            self,
            x_train=jnp.concatenate([self.x_train, x_new], axis=0),
            y_train=y_ext,
            l=l_ext,
            alpha=alpha,
            k_tt_nngp=k_tt,
        )


@jax.jit
def _padded_append(post: GPPosterior, x_new, y_new, m_real=None):
    """Write m new labeled rows into the leading inert pad slots of a
    padded posterior — the shape-stable O(n^2 m) append.

    The factor of the inert-padded Gram is block-diagonal
    [L_real 0; 0 I], with previously-appended rows already inside L_real's
    span (mask = arange < n_real covers them). New rows eliminate at
    positions [n_real, n_real+m): one triangular solve against the FULL
    padded factor gives L21 with exact zeros in every pad row (their rhs
    rows are zero and their factor rows are unit vectors), the Schur block
    factorizes at m x m, and two dynamic_update_slice writes replace the
    unit pad rows. n_real is a TRACED operand throughout, so every round
    of an acquisition loop hits this one compiled program.

    m_real: optional traced count of REAL rows in the (bucketed) new
    block — rows past it are themselves inert pads: their kernel rows/y
    are masked to zero and their Schur block comes out exactly identity,
    so the slots they occupy are REWRITTEN as the unit rows they already
    were and stay reusable. This is what lets serving extends bucket
    variable batch sizes into a handful of compiled programs
    (`extend(..., bucket=...)`)."""
    if y_new.ndim == 1:
        y_new = y_new[:, None]
    if post.input_scale != 1.0:
        x_new = x_new * (1.0 / post.input_scale)
    x_new = x_new.astype(post.x_train.dtype)
    y_new = y_new.astype(post.y_train.dtype)
    m = x_new.shape[0]
    mask = post._row_mask()
    eff = post._eff_layers()
    k21 = kernel_eval(eff, x_new, post.x_train, "nngp") * mask[None, :]
    # fit-time ridge (same policy as the dense append)
    k22 = (kernel_eval(eff, x_new, x_new, "nngp")
           + post.reg * jnp.eye(m, dtype=post.x_train.dtype))
    if m_real is None:
        m_added = m
    else:
        m_added = m_real
        new_mask = (jnp.arange(m) < m_real).astype(post.x_train.dtype)
        k21 = k21 * new_mask[:, None]
        k22 = k22 * (new_mask[:, None] * new_mask[None, :])
        idx = jnp.arange(m)
        k22 = k22.at[idx, idx].set(
            jnp.where(new_mask > 0, k22[idx, idx], 1.0))
        y_new = y_new * new_mask[:, None]
    u = _tri_solve(post.l, k21.T)                       # (N, m); pad rows 0
    # Schur at HIGHEST: default bf16 error exceeds the relative ridge on
    # ill-conditioned Grams (same hazard as ops.linalg.cholesky_append_rows)
    schur = k22 - jax.lax.dot_general(
        u, u, dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)
    l22 = jax.lax.linalg.cholesky(schur)
    start = post.n_real.astype(jnp.int32)
    row_block = u.T                                      # (m, N)
    row_block = jax.lax.dynamic_update_slice(
        row_block, l22, (jnp.int32(0), start))
    l_ext = jax.lax.dynamic_update_slice(
        post.l, row_block, (start, jnp.int32(0)))
    x_ext = jax.lax.dynamic_update_slice(
        post.x_train, x_new, (start, jnp.int32(0)))
    y_ext = jax.lax.dynamic_update_slice(
        post.y_train, y_new, (start, jnp.int32(0)))
    alpha = _tri_solve(l_ext, _tri_solve(l_ext, y_ext), transpose=True)
    return dataclasses.replace(
        post, x_train=x_ext, y_train=y_ext, l=l_ext, alpha=alpha,
        n_real=post.n_real + m_added)


@partial(jax.jit, static_argnames=("spec", "get", "absolute",
                                   "fused_min_n", "block_min_n",
                                   "mono_max_n", "pallas_max_n"))
def _fit_impl(x, y, spec, get, diag_reg, absolute,
              fused_min_n=_FUSED_FIT_MIN_N,
              block_min_n=_BLOCK_LAYOUT_MIN_N,
              mono_max_n=_MONOLITHIC_MAX_N,
              pallas_max_n=0, row_mask=None, spec_params=None):
    """Top-level cached jit — one compilation per (spec, get, shapes), so
    repeated fits (active-learning refits, serving restarts) don't retrace.

    HBM note: the relative ridge is derived from the O(n) diagonal recursion
    (identical to diag(K) up to elementwise rounding) so `K + r I` is fused
    straight into the Gram epilogue — the unridged Gram never materializes
    as a second n x n buffer, which raises the single-chip fit ceiling."""
    from nngp_tpu.models.kernel_spec import apply_diag_recursion
    from nngp_tpu.ops.gram import input_diag

    n = x.shape[0]
    eff = substitute_dense_params(spec.layers, spec_params)
    if absolute:
        reg = jnp.asarray(diag_reg, x.dtype)
    else:
        diag_nngp, diag_ntk = apply_diag_recursion(input_diag(x), eff)
        diag_vec = diag_nngp if get == "nngp" else diag_ntk
        if row_mask is None:
            reg = (diag_reg * jnp.mean(diag_vec)).astype(x.dtype)
        else:
            # relative ridge over REAL rows only: inert pad rows (zero
            # feature vectors, nonzero kernel diagonal when b > 0) must not
            # shift the trace the ridge is relative to
            reg = (diag_reg * jnp.sum(diag_vec * row_mask)
                   / jnp.sum(row_mask)).astype(x.dtype)

    if (get == "nngp" and x.dtype == jnp.float32 and row_mask is None
            and spec_params is None
            and fused_min_n <= n < min(pallas_max_n, block_min_n)):
        # Pallas-Gram tier (see _PALLAS_FIT_MAX_N): the Mosaic kernel
        # writes only the ridged lower triangle; blocked_cholesky and the
        # blocked solves never read the (garbage) upper tiles. fp32/TPU
        # nngp only — fp64 oracles and NTK fits keep the routes below.
        from nngp_tpu.ops.gram_pallas import gram_pallas
        from nngp_tpu.ops.linalg import blocked_cholesky

        k = gram_pallas(spec, x, get="nngp", mirror="lower", diag_add=reg)
        l = blocked_cholesky(k)
        alpha = _tri_solve(l, _tri_solve(l, y), transpose=True)
        return l, alpha, reg, None

    if row_mask is None and fused_min_n <= n < min(mono_max_n, block_min_n):
        # Monolithic tier (default-off — see _MONOLITHIC_MAX_N): one fused
        # XLA Gram with the exact diagonal + ridge scattered in, then the
        # statically-blocked right-looking Cholesky.
        from nngp_tpu.models.kernel_spec import apply_diag_recursion as _adr
        from nngp_tpu.ops.linalg import blocked_cholesky

        diag_nngp, diag_ntk = _adr(input_diag(x), eff)
        diag_solve = diag_nngp if get == "nngp" else diag_ntk
        idx = jnp.arange(n)
        if get == "ntk":
            keep_nngp, solve_k = kernel_eval(eff, x, x, ("nngp", "ntk"))
        else:
            solve_k = kernel_eval(eff, x, x, "nngp")
            keep_nngp = None
        # exact O(n) diagonal (computed one carries acos(rho=1) noise)
        solve_k = solve_k.at[idx, idx].set(diag_solve + reg)
        l = blocked_cholesky(solve_k)
        alpha = _tri_solve(l, _tri_solve(l, y), transpose=True)
        return l, alpha, reg, keep_nngp

    if n >= fused_min_n:
        # Large-n fast path: Gram fused into the factorization, one live
        # n^2 buffer for the factor (column blocks = n^2/2 above 28k).
        # Blocked solves for alpha: XLA's triangular expander allocates an
        # extra n^2 workspace that busts HBM at the sizes this path exists
        # for. For get='ntk' the NNGP train Gram (needed only by the
        # posterior covariance) is kept resident BELOW the block threshold
        # (one extra O(n^2 d) pass, built panel-wise — the monolithic
        # kernel_fn's per-layer n^2 elementwise temps are what capped the
        # round-1 NTK size); AT/above the block threshold it is not stored
        # at all — predict recomputes it panel-wise (panel_symm_matmul), so
        # the large-n NTK fit holds exactly ONE live n^2 object (the Theta
        # column blocks) and shares the NNGP single-chip ceiling.
        if get == "ntk" and n < block_min_n:
            from nngp_tpu.ops.gram import panel_gram
            keep_nngp = panel_gram(eff, x, "nngp")
        else:
            keep_nngp = None
        l = _fused_fit_factor(eff, x, reg, get, block_min_n=block_min_n,
                              row_mask=row_mask)
        alpha = _tri_solve(l, _tri_solve(l, y), transpose=True)
        return l, alpha, reg, keep_nngp

    idx = jnp.arange(n)
    if get == "nngp":
        k = kernel_eval(eff, x, x, "nngp")
        if row_mask is not None:
            # inert padding: zero pad rows/cols, unit pad diagonal — the
            # factor is block-diagonal [chol(K_real + r I), I] and the pad
            # rows never touch the real posterior (fit_gp pad_to contract)
            k = k * (row_mask[:, None] * row_mask[None, :])
            solve_k = k.at[idx, idx].add(
                jnp.where(row_mask > 0, reg, 1.0).astype(x.dtype))
            return _finish_plain(solve_k, y, reg, None)
        # O(n) diagonal scatter; XLA updates in place (no second n^2 buffer)
        solve_k = k.at[idx, idx].add(reg)
        keep_nngp = None
    else:
        k_tt, theta_tt = kernel_eval(eff, x, x, ("nngp", "ntk"))
        solve_k = theta_tt.at[idx, idx].add(reg)
        keep_nngp = k_tt
    return _finish_plain(solve_k, y, reg, keep_nngp)


def _finish_plain(solve_k, y, reg, keep_nngp):
    l = _cholesky(solve_k)
    alpha = jax.scipy.linalg.cho_solve((l, True), y)
    return l, alpha, reg, keep_nngp


# Features beyond this magnitude trigger the automatic input prescale in
# fp32 fits (scale-equivariant specs only): squared Gram entries of
# 2^64-packed categorical chunks overflow fp32's 3.4e38 ceiling. [0,1000]
# reference-scale workloads (forest) sit far below and keep scale 1.0.
_PRESCALE_MAX_ABS = 2.0 ** 20


def input_scale_for_bound(max_abs: float, layers, fp64: bool = False) -> float:
    """Power-of-two prescale covering features of magnitude <= max_abs, or
    1.0 whenever the exact compensation does not apply (non-equivariant
    spec, fp64 which never overflows) or is not needed (small features).

    Feature encoders expose a LAYOUT-derived `max_abs_bound()` — pass it
    here and hand the result to `fit_gp(input_scale=...)` to skip the
    data probe entirely: no device round-trip on the fit path (the probe
    costs one ~30 ms tunnel sync per fit on this image).

    CAVEAT: only do that when the data actually spans the bound (e.g. the
    packed-chunk workloads, where any categorical predicate reaches
    ~2^chunk). A bound orders of magnitude ABOVE the real features
    underflows the fp32 solve from the other end (K ~ (x/s)^2 collapses
    toward 0, alpha ~ y/K overflows) — fitting from host numpy arrays
    instead makes the data probe free and is the default-safe choice."""
    import math

    from nngp_tpu.models.kernel_spec import is_scale_equivariant

    if fp64 or not is_scale_equivariant(layers):
        return 1.0
    m = float(max_abs)
    if not math.isfinite(m) or m <= _PRESCALE_MAX_ABS:
        return 1.0
    return float(2.0 ** math.ceil(math.log2(m)))


def _auto_input_scale(x, layers) -> float:
    """Data-probed prescale: `input_scale_for_bound` of max|x|. Free for
    host (numpy) inputs; for a committed device array it costs one blocking
    fetch — callers with an encoder should pass
    `input_scale=input_scale_for_bound(encoder.max_abs_bound(), ...)`
    instead. 1.0 for a traced x whose magnitude is unknowable here."""
    from nngp_tpu.models.kernel_spec import is_scale_equivariant

    if x.dtype == jnp.float64 or not is_scale_equivariant(layers):
        return 1.0
    if isinstance(x, np.ndarray):
        m = float(np.max(np.abs(x))) if x.size else 0.0
    else:
        try:
            m = float(jnp.max(jnp.abs(x)))
        except jax.errors.ConcretizationTypeError:
            return 1.0
    return input_scale_for_bound(m, layers)


def fit_gp(spec: KernelSpec, x_train, y_train, diag_reg: float = 1e-3,
           get: str = "nngp", diag_reg_absolute_scale: bool = False,
           input_scale: Optional[float] = None,
           pad_to: Optional[int] = None,
           spec_params: Optional[dict] = None) -> GPPosterior:
    """Factorize the train Gram and return a ready posterior.

    Mirrors `nt.predict.gradient_descent_mse_ensemble(kernel_fn, X, Y,
    diag_reg=1e-3)` (`/root/reference/train.py:171-172`) evaluated at
    t=infinity.

    input_scale: None (default) picks an automatic power-of-two prescale
    when fp32 features would overflow the Gram (see GPPosterior.input_scale);
    pass 1.0 to force raw features or an explicit power of two to pin it.

    pad_to: SHAPE-BUCKETED fit (get='nngp' only, below the column-block
    layout threshold): storage is padded to `pad_to` rows with inert rows
    (zero kernel row/col, unit factor diagonal, zero y) and `extend`
    overwrites pad slots in place — so a whole acquisition/online-serving
    loop reuses ONE compiled fit/extend/predict program while n grows up
    to pad_to. Every compiled program costs 30-300 s through the remote-
    TPU tunnel (seconds on attached hardware); the distributed tier
    already pads this way (`parallel/sharded.py`). Predictions, evidence
    and extends are exactly the dense posterior's (parity-tested); the
    cost is O(pad_to^2) memory/flops from the start.

    spec_params: TRACED kernel hyperparameters — {"w_stds": (n_dense,),
    "b_stds": (n_dense,)} arrays substituted positionally into `spec`'s
    Dense layers (whose own std values are then ignored; `spec` provides
    structure only and MUST be the same object/structure across calls).
    Because the values ride as jit operands, a hyperparameter-relearn
    loop reuses ONE compiled fit program — and the returned posterior
    carries the params, so its predict/extend programs are relearn-stable
    too (`HyperoptResult.spec_params()` produces this dict). The
    equivariance-based input prescale cannot be derived from traced
    values, so input_scale defaults to 1.0 here (pass an explicit power
    of two only if the spec is KNOWN bias-free).
    """
    if get not in ("nngp", "ntk"):
        raise ValueError(f"get must be 'nngp' or 'ntk', got {get!r}")

    y_train = jnp.asarray(y_train)
    if y_train.ndim == 1:
        y_train = y_train[:, None]
    if spec_params is not None:
        from nngp_tpu.models.kernel_spec import Dense
        n_dense = sum(1 for l in spec.layers if isinstance(l, Dense))
        spec_params = {
            "w_stds": jnp.asarray(spec_params["w_stds"]),
            "b_stds": jnp.asarray(spec_params["b_stds"]),
        }
        if spec_params["w_stds"].shape != (n_dense,) or                 spec_params["b_stds"].shape != (n_dense,):
            raise ValueError(
                f"spec_params arrays must have shape ({n_dense},) to match "
                f"the spec's Dense layers")
        if input_scale is None:
            input_scale = 1.0   # equivariance undecidable on traced b
    if input_scale is None:
        # probe BEFORE the device conversion: on host (numpy) inputs the
        # max is free; a committed device array costs one blocking fetch
        input_scale = _auto_input_scale(
            x_train if isinstance(x_train, (np.ndarray, jax.Array))
            else np.asarray(x_train), spec.layers)
    x_train = jnp.asarray(x_train)
    if input_scale != 1.0:
        x_train = x_train * (1.0 / input_scale)

    row_mask = None
    n_real = None
    if pad_to is not None:
        n = x_train.shape[0]
        if get != "nngp":
            raise ValueError("pad_to supports get='nngp' only (the padded "
                             "NTK covariance needs a masked resident k_tt; "
                             "not implemented)")
        if pad_to < n:
            raise ValueError(f"pad_to={pad_to} < n={n}")
        if pad_to >= _BLOCK_LAYOUT_MIN_N:
            raise ValueError(
                f"pad_to={pad_to} reaches the column-block factor layout "
                f"(>= {_BLOCK_LAYOUT_MIN_N}); padding is a dense-factor "
                "feature — large-n loops should use the distributed tier")
        if pad_to > n:
            # pad FEATURES with copies of a real row (finite kernel values
            # pre-mask — an all-zero row hits 0/0 in the dual recursion),
            # labels with zeros; the mask makes them inert either way
            x_train = jnp.concatenate(
                [x_train, jnp.broadcast_to(x_train[:1],
                                           (pad_to - n, x_train.shape[1]))])
            y_train = jnp.concatenate(
                [y_train, jnp.zeros((pad_to - n, y_train.shape[1]),
                                    y_train.dtype)])
        row_mask = (jnp.arange(pad_to) < n).astype(x_train.dtype)
        n_real = jnp.asarray(n, jnp.int32)

    l, alpha, reg, k_tt_nngp = _fit_impl(
        x_train, y_train, spec, get, float(diag_reg),
        bool(diag_reg_absolute_scale),
        # read at call time (not trace time) so the thresholds are part of
        # the jit cache key — tests shrink them to force the fused and
        # block-factor paths without hitting a stale trace
        fused_min_n=_FUSED_FIT_MIN_N,
        block_min_n=_BLOCK_LAYOUT_MIN_N,
        mono_max_n=_MONOLITHIC_MAX_N,
        pallas_max_n=_PALLAS_FIT_MAX_N if _pallas_fit_enabled() else 0,
        row_mask=row_mask,
        spec_params=spec_params,
    )
    return GPPosterior(
        x_train=x_train,
        y_train=y_train,
        l=l,
        alpha=alpha,
        reg=reg,
        k_tt_nngp=k_tt_nngp,
        spec=spec,
        get=get,
        diag_reg=diag_reg,
        input_scale=float(input_scale),
        n_real=n_real,
        spec_params=spec_params,
    )


def select_diag_reg(spec: KernelSpec, x_train, y_train,
                    candidates=(1e-4, 3e-4, 1e-3, 3e-3, 1e-2),
                    get: str = "nngp", input_scale: Optional[float] = None):
    """Ridge selection by exact GP evidence: refit per candidate and keep
    the `diag_reg` with the highest `log_marginal_likelihood`. diag_reg is
    a TRACED operand of the fit program and the evidence reductions key on
    shapes only, so the first candidate pays the one compile and the rest
    are warm refits (~50 ms each on the chip at 10.8k). At most ONE factor
    is live at a time — candidates are scored and dropped, the winner
    refit at the end (holding two n^2 factors OOMs large-n fits).

    Returns (best_posterior, {diag_reg: mll}). Model selection the
    reference cannot do — its ridge is hard-coded
    (`/root/reference/train.py:171`)."""
    if input_scale is None:
        # resolve ONCE: fit_gp's auto probe on a committed device array is
        # a ~28 ms blocking fetch, and this loop refits per candidate
        input_scale = _auto_input_scale(
            x_train if isinstance(x_train, (np.ndarray, jax.Array))
            else np.asarray(x_train), spec.layers)
    scores = {}
    for r in candidates:
        post = fit_gp(spec, x_train, y_train, diag_reg=float(r), get=get,
                      input_scale=input_scale)
        scores[float(r)] = post.log_marginal_likelihood()
        del post
    finite = {r: v for r, v in scores.items() if np.isfinite(v)}
    if not finite:
        raise FloatingPointError(
            "no candidate diag_reg produced a finite evidence — check the "
            "feature scale / input_scale")
    best_r = max(finite, key=finite.get)
    best_post = fit_gp(spec, x_train, y_train, diag_reg=best_r, get=get,
                       input_scale=input_scale)
    return best_post, scores
