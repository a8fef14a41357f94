"""Mesh-sharded Gram assembly and GP fit/predict.

Sharding layout (the TPU-native replacement for `nt.batch`'s host-blocked
Gram, `/root/reference/train.py:166-168`):

  X_train  (n, d)   row-sharded over the `data` axis — d is tiny (tens), so
                    an all-gather of X costs ~n*d*4 bytes over ICI, nothing.
  K        (n, n)   row-block sharded: each device computes its
                    (n/p, n) block = matmul on the MXU + fused recursion.
                    The O(n^2) object is NEVER replicated.
  Cholesky          two regimes. `sharded_fit` hands the sharded Gram to
                    XLA's partitioner (which gathers to factorize — fine
                    while n^2 fits one chip). `distributed_fit` keeps the
                    Gram row-sharded through a block-cyclic factorization
                    and solves (parallel/cholesky.py) — the >HBM regime.
  predict           `sharded_predict_mean_std` shards test rows (factor
                    replicated — the small-n serving fan-out);
                    `DistributedPosterior.predict_mean_std` shards the
                    cross Gram over TRAIN rows so no device ever holds an
                    O(n^2) object — the large-n serving path.

Everything is expressed with `shard_map` (Gram, solves) and jit + sharding
propagation (reductions) so XLA inserts the collectives and overlaps them
with compute.
"""

import dataclasses
from functools import lru_cache, partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from nngp_tpu.models.kernel_spec import (
    KernelSpec,
    apply_diag_recursion,
    apply_recursion,
)
from nngp_tpu.ops.gram import input_diag, input_gram
from nngp_tpu.parallel.cholesky import (
    cyclic_storage_order,
    distributed_cho_solve,
    distributed_cholesky,
    distributed_tri_solve_lower,
)


def _cross_block(spec, x_rows, x_cols):
    """(nngp, ntk) kernel block of x_rows vs x_cols — runs per device."""
    k0 = input_gram(x_rows, x_cols)
    d1 = input_diag(x_rows)[:, None]
    d2 = input_diag(x_cols)[None, :]
    return apply_recursion(k0, jnp.zeros_like(k0), d1, d2, spec.layers)


def sharded_gram(spec: KernelSpec, x, mesh: Mesh, get="nngp",
                 axis_name: str = "data"):
    """Row-block-sharded symmetric Gram: returns K with rows sharded over
    `axis_name`. Each device computes K[rows_i, :] from its local X block
    against the all-gathered X."""

    def block(x_local):
        x_full = jax.lax.all_gather(x_local, axis_name, axis=0, tiled=True)
        nngp, ntk = _cross_block(spec, x_local, x_full)
        return KernelSpec._select(nngp, ntk, get)

    out_specs = (tuple(P(axis_name, None) for _ in get)
                 if isinstance(get, (tuple, list)) else P(axis_name, None))
    fn = shard_map(
        block, mesh=mesh,
        in_specs=P(axis_name, None),
        out_specs=out_specs,
    )
    return fn(x)


def _gram_storage(spec, x_storage, x_natural, reg, mesh, axis_name, b,
                  want_pair, n_real):
    """Kernel Gram in block-cyclic storage layout with the relative ridge
    fused into the (elimination-) diagonal — the unridged Gram never exists.

    x_storage: (n, d) rows permuted by cyclic_storage_order; sharded.
    x_natural: (n, d) natural order; replicated (n*d is tiny).
    n_real: rows beyond this elimination index are INERT PADDING (layout
    filler so arbitrary n fits the p x block_size quantum): their kernel
    rows/columns are zeroed and their diagonal set to 1, so the padded Gram
    is block-diag(K_real + r I, I) — the factorization, solves, and
    posterior are exactly those of the unpadded problem (pad alphas are 0
    because pad labels are 0).
    Returns solve-kernel Gram (and the NNGP Gram when want_pair) with rows
    in storage order, columns in elimination (natural) order.
    """
    p = mesh.devices.size

    def block(x_local, x_full, reg):
        nngp, ntk = _cross_block(spec, x_local, x_full)
        m = x_local.shape[0]
        d = jax.lax.axis_index(axis_name)
        rows = jnp.arange(m)
        e_row = (d + p * (rows // b)) * b + rows % b
        cols = jnp.arange(x_full.shape[0])[None, :]
        diag_mask = cols == e_row[:, None]
        row_real = (e_row < n_real)[:, None]
        live = row_real & (cols < n_real)
        # real diagonal gets the ridge; pad diagonal gets exactly 1
        # (identity block); pad off-diagonals are 0
        ridge = jnp.where(diag_mask,
                          jnp.where(row_real, reg, 1.0), 0.0)
        if want_pair:
            return (jnp.where(live, nngp, 0.0),
                    jnp.where(live, ntk, 0.0) + ridge.astype(ntk.dtype))
        return jnp.where(live, nngp, 0.0) + ridge.astype(nngp.dtype)

    out_specs = ((P(axis_name, None), P(axis_name, None)) if want_pair
                 else P(axis_name, None))
    fn = shard_map(
        block, mesh=mesh,
        in_specs=(P(axis_name, None), P(None, None), P()),
        out_specs=out_specs,
    )
    return fn(x_storage, x_natural, reg)


def sharded_fit(spec: KernelSpec, x, y, mesh: Mesh, diag_reg: float = 1e-3,
                get: str = "nngp", axis_name: str = "data"):
    """Full training step over the mesh: sharded Gram -> Cholesky -> alpha.
    Returns (l, alpha, reg) (+ k_tt for get='ntk'). jit-compatible: call under
    jit for one fused program. XLA's partitioner gathers the Gram for the
    factorization — use `distributed_fit` when n^2 exceeds one chip's HBM."""
    if get == "ntk":
        # one Gram pass computes both kernels (the recursion produces the
        # pair anyway); two passes would double the O(n^2 d) work + ICI
        k_tt, theta = sharded_gram(spec, x, mesh, ("nngp", "ntk"), axis_name)
        solve_k = theta
    else:
        k_tt = sharded_gram(spec, x, mesh, "nngp", axis_name)
        solve_k = k_tt
    # Relative ridge from the O(n) diagonal recursion (same definition as
    # gp.fit_gp / distributed_fit; also exact where the computed diagonal
    # carries acos(1-eps) rounding), applied as an O(n) scatter — no
    # replicated n x n eye.
    diag_nngp, diag_ntk = apply_diag_recursion(input_diag(x), spec.layers)
    diag_vec = diag_nngp if get == "nngp" else diag_ntk
    reg = (diag_reg * jnp.mean(diag_vec)).astype(solve_k.dtype)
    idx = jnp.arange(solve_k.shape[0])
    l = jax.lax.linalg.cholesky(solve_k.at[idx, idx].add(reg))
    alpha = jax.scipy.linalg.cho_solve((l, True), y)
    if get == "ntk":
        return l, alpha, reg, k_tt
    return l, alpha, reg


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DistributedPosterior:
    """GP posterior whose O(n^2) state (factor, train Gram) stays row-sharded
    over the mesh in block-cyclic storage layout — no device ever holds a
    replicated n x n buffer, so n is bounded by p * HBM, not one chip.

    Row layout: storage row s holds elimination (natural) row g2e[s];
    columns of `l` / `k_tt` are in natural order. `alpha` is stored in the
    same permuted layout; use `alpha_natural()` for the plain vector.

    Inert padding: elimination rows >= n_real are layout filler (the padded
    Gram is block-diag(K_real + r I, I), pad labels/alphas are 0, pad cross
    rows are masked to 0 in `_cross_grams`), so ANY training-set size fits
    the p x block_size layout quantum with bit-exact posterior semantics.
    """

    x_storage: jax.Array                  # (n, d) permuted train inputs
    y_storage: jax.Array                  # (n, 1) permuted train labels
    l: jax.Array                          # (n, n) sharded cyclic factor
    alpha: jax.Array                      # (n, 1) sharded, storage order
    reg: jax.Array                        # scalar ridge actually added
    k_tt: Optional[jax.Array]             # (n, n) sharded NNGP Gram (ntk only)
    spec: KernelSpec = dataclasses.field(metadata=dict(static=True))
    get: str = dataclasses.field(metadata=dict(static=True), default="nngp")
    mesh: Mesh = dataclasses.field(metadata=dict(static=True), default=None)
    axis_name: str = dataclasses.field(metadata=dict(static=True),
                                       default="data")
    block_size: int = dataclasses.field(metadata=dict(static=True), default=0)
    g2e: tuple = dataclasses.field(metadata=dict(static=True), default=())
    # real (unpadded) train count; 0 means "no padding" (n_real == n)
    n_real: int = dataclasses.field(metadata=dict(static=True), default=0)
    # power-of-two input prescale (fp32 Gram overflow guard; exact-
    # compensation semantics documented at gp.posterior.GPPosterior):
    # x_storage is stored divided by it, incoming x divides on entry,
    # reported std multiplies back
    input_scale: float = dataclasses.field(metadata=dict(static=True),
                                           default=1.0)

    @property
    def num_train(self) -> int:
        """REAL training rows (excludes inert layout padding)."""
        return self.n_real or self.x_storage.shape[0]

    @property
    def num_padded(self) -> int:
        """Storage rows including inert padding (= factor dimension)."""
        return self.x_storage.shape[0]

    def alpha_natural(self):
        """alpha in natural train-row order (replicated; O(n)); real rows
        only — pad alphas are identically 0 and excluded."""
        return self._unpermute(self.alpha)

    def x_natural(self):
        return self._unpermute(self.x_storage)

    def y_natural(self):
        return self._unpermute(self.y_storage)

    def _unpermute(self, arr):
        return jnp.take(arr, _e2s_device(self.g2e), axis=0)[: self.num_train]

    @jax.jit
    def log_marginal_likelihood(self):
        """Exact GP log evidence in raw units — same quantity as
        `GPPosterior.log_marginal_likelihood`, computed from the sharded
        factor without gathering it: pivots live at l[s, g2e[s]] (cyclic
        storage), inert pad rows have pivot 1 / alpha 0 / y 0 so they
        contribute exactly nothing to either term."""
        n_pad = self.num_padded
        diag = self.l[jnp.arange(n_pad), jnp.asarray(self.g2e)]
        quad = jnp.sum(self.y_storage * self.alpha)
        logdet = 2.0 * jnp.sum(jnp.log(diag))
        n = self.num_train
        if self.input_scale != 1.0:
            s2 = jnp.asarray(self.input_scale, diag.dtype) ** 2
            quad = quad / s2
            logdet = logdet + n * jnp.log(s2)
        return -0.5 * (quad + logdet + n * np.log(2.0 * np.pi))

    def _cross_grams(self, x_test):
        """(nngp, ntk) cross Grams of shape (n, n_te), TRAIN-row sharded in
        storage order — the large-n predict layout (n*n_te/p per device).
        Pad rows are masked to 0: the factor treats them as an identity
        block, so unmasked pad cross rows would leak straight into the
        variance solves."""
        p = self.mesh.devices.size
        b, ax, n_real = self.block_size, self.axis_name, self.num_train

        def fn(x_loc, x_te):
            nngp, ntk = _cross_block(self.spec, x_loc, x_te)
            d = jax.lax.axis_index(ax)
            rows = jnp.arange(x_loc.shape[0])
            e_row = (d + p * (rows // b)) * b + rows % b
            live = (e_row < n_real)[:, None]
            return jnp.where(live, nngp, 0.0), jnp.where(live, ntk, 0.0)

        fn = shard_map(
            fn, mesh=self.mesh,
            in_specs=(P(self.axis_name, None), P(None, None)),
            out_specs=(P(self.axis_name, None), P(self.axis_name, None)),
        )
        return fn(self.x_storage, x_test)

    def _predict_scaled(self, x_test, compute_cov):
        """Predict body in PRESCALED units (x_test raw; var/cov come back
        divided by input_scale^2) — the same contract as
        `GPPosterior._predict_scaled`, so callers that only COMPARE
        variances (greedy acquisition) can skip the raw-unit compensation
        that overflows fp32 at extreme prescales. Every contraction over
        the n axis runs on the sharded operands (the (te, te) results are
        the only replicated buffers)."""
        mesh, ax, bs = self.mesh, self.axis_name, self.block_size
        if self.input_scale != 1.0:
            x_test = x_test * (1.0 / self.input_scale)
        nngp_cross, ntk_cross = self._cross_grams(x_test)   # (n, te) sharded
        if self.get == "nngp":
            mean = nngp_cross.T @ self.alpha                # (te, 1)
            if compute_cov is False:
                return mean
            v = distributed_tri_solve_lower(self.l, nngp_cross, mesh, ax,
                                            block_size=bs)
            if compute_cov == "diag":
                diag_ss, _ = apply_diag_recursion(input_diag(x_test),
                                                  self.spec.layers)
                return mean, jnp.maximum(diag_ss - jnp.sum(v * v, axis=0),
                                         0.0)
            k_ss = self.spec.self_kernel(x_test, "nngp")  # exact diagonal
            return mean, k_ss - v.T @ v

        # get == 'ntk' (posterior formulas: nngp_tpu/gp/posterior.py)
        mean = ntk_cross.T @ self.alpha
        if compute_cov is False:
            return mean
        w = distributed_cho_solve(self.l, ntk_cross, mesh, ax, block_size=bs)
        # K_tt columns are in natural order -> contract against w in natural
        # row order (an O(n*te) gather, the one resharding this path needs).
        w_natural = jnp.take(w, _e2s_device(self.g2e), axis=0)
        kw = self.k_tt @ w_natural                          # (n, te) sharded
        if compute_cov == "diag":
            diag_ss, _ = apply_diag_recursion(input_diag(x_test),
                                              self.spec.layers)
            var = (diag_ss + jnp.sum(w * kw, axis=0)
                   - 2.0 * jnp.sum(nngp_cross * w, axis=0))
            return mean, jnp.maximum(var, 0.0)
        k_ss = self.spec.self_kernel(x_test, "nngp")  # exact diagonal
        # rows of w / kw / nngp_cross share the storage permutation, which
        # cancels inside every n-contraction
        cross_term = nngp_cross.T @ w                       # (te, te)
        return mean, k_ss + w.T @ kw - cross_term - cross_term.T

    @partial(jax.jit, static_argnames=("compute_cov",))
    def predict(self, x_test, compute_cov=True):
        """Posterior (mean, cov) in raw units — `GPPosterior.predict`
        semantics from the row-sharded state (the (te, te) covariance is
        the only replicated output; te is the caller's batch, e.g. the
        greedy-acquisition pool slice). Same fp32 caveat as the exact
        tier: raw-unit variances are var_scaled * s^2."""
        out = self._predict_scaled(x_test, compute_cov)
        if compute_cov is False or self.input_scale == 1.0:
            return out
        mean, v = out
        return mean, v * (self.input_scale * self.input_scale)

    @jax.jit
    def predict_mean_std(self, x_test):
        """Batched posterior (mean, std) with the cross Gram sharded over
        train rows; solves run on the sharded factor. Mirrors
        GPPosterior.predict(compute_cov='diag') for both gets.

        Jitted (self is a pytree, mesh/layout fields are static): the whole
        serving step — cross Gram, distributed solves, variance — is ONE
        dispatch per batch shape, which matters behind a ~30 ms/dispatch
        TPU tunnel."""
        mean, var = self._predict_scaled(x_test, "diag")
        return mean, jnp.sqrt(var) * self.input_scale

    def predict_mean_std_chunked(self, x_test, chunk: int = 8192):
        """(mean, std) over arbitrarily large test sets, `chunk` rows per
        dispatch — caps the sharded cross Gram at n*chunk/p per device."""
        from nngp_tpu.gp.posterior import chunked_predict
        return chunked_predict(self.predict_mean_std, x_test, chunk)

    # --------------------------------------------------------------- extend
    def extend(self, x_new, y_new) -> "DistributedPosterior":
        """Append labeled rows WITHOUT the O(n^3/p) refit — the distributed
        analog of `GPPosterior.extend` (the reference refits from scratch
        every acquisition round, `/root/reference/active/ActiveLearner.py:
        67-77`).

        Real rows are always elimination indices [0, n_real); pads are an
        identity factor block behind them. New rows therefore eliminate
        LAST: they first overwrite pad positions (whose factor rows are
        exact unit vectors nothing real ever referenced), then grow storage
        by whole p*block_size quanta. Cost: one distributed forward solve
        for L21 (O(n^2 m / p) flops, the dominant term), a replicated
        (m_ext, m_ext) Schur Cholesky, and an O(n m / p) re-layout.
        The (m_ext, n_new) trailing factor rows are transiently replicated
        — fine for serving-scale m (hundreds..thousands of rows).
        """
        x_new = jnp.asarray(x_new, self.x_storage.dtype)
        if self.input_scale != 1.0:
            x_new = x_new * (1.0 / self.input_scale)
        y_new = jnp.asarray(y_new, self.y_storage.dtype)
        if y_new.ndim == 1:
            y_new = y_new[:, None]
        p = self.mesh.devices.size
        b, ax = self.block_size, self.axis_name
        q = p * b
        n1 = self.num_train                    # real rows before extension
        n_old = self.num_padded
        m = x_new.shape[0]
        n2 = n1 + m                            # real rows after extension
        n_new = max(n_old, q * (-(-n2 // q)))
        return _distributed_extend_impl(self, x_new, y_new,
                                        n_new=n_new, m_real=m)


@lru_cache(maxsize=16)
def _e2s_np(g2e: tuple):
    """Inverse storage permutation, cached per layout — recomputing the
    O(n log n) argsort on every serving call would sit on the latency path
    (predict/_unpermute are called per batch)."""
    return np.argsort(np.asarray(g2e, dtype=np.int64))


def _e2s_device(g2e: tuple):
    # Only the NUMPY permutation is cached: memoizing the jnp array would
    # capture a tracer when the first call happens inside a jit trace
    # (predict_mean_std is jitted) and poison every later trace/eager use.
    return jnp.asarray(_e2s_np(g2e))


def distributed_fit(spec: KernelSpec, x, y, mesh: Mesh,
                    diag_reg: float = 1e-3, get: str = "nngp",
                    axis_name: str = "data",
                    block_size: Optional[int] = None,
                    input_scale: Optional[float] = None) -> DistributedPosterior:
    """Fit with the Gram row-sharded end to end: block-cyclic storage,
    ridge fused into the Gram epilogue, distributed Cholesky + solves.
    Per-device live memory stays O(n^2/p), never the replicated n^2: the
    steady-state working set is one n^2/p shard; the factorization's strip
    reassembly transiently holds ~1.5 shards (finished strips ~1/2 + the
    output buffer — see `_chol_local`), and the compiled end-to-end peak is
    asserted < 3.5 shards in
    test_distributed_fit_under_jit_stays_sharded_at_scale.

    block_size: panel width of the cyclic layout (None -> ceil(n/p), i.e.
    plain contiguous blocks). Smaller panels (e.g. 256) load-balance the
    trailing updates across the mesh.

    ANY n is accepted: n is padded up to the p*block_size layout quantum
    with inert rows (identity diagonal, zero cross-covariance, zero label —
    see `_gram_storage`) whose posterior contribution is exactly zero. The
    reference fits any n (`/root/reference/train.py:171-172`); a layout
    constraint must not leak into the user API.
    """
    if get not in ("nngp", "ntk"):
        raise ValueError(f"get must be 'nngp' or 'ntk', got {get!r}")
    from nngp_tpu.gp.posterior import _auto_input_scale
    if input_scale is None:
        # probe BEFORE the device conversion (free for numpy inputs)
        input_scale = _auto_input_scale(
            x if isinstance(x, (np.ndarray, jax.Array))
            else np.asarray(x), spec.layers)
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    if y.ndim == 1:
        y = y[:, None]
    if input_scale != 1.0:
        x = x * (1.0 / input_scale)
    n_real = x.shape[0]
    p = mesh.devices.size
    if block_size is None:
        b = -(-n_real // p)                    # ceil: one panel per device
        n = b * p
    else:
        b = int(block_size)
        quantum = p * b
        n = quantum * -(-n_real // quantum)

    # Relative ridge from the O(n) diagonal recursion over the REAL rows
    # (exact match of diag(K) up to elementwise rounding) — no n x n eye,
    # no second buffer, and padding never shifts the ridge.
    diag_nngp, diag_ntk = apply_diag_recursion(input_diag(x), spec.layers)
    diag_vec = diag_nngp if get == "nngp" else diag_ntk
    reg = (diag_reg * jnp.mean(diag_vec)).astype(x.dtype)

    if n > n_real:
        # inert padding: feature values are irrelevant (every kernel entry
        # they produce is masked in _gram_storage/_cross_grams); repeat the
        # last row so the padded Gram stays numerically tame pre-mask
        x = jnp.concatenate([x, jnp.tile(x[-1:], (n - n_real, 1))], axis=0)
        y = jnp.concatenate(
            [y, jnp.zeros((n - n_real, y.shape[1]), y.dtype)], axis=0)

    g2e = cyclic_storage_order(n, b, p)
    g2e_dev = jnp.asarray(g2e)
    x_storage = jnp.take(x, g2e_dev, axis=0)
    y_storage = jnp.take(y, g2e_dev, axis=0)

    want_pair = get == "ntk"
    grams = _gram_storage(spec, x_storage, x, reg, mesh, axis_name, b,
                          want_pair, n_real)
    k_tt, solve_k = grams if want_pair else (None, grams)

    l = distributed_cholesky(solve_k, mesh, axis_name, block_size=b)
    alpha = distributed_cho_solve(l, y_storage, mesh, axis_name, block_size=b)
    return DistributedPosterior(
        x_storage=x_storage, y_storage=y_storage, l=l, alpha=alpha, reg=reg,
        k_tt=k_tt, spec=spec, get=get, mesh=mesh, axis_name=axis_name,
        block_size=b, g2e=tuple(int(i) for i in g2e), n_real=n_real,
        input_scale=float(input_scale),
    )


@partial(jax.jit, static_argnames=("n_new", "m_real"))
def _distributed_extend_impl(post: DistributedPosterior, x_new, y_new,
                             n_new: int, m_real: int) -> DistributedPosterior:
    """Body of `DistributedPosterior.extend` (see its docstring for the
    algorithm). ONE jitted program: cross kernel, distributed L21 solve,
    Schur factor, cyclic re-layout, alpha re-solve. Static cache key =
    (old shapes, m_real) — repeated serving extensions of the same batch
    size reuse the compiled program."""
    spec, mesh, get = post.spec, post.mesh, post.get
    p = mesh.devices.size
    b, ax = post.block_size, post.axis_name
    n1, n_old = post.num_train, post.num_padded
    m_ext = n_new - n1            # trailing region: new rows + fresh pads
    grow = n_new - n_old          # new storage rows (multiple of p*b)
    dtype = post.x_storage.dtype

    # Natural-order inputs for the trailing region [n1, n_new).
    if m_ext > m_real:
        x_ext = jnp.concatenate(
            [x_new, jnp.tile(x_new[-1:], (m_ext - m_real, 1))], axis=0)
        y_ext = jnp.concatenate(
            [y_new, jnp.zeros((m_ext - m_real, y_new.shape[1]),
                              y_new.dtype)], axis=0)
    else:
        x_ext, y_ext = x_new, y_new
    live_ext = jnp.arange(m_ext) < m_real

    # Cross kernels of all OLD storage rows vs the trailing region, masked:
    # old pad rows (e >= n1) and new pad columns contribute exactly zero.
    def cross(x_loc, x_e):
        nngp, ntk = _cross_block(spec, x_loc, x_e)
        d = jax.lax.axis_index(ax)
        rows = jnp.arange(x_loc.shape[0])
        e_row = (d + p * (rows // b)) * b + rows % b
        live = (e_row < n1)[:, None] & live_ext[None, :]
        return jnp.where(live, nngp, 0.0), jnp.where(live, ntk, 0.0)

    cross_fn = shard_map(
        cross, mesh=mesh,
        in_specs=(P(ax, None), P(None, None)),
        out_specs=(P(ax, None), P(ax, None)))
    nngp_c, ntk_c = cross_fn(post.x_storage, x_ext)   # (n_old, m_ext) sharded
    solve_c = ntk_c if get == "ntk" else nngp_c

    # L21^T by ONE distributed forward solve on the old factor (the
    # dominant O(n^2 m / p) term). Old-pad rows of the rhs are zero and the
    # old factor is identity there, so those solution rows stay zero.
    l21t = distributed_tri_solve_lower(post.l, solve_c, mesh, ax,
                                       block_size=b)  # (n_old, m_ext)

    # Schur complement + its Cholesky (replicated; m_ext is small).
    nngp22, ntk22 = spec.kernel_fn(x_ext, x_ext, ("nngp", "ntk"))
    k22 = ntk22 if get == "ntk" else nngp22
    live22 = live_ext[:, None] & live_ext[None, :]
    # Fit-time ridge on real new rows (the relative reg is defined by the
    # fit Gram — re-deriving it would silently change the model); exact 1.0
    # diagonal on fresh pads.
    k22 = (jnp.where(live22, k22, 0.0)
           + jnp.diag(jnp.where(live_ext, post.reg, 1.0).astype(dtype)))
    schur = k22 - jax.lax.dot_general(
        l21t, l21t, dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)
    l22 = jax.lax.linalg.cholesky(schur)

    # Trailing factor rows in natural column order: [L21[:, :n1] | L22].
    # (l21t columns for old-pad elim indices [n1, n_old) are zero, so the
    # :n1 slice loses nothing.)
    e2s_old = _e2s_device(post.g2e)
    l21_nat = jnp.take(l21t, e2s_old, axis=0)[:n1]    # (n1, m_ext)
    ext_rows = jnp.concatenate([l21_nat.T, l22], axis=1)  # (m_ext, n_new)

    # k_tt extension (get='ntk' only): old real rows gain the nngp cross
    # columns; trailing rows are [cross^T | nngp22], all masked.
    if get == "ntk":
        nngp_c_nat = jnp.take(nngp_c, e2s_old, axis=0)[:n1]   # (n1, m_ext)
        ktt_ext_rows = jnp.concatenate(
            [nngp_c_nat.T, jnp.where(live22, nngp22, 0.0)], axis=1)
    else:
        zshape = (m_ext, n_new)
        ktt_ext_rows = jnp.zeros(zshape, dtype)  # unused placeholder

    # Cyclic re-layout. The layout is stable under growth by whole quanta:
    # storage slot r on device d holds elimination row (d + p*(r//b))*b+r%b
    # for ANY n — old slots keep their ids, new slots append new ids. Rows
    # with e >= n1 (old pads) are REPLACED by the trailing factor rows.
    has_ktt = post.k_tt is not None

    def relayout_full(l_loc, x_loc, y_loc, ktt_loc, ktt_cross_loc,
                      ext_rows, x_ext, y_ext, ktt_ext):
        d = jax.lax.axis_index(ax)
        m_loc_old = l_loc.shape[0]
        m_loc_new = n_new // p
        rows = jnp.arange(m_loc_new)
        e_row = (d + p * (rows // b)) * b + rows % b
        keep = (e_row < n1)[:, None]
        idx = jnp.clip(e_row - n1, 0, m_ext - 1)

        l_old = jnp.zeros((m_loc_new, n_new), l_loc.dtype)
        l_old = l_old.at[:m_loc_old, :n_old].set(l_loc)
        l_out = jnp.where(keep, l_old, jnp.take(ext_rows, idx, axis=0))
        x_old = jnp.zeros((m_loc_new, x_loc.shape[1]), x_loc.dtype)
        x_old = x_old.at[:m_loc_old].set(x_loc)
        x_out = jnp.where(keep, x_old, jnp.take(x_ext, idx, axis=0))
        y_old = jnp.zeros((m_loc_new, y_loc.shape[1]), y_loc.dtype)
        y_old = y_old.at[:m_loc_old].set(y_loc)
        y_out = jnp.where(keep, y_old, jnp.take(y_ext, idx, axis=0))
        if has_ktt:
            k_old = jnp.zeros((m_loc_new, n_new), ktt_loc.dtype)
            k_old = k_old.at[:m_loc_old, :n_old].set(ktt_loc)
            cross_cols = jnp.zeros((m_loc_new, m_ext), ktt_loc.dtype)
            cross_cols = cross_cols.at[:m_loc_old].set(ktt_cross_loc)
            k_old = k_old.at[:, n1:].set(cross_cols)
            k_out = jnp.where(keep, k_old, jnp.take(ktt_ext, idx, axis=0))
        else:
            k_out = jnp.zeros((m_loc_new, 0), dtype)
        return l_out, x_out, y_out, k_out

    ktt_in = post.k_tt if has_ktt else jnp.zeros((n_old, 0), dtype)
    fn = shard_map(
        relayout_full, mesh=mesh,
        in_specs=(P(ax, None), P(ax, None), P(ax, None), P(ax, None),
                  P(ax, None), P(None, None), P(None, None), P(None, None),
                  P(None, None)),
        out_specs=(P(ax, None), P(ax, None), P(ax, None), P(ax, None)))
    l_new, x_storage, y_storage, ktt_new = fn(
        post.l, post.x_storage, post.y_storage, ktt_in, nngp_c,
        ext_rows, x_ext, y_ext, ktt_ext_rows)

    alpha = distributed_cho_solve(l_new, y_storage, mesh, ax, block_size=b)
    g2e_new = cyclic_storage_order(n_new, b, p)
    return DistributedPosterior(
        x_storage=x_storage, y_storage=y_storage, l=l_new, alpha=alpha,
        reg=post.reg, k_tt=ktt_new if has_ktt else None,
        spec=spec, get=get, mesh=mesh, axis_name=ax, block_size=b,
        g2e=tuple(int(i) for i in g2e_new), n_real=n1 + m_real,
        input_scale=post.input_scale,
    )


def sharded_predict_mean_std(spec: KernelSpec, x_test, x_train, l, alpha,
                             mesh: Mesh, axis_name: str = "data",
                             get: str = "nngp", k_tt=None):
    """Batched posterior (mean, std) with TEST rows sharded over the mesh —
    the serving fan-out while the factor fits one chip (L, X_train
    replicated). For get='ntk' pass the train NNGP Gram as k_tt. Use
    `DistributedPosterior.predict_mean_std` when n^2 exceeds one chip."""

    def block(x_te_local, x_tr, l_rep, alpha_rep, k_tt_rep):
        nngp_cross, ntk_cross = _cross_block(spec, x_te_local, x_tr)
        diag_ss, _ = apply_diag_recursion(input_diag(x_te_local), spec.layers)
        if get == "nngp":
            mean = nngp_cross @ alpha_rep
            v = jax.lax.linalg.triangular_solve(
                l_rep, nngp_cross.T, left_side=True, lower=True)
            var = diag_ss - jnp.sum(v * v, axis=0)
        else:
            mean = ntk_cross @ alpha_rep
            u = jax.lax.linalg.triangular_solve(
                l_rep, ntk_cross.T, left_side=True, lower=True)
            w = jax.lax.linalg.triangular_solve(
                l_rep, u, left_side=True, lower=True, transpose_a=True)
            kw = k_tt_rep @ w
            var = (diag_ss + jnp.sum(w * kw, axis=0)
                   - 2.0 * jnp.sum(nngp_cross.T * w, axis=0))
        return mean, jnp.sqrt(jnp.maximum(var, 0.0))

    if get == "ntk" and k_tt is None:
        raise ValueError("get='ntk' needs the train NNGP Gram (k_tt)")
    if k_tt is None:
        k_tt = jnp.zeros((0, 0), l.dtype)  # placeholder; unused for nngp
    fn = shard_map(
        block, mesh=mesh,
        in_specs=(P(axis_name, None), P(None, None), P(None, None),
                  P(None, None), P(None, None)),
        out_specs=(P(axis_name, None), P(axis_name)),
    )
    return fn(x_test, x_train, l, alpha, k_tt)
