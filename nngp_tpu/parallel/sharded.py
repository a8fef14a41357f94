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
from jax.experimental.shard_map import shard_map

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


def _gram_storage(spec, x_storage, x_natural, reg, mesh, axis_name, b, want_pair):
    """Kernel Gram in block-cyclic storage layout with the relative ridge
    fused into the (elimination-) diagonal — the unridged Gram never exists.

    x_storage: (n, d) rows permuted by cyclic_storage_order; sharded.
    x_natural: (n, d) natural order; replicated (n*d is tiny).
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
        diag_mask = (jnp.arange(x_full.shape[0])[None, :] == e_row[:, None])
        ridge = reg * diag_mask.astype(nngp.dtype)
        if want_pair:
            return nngp, ntk + ridge
        return nngp + ridge

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

    @property
    def num_train(self) -> int:
        return self.x_storage.shape[0]

    def alpha_natural(self):
        """alpha in natural train-row order (replicated; O(n))."""
        return self._unpermute(self.alpha)

    def x_natural(self):
        return self._unpermute(self.x_storage)

    def y_natural(self):
        return self._unpermute(self.y_storage)

    def _unpermute(self, arr):
        return jnp.take(arr, _e2s_device(self.g2e), axis=0)

    def _cross_grams(self, x_test):
        """(nngp, ntk) cross Grams of shape (n, n_te), TRAIN-row sharded in
        storage order — the large-n predict layout (n*n_te/p per device)."""
        fn = shard_map(
            lambda x_loc, x_te: _cross_block(self.spec, x_loc, x_te),
            mesh=self.mesh,
            in_specs=(P(self.axis_name, None), P(None, None)),
            out_specs=(P(self.axis_name, None), P(self.axis_name, None)),
        )
        return fn(self.x_storage, x_test)

    @jax.jit
    def predict_mean_std(self, x_test):
        """Batched posterior (mean, std) with the cross Gram sharded over
        train rows; solves run on the sharded factor. Mirrors
        GPPosterior.predict(compute_cov='diag') for both gets.

        Jitted (self is a pytree, mesh/layout fields are static): the whole
        serving step — cross Gram, distributed solves, variance — is ONE
        dispatch per batch shape, which matters behind a ~30 ms/dispatch
        TPU tunnel."""
        mesh, ax, bs = self.mesh, self.axis_name, self.block_size
        nngp_cross, ntk_cross = self._cross_grams(x_test)   # (n, te) sharded
        diag_ss, _ = apply_diag_recursion(input_diag(x_test),
                                          self.spec.layers)
        if self.get == "nngp":
            mean = nngp_cross.T @ self.alpha                # (te, 1)
            v = distributed_tri_solve_lower(self.l, nngp_cross, mesh, ax,
                                            block_size=bs)
            var = diag_ss - jnp.sum(v * v, axis=0)
            return mean, jnp.sqrt(jnp.maximum(var, 0.0))

        # get == 'ntk' (posterior formulas: nngp_tpu/gp/posterior.py)
        mean = ntk_cross.T @ self.alpha
        w = distributed_cho_solve(self.l, ntk_cross, mesh, ax, block_size=bs)
        # K_tt columns are in natural order -> contract against w in natural
        # row order (an O(n*te) gather, the one resharding this path needs).
        w_natural = jnp.take(w, _e2s_device(self.g2e), axis=0)
        kw = self.k_tt @ w_natural                          # (n, te) sharded
        var = (diag_ss + jnp.sum(w * kw, axis=0)
               - 2.0 * jnp.sum(nngp_cross * w, axis=0))
        return mean, jnp.sqrt(jnp.maximum(var, 0.0))

    def predict_mean_std_chunked(self, x_test, chunk: int = 8192):
        """(mean, std) over arbitrarily large test sets, `chunk` rows per
        dispatch — caps the sharded cross Gram at n*chunk/p per device."""
        from nngp_tpu.gp.posterior import chunked_predict
        return chunked_predict(self.predict_mean_std, x_test, chunk)


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
                    block_size: Optional[int] = None) -> DistributedPosterior:
    """Fit with the Gram row-sharded end to end: block-cyclic storage,
    ridge fused into the Gram epilogue, distributed Cholesky + solves.
    Per-device live memory stays ~n^2/p (+ O(n*b) panel temporaries).

    block_size: panel width of the cyclic layout (None -> n/p, i.e. plain
    contiguous blocks). Smaller panels (e.g. 256) load-balance the trailing
    updates across the mesh; n must be divisible by p*block_size.
    """
    if get not in ("nngp", "ntk"):
        raise ValueError(f"get must be 'nngp' or 'ntk', got {get!r}")
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    if y.ndim == 1:
        y = y[:, None]
    n = x.shape[0]
    p = mesh.devices.size
    b = n // p if block_size is None else int(block_size)
    if n % p or n % b or (n // b) % p:
        raise ValueError(
            f"n={n} must split into panels of block_size={b} with a "
            f"multiple of p={p} panels (n % (p*block_size) == 0)")
    g2e = cyclic_storage_order(n, b, p)

    # Relative ridge from the O(n) diagonal recursion (exact match of
    # diag(K) up to elementwise rounding) — no n x n eye, no second buffer.
    diag_nngp, diag_ntk = apply_diag_recursion(input_diag(x), spec.layers)
    diag_vec = diag_nngp if get == "nngp" else diag_ntk
    reg = (diag_reg * jnp.mean(diag_vec)).astype(x.dtype)

    g2e_dev = jnp.asarray(g2e)
    x_storage = jnp.take(x, g2e_dev, axis=0)
    y_storage = jnp.take(y, g2e_dev, axis=0)

    want_pair = get == "ntk"
    grams = _gram_storage(spec, x_storage, x, reg, mesh, axis_name, b,
                          want_pair)
    k_tt, solve_k = grams if want_pair else (None, grams)

    l = distributed_cholesky(solve_k, mesh, axis_name, block_size=b)
    alpha = distributed_cho_solve(l, y_storage, mesh, axis_name, block_size=b)
    return DistributedPosterior(
        x_storage=x_storage, y_storage=y_storage, l=l, alpha=alpha, reg=reg,
        k_tt=k_tt, spec=spec, get=get, mesh=mesh, axis_name=axis_name,
        block_size=b, g2e=tuple(int(i) for i in g2e),
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
