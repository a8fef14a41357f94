"""Nystrom (DTC) approximate GP posterior — the beyond-single-chip tier.

The exact fit's single-chip edge is ~70k rows (the triangular factor fills
HBM, BASELINE.md scale table) and the reference has no answer at all past
"materialize the N x N Gram" (`/root/reference/train.py:171-172`, fp64 CPU).
This module adds the classic scalable-GP construction, designed TPU-first:

    K  ~=  Q = K_nm K_mm^+ K_mn          (Nystrom, m inducing rows)

with the inducing set a seeded uniform subset of the training rows. The fit
is a STREAMING pass over row panels, so device state is O(m^2) regardless
of n, the panel loop is one compiled program re-dispatched per panel
(static shapes, zero-padded tail with a row mask), and n scales to millions
of rows on one chip at O(n m^2) MXU flops.

Numerics (each stage measured, not guessed):

  1. K_mm is eigendecomposed ON HOST in fp64 and truncated at
     rank_rtol * lam_max; the whitening basis W = V_k diag(lam_k^-1/2)
     ships back to the device. Truncation drops the directions whose fp32
     kernel-entry noise (~1e-7 relative) exceeds their signal.
  2. Each panel whitens BEFORE squaring: psi_p = W^T K_mp, then

         C  += psi_p psi_p^T      b += psi_p y_p      (fp32, HIGHEST)

     Squaring raw moments first (A' = K_mn K_nm) was measured fatal in
     fp32 at forest scale — eps * |A'| crosses the ridge after whitening
     and chol(C) NaNs (experiments/nystrom_acc2k.log, first design) —
     while the whitened accumulation keeps |C| ~ |K|, the same marginality
     the (working) exact fp32 fit lives at.
  3. The k x k solve stage runs ONCE on host in fp64 with eigenvalue
     clamping: C = V diag(max(lam, 0)) V^T, inv(C + rI) as an explicit
     symmetric square root ic = V diag(1/sqrt(max(lam,0) + r)) V^T.
     Rounding-noise directions (lam ~ eps * lam_max < 0 possible) fall
     back to the PRIOR (1/r) instead of breaking the factorization —
     robust at any n.

Predict is then pure MXU matmuls: psi* = W^T k_m*,

    mean = psi*^T beta,   var = k** - |psi*|^2 + r |ic^T psi*|^2   (DTC)

which algebraically equals "replace K by Q everywhere in the exact
posterior while keeping the TRUE prior diagonal k**" — and therefore
recovers the exact `gp.posterior.GPPosterior` (up to truncation) when the
inducing set is the whole train set (tests/test_nystrom.py).

get='ntk' (`gradient_descent_mse_ensemble` t=infinity semantics behind
`/root/reference/train.py:155-159`) is supported in full: both kernels are
Nystrom-approximated and the mixed covariance K** + w^T K_tt w - 2 K_*t w
(w = (Theta+rI)^-1 Theta_t*) reduces to k-dim quadratics through one extra
streamed whitened moment M1 = W_K^T K_mn Theta_nm W_T.

Online extension is EXACT for this model class: the moments are sums over
rows, so `extend` accumulates the new panels and re-runs the k x k solve
stage — O(s m^2 + m^3) for s new rows, no approximation drift, the same
serving story as the exact tier's block-Cholesky append.
"""

import dataclasses
from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nngp_tpu.models.kernel_spec import KernelSpec, apply_diag_recursion
from nngp_tpu.ops.gram import input_diag

_DEFAULT_PANEL = 16384


def _default_rank_rtol(dtype, moments: str = "fp32") -> float:
    # K_mm eigenpairs below rank_rtol * lam_max are dropped from the
    # whitening basis. Measured on the fp32 forest workload (10.8k train,
    # experiments/nystrom_acc10k8*.log): accuracy improves MONOTONICALLY as
    # the cut loosens — m=2048 median q 3.56 (1e-5) -> 2.89 (1e-6) -> 2.71
    # (1e-8); m=4096 @ 1e-8 reaches 2.64 vs exact 2.60 — and stds stay
    # finite, because the host solve stage's eigenvalue clamping already
    # owns the noise floor. 1e-8 keeps the tail that carries signal while
    # still dropping the strictly-rounding directions.
    #
    # The fp32 floor is set by the K_mm ENTRY noise (eps32 ~ 6e-8 of
    # lam_max): eigendirections below it are unidentifiable, so cutting
    # deeper buys nothing. That floor — not arithmetic anywhere else —
    # owns the measured fp32-vs-fp64 serving gap (2.52 vs 2.40 at 90k
    # m=2048: an all-fp64 pipeline PINNED to rtol=1e-8 scores 2.51,
    # experiments/nystrom_prec_attrib.log). moments='df64' computes the
    # K_mm entries in double-float (~1e-13 relative), so its default cut
    # drops to 1e-12 — above the df64 entry noise with margin, deep
    # enough to recover the signal-carrying tail directions.
    if dtype == jnp.float64:
        return 1e-14
    return 1e-12 if moments == "df64" else 1e-8


def _panel_delta(spec, get, precision, x_m, w_solve, w_kmm, x_p, y_p, mask):
    """Whitened-moment contribution of one row panel. Masked rows (the
    zero-padded tail) contribute exactly zero. Pure function of the rows —
    the single-device and mesh-sharded accumulators both call this."""
    with jax.default_matmul_precision(precision):
        nngp_pm, ntk_pm = spec.kernel_fn(x_p, x_m, ("nngp", "ntk"))
        solve_pm = ntk_pm if get == "ntk" else nngp_pm
        psi = w_solve.T @ (solve_pm * mask[:, None]).T      # (k, p)
        dc = psi @ psi.T
        db = psi @ (y_p * mask[:, None])
        if get == "ntk":
            psi_k = w_kmm.T @ (nngp_pm * mask[:, None]).T   # (k2, p)
            dm1 = psi_k @ (w_solve.T @ ntk_pm.T).T
        else:
            dm1 = jnp.zeros((w_kmm.shape[1], w_solve.shape[1]), x_p.dtype)
        # relative-ridge trace of the TRUE solve-kernel diagonal (same
        # semantics as the exact fit: r = diag_reg * mean(diag))
        dn, dt = apply_diag_recursion(input_diag(x_p), spec.layers)
        dvec = dt if get == "ntk" else dn
        dd = jnp.sum(dvec * mask)
        dy2 = jnp.sum((y_p * mask[:, None]) ** 2)
    return dc, db, dm1, dd, dy2


@partial(jax.jit, static_argnames=("spec", "get", "precision"))
def _accumulate_panel(spec, get, precision, x_m, w_solve, w_kmm,
                      x_p, y_p, mask, c_raw, b_w, m1_w, diag_sum, yty):
    """One streamed panel: whitened moments += panel contribution."""
    dc, db, dm1, dd, dy2 = _panel_delta(spec, get, precision, x_m, w_solve,
                                        w_kmm, x_p, y_p, mask)
    return c_raw + dc, b_w + db, m1_w + dm1, diag_sum + dd, yty + dy2


def _panel_delta_df64(spec, get, x_m, w_solve, w_kmm, x_p, y_p, mask):
    """`_panel_delta` in emulated fp64 (`ops/df64_kernel.py`): kernel
    entries AND the whitened projection/moment products carry ~1e-13
    relative — removing the two fp32 noise sources at the whitening
    amplification bound (the attributed ~5% fp32 median-q penalty,
    BASELINE.md). `w_solve`/`w_kmm` are DF PAIRS (the fp64 whitening
    basis, `_inducing_bases(entries='df64')`) — at deep rank cuts the
    fp32-rounded basis alone costs +15% median q
    (experiments/nystrom_cut_depth.py). Returns DF moments; dd/dy2 stay
    fp32 (they only set the relative ridge / evidence constant)."""
    from nngp_tpu.ops.df64 import DF, df_from_f32, hp_matmul, \
        hp_matmul_blocked
    from nngp_tpu.ops.df64_kernel import df_kernel_eval

    if get == "ntk":
        nngp_pm, ntk_pm = df_kernel_eval(spec.layers, x_p, x_m,
                                         ("nngp", "ntk"))
        solve_pm = ntk_pm
    else:
        nngp_pm = df_kernel_eval(spec.layers, x_p, x_m, "nngp")
        solve_pm = nngp_pm
    w_solve_t = DF(w_solve.hi.T, w_solve.lo.T)
    msk = mask[:, None]
    solve_m = DF(solve_pm.hi * msk, solve_pm.lo * msk)  # 0/1 mask: exact
    psi = hp_matmul(w_solve_t, solve_m,
                    transpose_b=True)                   # (k, p)
    dc = hp_matmul_blocked(psi, psi, transpose_b=True)
    yv = y_p * msk
    db = hp_matmul_blocked(psi, df_from_f32(yv))
    if get == "ntk":
        nngp_m = DF(nngp_pm.hi * msk, nngp_pm.lo * msk)
        psi_k = hp_matmul(DF(w_kmm.hi.T, w_kmm.lo.T), nngp_m,
                          transpose_b=True)             # (k2, p)
        psi_t = hp_matmul(w_solve_t, solve_pm,
                          transpose_b=True)             # unmasked 2nd factor
        dm1 = hp_matmul_blocked(psi_k, psi_t, transpose_b=True)
    else:
        z = jnp.zeros((w_kmm.hi.shape[1], w_solve.hi.shape[1]),
                      jnp.float32)
        dm1 = DF(z, z)
    dn, dt = apply_diag_recursion(input_diag(x_p), spec.layers)
    dvec = dt if get == "ntk" else dn
    dd = jnp.sum(dvec * mask)
    dy2 = jnp.sum(yv ** 2)
    return dc, db, dm1, dd, dy2


@partial(jax.jit, static_argnames=("spec", "get"))
def _accumulate_panel_df64(spec, get, x_m, w_solve, w_kmm,
                           x_p, y_p, mask, c_raw, b_w, m1_w, diag_sum,
                           yty):
    """df64 panel accumulation: c_raw/b_w/m1_w are DF pairs — the
    cross-panel sums stay exact to ~2^-48 (the extend/forget moment
    algebra is then as bit-stable as the fp32 path's, at fp64 grade)."""
    from nngp_tpu.ops.df64 import df_add

    dc, db, dm1, dd, dy2 = _panel_delta_df64(spec, get, x_m, w_solve,
                                             w_kmm, x_p, y_p, mask)
    return (df_add(c_raw, dc), df_add(b_w, db), df_add(m1_w, dm1),
            diag_sum + dd, yty + dy2)


@lru_cache(maxsize=None)
def _sharded_panel_fn(mesh, axis_name, spec, get, precision,
                      moments="fp32"):
    """Compiled mesh-sharded panel accumulator: panel rows are sharded over
    `axis_name`, each device computes its local whitened moments on its own
    MXU, and one psum over ICI reduces the (k, k)-sized deltas — comm is
    O(k^2) per panel, independent of n. The small replicated accumulators
    ride through so each panel is ONE dispatch. (Caches the compiled
    FUNCTION per (mesh, spec, ...) — never traced arrays.)

    moments='df64': each device's delta is a DF pair; the psum reduces hi
    and lo separately (componentwise fp32 rounding ~eps32 * |delta| — NOT
    whitening-amplified, since the delta is already in the whitened
    basis) and a two_sum renormalizes before the df accumulator add."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    if moments == "df64":
        from nngp_tpu.ops.df64 import DF, df_add, _two_sum

        def body(x_m, w_solve, w_kmm, x_p, y_p, mask,
                 c_raw, b_w, m1_w, diag_sum, yty):
            dc, db, dm1, dd, dy2 = _panel_delta_df64(
                spec, get, x_m, w_solve, w_kmm, x_p, y_p, mask)

            def red(d):
                return DF(*_two_sum(jax.lax.psum(d.hi, axis_name),
                                    jax.lax.psum(d.lo, axis_name)))

            return (df_add(c_raw, red(dc)), df_add(b_w, red(db)),
                    df_add(m1_w, red(dm1)),
                    diag_sum + jax.lax.psum(dd, axis_name),
                    yty + jax.lax.psum(dy2, axis_name))
    else:
        def body(x_m, w_solve, w_kmm, x_p, y_p, mask,
                 c_raw, b_w, m1_w, diag_sum, yty):
            dc, db, dm1, dd, dy2 = _panel_delta(spec, get, precision, x_m,
                                                w_solve, w_kmm, x_p, y_p,
                                                mask)
            return (c_raw + jax.lax.psum(dc, axis_name),
                    b_w + jax.lax.psum(db, axis_name),
                    m1_w + jax.lax.psum(dm1, axis_name),
                    diag_sum + jax.lax.psum(dd, axis_name),
                    yty + jax.lax.psum(dy2, axis_name))

    acc = P()
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis_name, None), P(axis_name, None),
                  P(axis_name), acc, acc, acc, acc, acc),
        out_specs=(acc, acc, acc, acc, acc))
    return jax.jit(fn)


def _whiten_basis(kmm64: np.ndarray, rank_rtol: float) -> np.ndarray:
    """Truncated inverse-sqrt eigenbasis W (m, k): W^T K_mm W = I_k."""
    lam, v = np.linalg.eigh(0.5 * (kmm64 + kmm64.T))
    keep = lam > rank_rtol * max(lam[-1], 0.0)
    if not np.any(keep):
        raise ValueError(
            "K_mm has no eigenvalue above rank_rtol * lam_max — degenerate "
            "inducing set (all-identical rows?)")
    return v[:, keep] / np.sqrt(lam[keep])[None, :]


def _lam_max_estimate(sym64: np.ndarray, iters: int = 16) -> float:
    """Power-iteration lambda_max of a symmetric PSD matrix — O(iters m^2),
    negligible next to any factorization of it."""
    v = np.full(sym64.shape[0], 1.0 / np.sqrt(sym64.shape[0]))
    lam = 0.0
    for _ in range(iters):
        w = sym64 @ v
        lam = float(v @ w)
        nrm = float(np.linalg.norm(w))
        if nrm == 0.0:
            return 0.0
        v = w / nrm
    return max(lam, float(np.max(np.diag(sym64))))


def _whiten_basis_chol(kmm64: np.ndarray, rank_rtol: float) -> np.ndarray:
    """Jittered-Cholesky whitening basis W = chol(K_mm + j I)^-T (m, m):
    W^T K_mm W = I - j W W^T ~= I, with j = rank_rtol * lam_max escalated
    10x until the factorization succeeds (fp32 kernel noise can leave the
    fp64 copy slightly indefinite). The standard "jittered Nystrom"
    regularization — it DAMPS the noise directions the eigh basis DROPS.
    ~5x cheaper than eigh on this image's single core (m=2048: chol+trtri
    1.3 s vs eigh 3.5 s) and the speed default: measured q-error parity
    with the eigh basis on the fp32 forest workload
    (experiments/nystrom_whiten_ab.log)."""
    from scipy.linalg import lapack

    sym = 0.5 * (kmm64 + kmm64.T)
    m = sym.shape[0]
    lam_max = _lam_max_estimate(sym)
    if lam_max <= 0.0:
        raise ValueError(
            "K_mm has non-positive spectrum — degenerate inducing set "
            "(all-identical rows?)")
    jitter = rank_rtol * lam_max
    for _ in range(8):
        try:
            ell = np.linalg.cholesky(sym + jitter * np.eye(m))
        except np.linalg.LinAlgError:
            jitter *= 10.0
            continue
        li, info = lapack.dtrtri(ell, lower=1)
        if info != 0:
            jitter *= 10.0
            continue
        return np.ascontiguousarray(li.T)
    raise np.linalg.LinAlgError(
        "K_mm not factorizable even at jitter "
        f"{jitter:.3e} (lam_max ~ {lam_max:.3e})")


@jax.jit
def _basis_device_jit(kmm, jitter):
    """Device analog of `_whiten_basis_chol` in emulated fp64
    (`ops/df64.py`): W = inv(chol(K_mm + j I))^T, fp32 out. Instead of
    the host path's 10x jitter-escalation retry loop, pivots are floored
    at the jitter itself — per-direction escalation with the same
    semantics (noise directions get damped), no host control flow."""
    from nngp_tpu.ops.df64 import (DF, _two_sum, df_from_f32,
                                   _df_chol_blocks, _df_trtri_blocks,
                                   _assemble, df_round)

    m = kmm.shape[0]
    sym = 0.5 * (kmm + kmm.T)
    # lam_max estimate: fp32 power iteration (16 matvecs, MXU)
    def body(_, v):
        w = sym @ v
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)
    v = jax.lax.fori_loop(0, 16, body,
                          jnp.full((m,), 1.0 / jnp.sqrt(m * 1.0),
                                   sym.dtype))
    lam_max = jnp.maximum(v @ (sym @ v), jnp.max(jnp.diag(sym)))
    j = jitter * lam_max
    diag = jnp.arange(m)
    d_hi, d_lo = _two_sum(sym[diag, diag], jnp.broadcast_to(j, (m,)))
    a = DF(sym.at[diag, diag].set(d_hi),
           jnp.zeros_like(sym).at[diag, diag].set(d_lo))
    l_blocks, inv_diag, nb, blk = _df_chol_blocks(a, 512, j)
    x = _df_trtri_blocks(l_blocks, inv_diag, nb)
    return df_round(_assemble(x, nb, blk, m).T)


@jax.jit
def _basis_device_df64_jit(kmm_hi, kmm_lo, jitter):
    """`_basis_device_jit` fed double-float K_mm ENTRIES (moments='df64'
    fits): the factorization starts from ~1e-13-relative kernel values,
    so rank cuts down to ~1e-12 * lam_max see real eigendirections
    instead of fp32 entry noise. Returns the basis as a DF PAIR — fp32
    rounding of W alone perturbs the whitening identity W^T K_mm W = I
    by O(eps32 * sqrt(lam_max / lam_cut)) ~ 0.1 at a 1e-12 cut, which
    the finalize stage (it substitutes I for W^T K_mm W) turns into a
    model error; measured +15% median q at 18k
    (experiments/nystrom_cut_depth.py). Every consumer keeps the pair."""
    from nngp_tpu.ops.df64 import (DF, df_add, df_from_f32,
                                   _df_chol_blocks, _df_trtri_blocks,
                                   _assemble)

    m = kmm_hi.shape[0]
    sym = DF(0.5 * (kmm_hi + kmm_hi.T), 0.5 * (kmm_lo + kmm_lo.T))
    # lam_max estimate on the hi part: fp32 accuracy is plenty for a
    # jitter SCALE (the pivot floor absorbs the slack)
    sym_hi = sym.hi

    def body(_, v):
        w = sym_hi @ v
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)
    v = jax.lax.fori_loop(0, 16, body,
                          jnp.full((m,), 1.0 / jnp.sqrt(m * 1.0),
                                   sym_hi.dtype))
    lam_max = jnp.maximum(v @ (sym_hi @ v), jnp.max(jnp.diag(sym_hi)))
    j = jitter * lam_max
    diag = jnp.arange(m)
    d = df_add(DF(sym.hi[diag, diag], sym.lo[diag, diag]),
               df_from_f32(jnp.broadcast_to(j, (m,))))
    a = DF(sym.hi.at[diag, diag].set(d.hi),
           sym.lo.at[diag, diag].set(d.lo))
    l_blocks, inv_diag, nb, blk = _df_chol_blocks(a, 512, j)
    x = _df_trtri_blocks(l_blocks, inv_diag, nb)
    w = _assemble(x, nb, blk, m)
    return DF(w.hi.T, w.lo.T)


def _df_split64(w64: np.ndarray):
    """np.float64 -> (hi, lo) fp32 numpy pair, hi = round(w), lo exact."""
    hi = np.asarray(w64, np.float32)
    lo = np.asarray(w64 - np.asarray(hi, np.float64), np.float32)
    return hi, lo


_BASES_CACHE = {}                       # host numpy results only
_BASES_CACHE_MAX = 4


def _inducing_bases(spec, get, rank_rtol, x_m, whiten="chol",
                    device=False, entries="fp32"):
    """Whitening bases from the device-computed K_mm kernels.

    entries='df64' (moments='df64' fits): K_mm entries come from the
    double-float kernel recursion (`ops/df64_kernel.py`, ~1e-13 relative)
    instead of the fp32 one — the precondition for rank cuts below the
    fp32 entry-noise floor (see `_default_rank_rtol`). Host whitening
    consumes hi + lo as a true fp64 matrix; device whitening factorizes
    the DF pair directly (`_basis_device_df64_jit`). The bases are then
    RETURNED as DF pairs: at deep cuts the fp32 rounding of W itself is
    the binding noise source (it breaks W^T K_mm W = I by
    eps32 * sqrt(lam_max / lam_cut), measured +15% median q at a 1e-12
    cut, experiments/nystrom_cut_depth.py), so every moment/predict
    projection keeps the pair.

    whiten='chol' (default): jittered-Cholesky basis, ~5x cheaper on host;
    whiten='eigh': eigenvalue-truncated basis (the semantics anchor).
    device=True (finalize='device' fits, 'chol' only): the emulated-fp64
    factorization runs on the accelerator (`_basis_device_jit`) — no K_mm
    fetch, no single-core LAPACK; pays off on cold fits and every
    `grow_inducing` (fresh inducing set = guaranteed cache miss).

    Cached on the VALUE of the inducing set (sha1 of its bytes + spec/get/
    rtol/whiten/device): the factorization costs seconds on this image's
    single CPU core, and repeated fits with the same inducing rows
    (active-learning full refits, best-of-N timing loops) would otherwise
    pay it every time. The cache holds CONCRETE arrays — host numpy or
    committed device buffers, never traced values (CLAUDE.md lru_cache
    rule) — and is tiny (<= 4 entries of ~m*k floats)."""
    import hashlib

    if device and whiten != "chol":
        raise ValueError("device bases require whiten='chol' (the eigh "
                         "basis is a host semantics anchor)")
    basis_fn = _whiten_basis_chol if whiten == "chol" else _whiten_basis
    x_np = np.asarray(x_m)
    df64 = entries == "df64"

    def _conv(c):
        # cache holds numpy (hi, lo) tuples / DF device pairs for df64,
        # plain arrays otherwise; DF is a NamedTuple so [0]/[1] covers both
        if c is None:
            return None
        if df64:
            from nngp_tpu.ops.df64 import DF
            return DF(jnp.asarray(c[0], x_m.dtype),
                      jnp.asarray(c[1], x_m.dtype))
        return jnp.asarray(c, x_m.dtype)

    key = (spec, get, float(rank_rtol), whiten, bool(device), entries,
           str(x_np.dtype), x_np.shape,
           hashlib.sha1(x_np.tobytes()).hexdigest())
    hit = _BASES_CACHE.get(key)
    if hit is not None:
        w_solve_c, w_kmm_c = hit
        return _conv(w_solve_c), _conv(w_kmm_c)

    if df64:
        from nngp_tpu.ops.df64_kernel import df_kernel_eval
        gets = ("nngp", "ntk") if get == "ntk" else ("nngp",)
        kmms = df_kernel_eval(spec.layers, x_m, x_m, gets)
    if device:
        jit32 = jnp.float32(rank_rtol)
        if df64:
            if get == "ntk":
                kmm_nngp, kmm_solve = kmms
                w_kmm_c = _basis_device_df64_jit(kmm_nngp.hi, kmm_nngp.lo,
                                                 jit32)
            else:
                kmm_solve, = kmms
                w_kmm_c = None
            w_solve_c = _basis_device_df64_jit(kmm_solve.hi, kmm_solve.lo,
                                               jit32)
        elif get == "ntk":
            kmm_nngp, kmm_solve = spec.kernel_fn(x_m, x_m, ("nngp", "ntk"))
            w_kmm_c = _basis_device_jit(kmm_nngp, jit32)
            w_solve_c = _basis_device_jit(kmm_solve, jit32)
        else:
            kmm_solve = spec.kernel_fn(x_m, x_m, "nngp")
            w_kmm_c = None
            w_solve_c = _basis_device_jit(kmm_solve, jit32)
    else:
        if df64:
            def _to64(k):
                return (np.asarray(k.hi, np.float64)
                        + np.asarray(k.lo, np.float64))
            if get == "ntk":
                kmm_nngp64, kmm_solve64 = (_to64(k) for k in kmms)
            else:
                kmm_solve64, = (_to64(k) for k in kmms)
                kmm_nngp64 = None
        elif get == "ntk":
            kmm_nngp, kmm_solve = spec.kernel_fn(x_m, x_m, ("nngp", "ntk"))
            kmm_nngp64 = np.asarray(kmm_nngp, np.float64)
            kmm_solve64 = np.asarray(kmm_solve, np.float64)
        else:
            kmm_solve64 = np.asarray(spec.kernel_fn(x_m, x_m, "nngp"),
                                     np.float64)
            kmm_nngp64 = None
        w_kmm_c = (basis_fn(kmm_nngp64, rank_rtol)
                   if kmm_nngp64 is not None else None)
        w_solve_c = basis_fn(kmm_solve64, rank_rtol)
        if df64:
            # keep the fp64 basis as an fp32 (hi, lo) pair — see docstring
            w_solve_c = _df_split64(w_solve_c)
            w_kmm_c = (_df_split64(w_kmm_c)
                       if w_kmm_c is not None else None)
    if len(_BASES_CACHE) >= _BASES_CACHE_MAX:
        _BASES_CACHE.pop(next(iter(_BASES_CACHE)))
    _BASES_CACHE[key] = (w_solve_c, w_kmm_c)
    return _conv(w_solve_c), _conv(w_kmm_c)


@jax.jit
def _finalize_device_df64_jit(c: "DF", b: "DF", reg):
    """Device finalize fed full df64 moments: the k x k factorization
    starts from the ~2^-48 moment value instead of its fp32 rounding."""
    from nngp_tpu.ops.df64 import df_cholesky_inverse_factor

    ic, beta, _ld = df_cholesky_inverse_factor(
        c.hi, reg, b.hi, pivot_floor_rel=1.0, c_lo=c.lo, b_lo=b.lo)
    return ic, beta


@jax.jit
def _finalize_device_jit(c_raw, b_w, reg):
    """On-device finalize in emulated fp64 (`ops/df64.py`): same contract
    as `_finalize_host` — ic ic^T = (C + rI)^-1, beta = that @ b — but no
    16 MB device->host fetch, no single-core fp64 LAPACK, no host->device
    ship-back. `reg` stays a traced operand (matches the traced-ridge
    policy of `_fit_impl`). Pivots floored at reg: in exact arithmetic
    every Schur pivot of C + rI is >= r (C is PSD), so a smaller pivot is
    fp32 moment noise and reverts to the ridge prior — the device analog
    of the host fallback's eigenvalue clamp."""
    from nngp_tpu.ops.df64 import df_cholesky_inverse_factor

    ic, beta, _ld = df_cholesky_inverse_factor(c_raw, reg, b_w,
                                               pivot_floor_rel=1.0)
    return ic, beta


def _finalize(c_raw, b_w, reg, dtype, mode: str):
    """Dispatch the k x k solve stage: 'host' (fp64 LAPACK via the
    tunnel) or 'device' (emulated-fp64 on the MXU, fp32 posteriors
    only). c_raw/b_w may be DF pairs (moments='df64') — both backends
    then consume the full double-float moment value."""
    from nngp_tpu.ops.df64 import DF

    if mode == "device":
        if dtype != jnp.float32:
            raise ValueError("finalize='device' runs the emulated-fp64 "
                             f"path (fp32 posteriors only), got {dtype}")
        if isinstance(c_raw, DF):
            return _finalize_device_df64_jit(c_raw, b_w, reg)
        return _finalize_device_jit(c_raw, b_w, reg)
    return _finalize_host(c_raw, b_w, reg, dtype)


def _resolve_finalize(mode: str, dtype) -> str:
    """'auto' -> 'device' on a TPU backend for fp32 posteriors (no host
    round-trip), 'host' otherwise (CPU fp64 LAPACK is native there)."""
    if mode not in ("host", "device", "auto"):
        raise ValueError(
            f"finalize must be 'host', 'device' or 'auto', got {mode!r}")
    if mode == "auto":
        return ("device" if jax.default_backend() == "tpu"
                and dtype == jnp.float32 else "host")
    return mode


def _finalize_host(c_raw, b_w, reg, dtype):
    """Host-fp64 k x k solve stage: returns (ic, beta) with
    ic ic^T = (C + r I)^-1 and beta = that @ b. Cholesky first (~3x
    cheaper than eigh on this single-core host; any square-root factor of
    the inverse serves predict/evidence identically). If fp32 accumulation
    noise left C + rI indefinite, fall back to the eigenvalue-clamped
    inverse root: noise directions (lam ~ eps * lam_max < 0 possible)
    revert to the PRIOR (1/r) instead of breaking the factorization —
    robust at any n."""
    from scipy.linalg import lapack

    from nngp_tpu.ops.df64 import DF

    if isinstance(c_raw, DF):
        c_np = (np.asarray(c_raw.hi, np.float64)
                + np.asarray(c_raw.lo, np.float64))
        b_np = (np.asarray(b_w.hi, np.float64)
                + np.asarray(b_w.lo, np.float64))
    else:
        c_np, b_np = np.asarray(c_raw, np.float64), np.asarray(b_w)
    c64 = 0.5 * (c_np + c_np.T)
    ic64 = None
    try:
        ell = np.linalg.cholesky(c64 + float(reg) * np.eye(c64.shape[0]))
        li, info = lapack.dtrtri(ell, lower=1)
        if info == 0:
            ic64 = np.ascontiguousarray(li.T)
    except np.linalg.LinAlgError:
        pass
    if ic64 is None:
        lam, v = np.linalg.eigh(c64)
        lam = np.maximum(lam, 0.0)      # fp32 accumulation noise -> prior
        inv_sqrt = 1.0 / np.sqrt(lam + float(reg))
        ic64 = v * inv_sqrt[None, :]
    beta64 = ic64 @ (ic64.T @ np.asarray(b_np, np.float64))
    return jnp.asarray(ic64, dtype), jnp.asarray(beta64, dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class NystromPosterior:
    """Device-resident Nystrom/DTC posterior. A pytree: jit-safe,
    checkpointable. Same predict surface as `GPPosterior`."""

    x_m: jax.Array                    # (m, d) inducing rows (prescaled units)
    w_solve: jax.Array                # (m, k) truncated whitening basis of
                                      # the solve-kernel K_mm
    ic: jax.Array                     # (k, k) symmetric factor:
                                      # ic ic^T = (clamp(C) + r I)^-1
    beta_w: jax.Array                 # (k, 1) whitened weights
    reg: jax.Array                    # scalar ridge actually used
    # whitened streamed moments, kept for exact online `extend`
    c_raw: jax.Array                  # (k, k) sum psi psi^T (solve kernel)
    b_w: jax.Array                    # (k, 1) sum psi y
    diag_sum: jax.Array               # scalar: sum of true solve-kernel diag
    m1_w: Optional[jax.Array]         # (k2, k) W_K^T K_mn T_nm W_T, ntk only
    w_kmm: Optional[jax.Array]        # (m, k2) NNGP whitening, ntk only
    spec: KernelSpec = dataclasses.field(metadata=dict(static=True))
    get: str = dataclasses.field(metadata=dict(static=True), default="nngp")
    diag_reg: float = dataclasses.field(metadata=dict(static=True),
                                        default=1e-3)
    num_train: int = dataclasses.field(metadata=dict(static=True), default=0)
    input_scale: float = dataclasses.field(metadata=dict(static=True),
                                           default=1.0)
    precision: str = dataclasses.field(metadata=dict(static=True),
                                       default="highest")
    rank_rtol: float = dataclasses.field(metadata=dict(static=True),
                                         default=1e-6)
    panel_size: int = dataclasses.field(metadata=dict(static=True),
                                        default=_DEFAULT_PANEL)
    # k x k solve stage: 'host' (fp64 LAPACK) or 'device' (emulated-fp64
    # on the MXU, ops/df64.py) — extend/forget/grow reuse the fit's choice
    finalize: str = dataclasses.field(metadata=dict(static=True),
                                      default="host")
    # runtime-only: moment streaming shards panel rows over this mesh
    # (never serialized — reattach after checkpoint restore)
    mesh: Optional[object] = dataclasses.field(
        metadata=dict(static=True), default=None)
    mesh_axis: str = dataclasses.field(metadata=dict(static=True),
                                       default="data")
    # streamed sum of y^2 (prescale-independent: y is never scaled) — the
    # one extra moment the closed-form DTC evidence needs. None on
    # posteriors fitted before evidence tracking (old checkpoints);
    # extend keeps it None then, so a stale partial sum can never
    # masquerade as the real quadratic term.
    yty: Optional[jax.Array] = None
    # moments='df64': the double-float tails of c_raw/b_w/m1_w (the hi
    # parts live in the canonical fields, so every fp32-only consumer —
    # capacity_gap, checkpoints of older readers — still sees the
    # rounded moments). None on fp32-moment posteriors.
    c_lo: Optional[jax.Array] = None
    b_lo: Optional[jax.Array] = None
    m1_lo: Optional[jax.Array] = None
    # moment streaming precision: 'fp32' (6-pass MXU) or 'df64'
    # (emulated-fp64 kernels + Ozaki projection, `ops/df64_kernel.py`)
    moments: str = dataclasses.field(metadata=dict(static=True),
                                     default="fp32")
    # moments='df64': fp32 TAILS of the whitening bases — w_solve/w_kmm
    # hold the hi halves, these complete the fp64 basis as a DF pair
    # (`_inducing_bases(entries='df64')`). Required for deep rank cuts:
    # a rounded basis breaks W^T K_mm W = I by eps32*sqrt(lam_max/lam_cut)
    # (measured +15% median q at 1e-12, experiments/nystrom_cut_depth.py).
    # None on fp32-moment posteriors; df64 checkpoints predating the tails
    # fall back to a zero tail (consistent, just noisier at deep cuts).
    w_solve_lo: Optional[jax.Array] = None
    w_kmm_lo: Optional[jax.Array] = None

    @property
    def num_inducing(self) -> int:
        return self.x_m.shape[0]

    @property
    def rank(self) -> int:
        """Whitening-basis dimension after eigenvalue truncation."""
        return self.w_solve.shape[1]

    # ------------------------------------------------------------- predict
    def _df64_projections(self, x_test, need_kmm=True):
        """Whitened projections of the test cross-kernels computed in
        emulated fp64, rounded to fp32 AFTER the projection. At deep rank
        cuts the projection amplifies cross-kernel entry noise by
        lam^-1/2 (up to sqrt(lam_max/lam_cut) ~ 1e6 relative at 1e-12),
        so fp32 entries/products here would corrupt exactly the deep
        directions the df64 fit recovered; rounding the RESULT is
        componentwise eps32 — benign. Returns psi ('nngp') or
        (psi_t, psi_k) ('ntk'), fp32."""
        from nngp_tpu.ops.df64 import DF, hp_matmul, df_round
        from nngp_tpu.ops.df64_kernel import df_kernel_eval

        w_s, w_k = self._w_pair()
        w_st = DF(w_s.hi.T, w_s.lo.T)
        if self.get == "nngp":
            cross = df_kernel_eval(self.spec.layers, x_test, self.x_m,
                                   "nngp")
            return df_round(hp_matmul(w_st, cross, transpose_b=True))
        nngp_c, ntk_c = df_kernel_eval(self.spec.layers, x_test, self.x_m,
                                       ("nngp", "ntk"))
        psi_t = df_round(hp_matmul(w_st, ntk_c, transpose_b=True))
        if not need_kmm:
            return psi_t, None
        psi_k = df_round(hp_matmul(DF(w_k.hi.T, w_k.lo.T), nngp_c,
                                   transpose_b=True))
        return psi_t, psi_k

    def _predict_scaled(self, x_test, compute_cov):
        if self.input_scale != 1.0:
            x_test = x_test * (1.0 / self.input_scale)
        df64 = self.moments == "df64"
        with jax.default_matmul_precision(self.precision):
            if self.get == "nngp":
                if df64:
                    psi = self._df64_projections(x_test)   # (k, mt)
                else:
                    cross = self.spec.kernel_fn(x_test, self.x_m, "nngp")
                    psi = self.w_solve.T @ cross.T         # (k, mt)
                mean = psi.T @ self.beta_w
                if compute_cov is False:
                    return mean
                h = self.ic.T @ psi
                if compute_cov == "diag":
                    var = (self.spec.diag_fn(x_test, "nngp")
                           - jnp.sum(psi * psi, axis=0)
                           + self.reg * jnp.sum(h * h, axis=0))
                    return mean, jnp.maximum(var, 0.0)
                k_ss = self.spec.self_kernel(x_test, "nngp")  # exact diagonal
                return mean, k_ss - psi.T @ psi + self.reg * (h.T @ h)

            # get == 'ntk': Nystrom both kernels in the mixed covariance
            if df64:
                psi_t, psi_k = self._df64_projections(
                    x_test, need_kmm=(compute_cov is not False))
            else:
                nngp_cross, ntk_cross = self.spec.kernel_fn(
                    x_test, self.x_m, ("nngp", "ntk"))
                psi_t = self.w_solve.T @ ntk_cross.T       # (k, mt)
            mean = psi_t.T @ self.beta_w
            if compute_cov is False:
                return mean
            # (C + rI)^-1 psi_t in the whitened basis
            ct = self.ic @ (self.ic.T @ psi_t)             # (k, mt)
            g = self.m1_w @ ct                             # (k2, mt)
            if not df64:
                psi_k = self.w_kmm.T @ nngp_cross.T        # (k2, mt)
            if compute_cov == "diag":
                var = (self.spec.diag_fn(x_test, "nngp")
                       + jnp.sum(g * g, axis=0)
                       - 2.0 * jnp.sum(psi_k * g, axis=0))
                return mean, jnp.maximum(var, 0.0)
            k_ss = self.spec.self_kernel(x_test, "nngp")  # exact diagonal
            return mean, k_ss + g.T @ g - psi_k.T @ g - g.T @ psi_k

    @partial(jax.jit, static_argnames=("compute_cov",))
    def predict(self, x_test, compute_cov=True):
        """Posterior (mean, cov) in raw input units — `GPPosterior.predict`
        semantics with K replaced by its Nystrom approximation (the prior
        diagonal k** stays exact, i.e. the DTC predictive)."""
        out = self._predict_scaled(x_test, compute_cov)
        if compute_cov is False or self.input_scale == 1.0:
            return out
        mean, v = out
        return mean, v * (self.input_scale * self.input_scale)

    @jax.jit
    def predict_mean_std(self, x_test):
        """(mean, std); std compensated after the sqrt so fp32 stays finite
        at any input_scale (see `GPPosterior.predict_mean_std`)."""
        mean, var = self._predict_scaled(x_test, "diag")
        return mean, jnp.sqrt(var) * self.input_scale

    def predict_mean_std_chunked(self, x_test, chunk: int = 8192):
        from nngp_tpu.gp.posterior import chunked_predict
        return chunked_predict(self.predict_mean_std, x_test, chunk)

    # -------------------------------------------------------------- extend
    def extend(self, x_new, y_new):
        """Incorporate labeled rows by accumulating their moment
        contributions and re-running the k x k solve stage — O(s m^2 + m^3),
        and EXACT: extend-then-predict equals refit-on-concatenated-data
        with the same inducing set and ridge (tests/test_nystrom.py)."""
        x_new = np.asarray(x_new)
        y_new = np.asarray(y_new, dtype=x_new.dtype)
        if y_new.ndim == 1:
            y_new = y_new[:, None]
        if self.input_scale != 1.0:
            x_new = x_new * (1.0 / self.input_scale)
        c_acc, b_acc, m1_acc = self._moment_accumulators()
        w_s, w_k = self._w_pair()
        c_raw, b_w, m1_w, diag_sum, yty = _stream_moments(
            self.spec, self.get, self.precision, self.x_m,
            w_s, w_k, x_new, y_new, self.panel_size,
            c_raw=c_acc, b_w=b_acc, m1_w=m1_acc,
            diag_sum=self.diag_sum, yty=self.yty,
            mesh=self.mesh, mesh_axis=self.mesh_axis,
            moments=self.moments)
        # keep the fit-time ridge: the relative reg is defined by the
        # fit-time trace (same policy as GPPosterior.extend)
        ic, beta_w = _finalize(c_raw, b_w, self.reg, self.x_m.dtype,
                               self.finalize)
        return dataclasses.replace(
            self, ic=ic, beta_w=beta_w,
            **self._moment_fields(c_raw, b_w, m1_w), diag_sum=diag_sum,
            yty=(yty if self.yty is not None else None),
            num_train=self.num_train + x_new.shape[0])

    def _moment_accumulators(self):
        """(c, b, m1) in the form `_stream_moments` expects for this
        posterior's moment mode — DF pairs for 'df64', raw fp32 else."""
        if self.moments != "df64":
            return self.c_raw, self.b_w, self.m1_w
        from nngp_tpu.ops.df64 import DF

        m1 = (DF(self.m1_w, self.m1_lo) if self.m1_w is not None else None)
        return DF(self.c_raw, self.c_lo), DF(self.b_w, self.b_lo), m1

    def _w_pair(self):
        """(w_solve, w_kmm) in the form `_stream_moments` expects — DF
        pairs for 'df64' (zero tail for pre-DF-W checkpoints), plain
        arrays otherwise."""
        if self.moments != "df64":
            return self.w_solve, self.w_kmm
        from nngp_tpu.ops.df64 import DF

        def pair(hi, lo):
            if hi is None:
                return None
            return DF(hi, lo if lo is not None else jnp.zeros_like(hi))
        return (pair(self.w_solve, self.w_solve_lo),
                pair(self.w_kmm, self.w_kmm_lo))

    def _moment_fields(self, c, b, m1):
        """dataclasses.replace kwargs splitting DF moments into the
        canonical hi fields + _lo tails."""
        if self.moments != "df64":
            return dict(c_raw=c, b_w=b, m1_w=m1)
        return dict(c_raw=c.hi, c_lo=c.lo, b_w=b.hi, b_lo=b.lo,
                    m1_w=(m1.hi if m1 is not None else None),
                    m1_lo=(m1.lo if m1 is not None else None))

    def forget(self, x_old, y_old):
        """EXACT decremental learning: remove previously-incorporated rows
        by subtracting their moment contributions and re-running the k x k
        solve stage — the mirror of `extend`, same O(s m^2 + m^3) cost.
        forget(extend(rows)) is bit-equivalent math to never having added
        them (moments are plain sums; tests/test_nystrom.py), enabling
        sliding-window serving and feedback expiry. The inducing set keeps
        its x rows either way — DTC never requires inducing points to be
        training points. Rows must match what was originally streamed
        (same features/labels), or the moments go inconsistent; there is
        no way to detect a mismatch here.

        The exact tier has no cheap counterpart (a Cholesky DOWNdate is
        numerically unstable at this conditioning); the reference refits
        from scratch for any change."""
        x_old = np.asarray(x_old)
        y_old = np.asarray(y_old, dtype=x_old.dtype)
        if y_old.ndim == 1:
            y_old = y_old[:, None]
        if x_old.shape[0] > self.num_train:
            raise ValueError(
                f"forget({x_old.shape[0]} rows) exceeds num_train "
                f"({self.num_train})")
        if self.input_scale != 1.0:
            x_old = x_old * (1.0 / self.input_scale)
        w_s, w_k = self._w_pair()
        dc, db, dm1, dd, dy2 = _stream_moments(
            self.spec, self.get, self.precision, self.x_m,
            w_s, w_k, x_old, y_old, self.panel_size,
            mesh=self.mesh, mesh_axis=self.mesh_axis,
            moments=self.moments)
        if self.moments == "df64":
            from nngp_tpu.ops.df64 import df_sub

            c_acc, b_acc, m1_acc = self._moment_accumulators()
            c_raw = df_sub(c_acc, dc)
            b_w = df_sub(b_acc, db)
            m1_w = df_sub(m1_acc, dm1) if self.get == "ntk" else None
        else:
            c_raw = self.c_raw - dc
            b_w = self.b_w - db
            m1_w = self.m1_w - dm1 if self.get == "ntk" else None
        ic, beta_w = _finalize(c_raw, b_w, self.reg, self.x_m.dtype,
                               self.finalize)
        return dataclasses.replace(
            self, ic=ic, beta_w=beta_w,
            **self._moment_fields(c_raw, b_w, m1_w),
            diag_sum=self.diag_sum - dd,
            yty=(self.yty - dy2 if self.yty is not None else None),
            num_train=self.num_train - x_old.shape[0])

    def grow_inducing(self, x_new_inducing, x_train, y_train):
        """Refit with the inducing set ENLARGED by `x_new_inducing` (raw
        input units) on the full labeled data (x_train, y_train).

        Growing the inducing set changes K_mm and therefore the whitening
        basis every stored moment lives in — the cross moments against the
        NEW columns require one fresh pass over the data either way, so
        the honest cost is the full O(n (m+s)^2) streamed refit, not a
        cheap update (unlike row `extend`, which IS cheap because moments
        are row sums). Callers that stream rows away (serving) should use
        `Estimator.relearn_hyperparams`-style labeled-line replay; the
        active learner owns its train set and calls this directly.

        Capacity is monotone for DTC: the enlarged set's Nystrom
        approximation dominates (Q_new >= Q_old in PSD order), so the fit
        can only tighten — measured on the acquisition loop in
        experiments/nystrom_grow_ab.py. Duplicate rows between the old and
        new sets are fine (the jittered/truncated whitening absorbs the
        rank deficiency)."""
        old_raw = np.asarray(self.x_m, np.float64) * float(self.input_scale)
        x_new = np.asarray(x_new_inducing, np.float64)
        rows = np.concatenate([old_raw, x_new]).astype(
            np.asarray(x_train).dtype)
        return fit_nystrom(
            self.spec, x_train, y_train, diag_reg=self.diag_reg,
            get=self.get, panel_size=self.panel_size,
            rank_rtol=self.rank_rtol, input_scale=self.input_scale,
            precision=self.precision, inducing_rows=rows,
            mesh=self.mesh, mesh_axis=self.mesh_axis,
            finalize=self.finalize, moments=self.moments)

    # ------------------------------------------------------- model evidence
    def log_evidence(self) -> float:
        """Closed-form log evidence of the fitted DTC model
        y ~ N(0, Q + r I), Q = Psi Psi^T the Nystrom approximation — the
        approximate-tier counterpart of `GPPosterior.
        log_marginal_likelihood`, for selecting m / rank_rtol / diag_reg.

        Everything is already in the whitened moments (host fp64, exact
        given them):
          quad   = y^T (Q + rI)^-1 y = (y^T y - |ic^T b_w|^2) / r  (Woodbury)
          logdet = (n - k) log r + logdet(C + rI),
                   logdet(C + rI) = -2 log|det ic|
        With an input prescale the raw-unit solve kernel is scale^2 times
        the stored one, adding n log scale^2 and dividing quad by scale^2
        (y itself is never scaled)."""
        if self.yty is None:
            raise ValueError(
                "log_evidence needs the streamed y^T y moment; this "
                "posterior predates evidence tracking — refit")
        n, k = self.num_train, self.rank
        r = float(self.reg)
        ic64 = np.asarray(self.ic, np.float64)
        b64 = np.asarray(self.b_w, np.float64)
        if self.b_lo is not None:
            b64 = b64 + np.asarray(self.b_lo, np.float64)
        h = (ic64.T @ b64).ravel()
        quad = (float(self.yty) - float(h @ h)) / r
        sign, logabs = np.linalg.slogdet(ic64)
        logdet = (n - k) * np.log(r) - 2.0 * logabs
        if self.input_scale != 1.0:
            s2 = float(self.input_scale) ** 2
            quad /= s2
            logdet += n * np.log(s2)
        return -0.5 * (quad + logdet + n * np.log(2.0 * np.pi))

    def capacity_gap(self) -> float:
        """Per-row Nystrom approximation gap tr(K - Q) / (n r) — the
        Titsias ELBO's trace penalty per training row in ridge units.
        ~0 means the inducing set explains the data's kernel energy;
        growing it buys nothing. O(1)-ish means the approximation gap
        rivals the noise floor — `grow_inducing` recovers real accuracy
        there (measured: the 90k fixed-m arm sat at a 8% median-q penalty,
        BASELINE.md). The natural monitoring trigger for serving-side
        growth (`Estimator.grow_inducing`)."""
        c64 = np.asarray(self.c_raw, np.float64)
        if self.c_lo is not None:
            c64 = c64 + np.asarray(self.c_lo, np.float64)
        trace_gap = float(self.diag_sum) - float(np.trace(c64))
        return max(trace_gap, 0.0) / (max(self.num_train, 1)
                                      * float(self.reg))

    def elbo(self) -> float:
        """Titsias collapsed variational lower bound on the EXACT GP
        evidence: `log_evidence()` minus the trace penalty
        tr(K - Q) / (2 r). Unlike the DTC marginal (which can move either
        way when inducing points are added), the ELBO is MONOTONE
        non-decreasing under inducing-set inclusion (Titsias 2009;
        Matthews et al. 2016) — the principled criterion for sizing /
        growing the inducing set (`grow_inducing`).

        Both traces are already streamed: tr(K) is `diag_sum` (true
        solve-kernel diagonal) and tr(Q) = tr(C) since
        C = W^T K_mn K_nm W with W W^T ~= K_mm^-1. The input prescale
        cancels (both traces and the ridge carry the same scale^2)."""
        return self.log_evidence() - 0.5 * self.capacity_gap() * \
            max(self.num_train, 1)


def _stream_moments(spec, get, precision, x_m, w_solve, w_kmm, x, y,
                    panel_size, c_raw=None, b_w=None, m1_w=None,
                    diag_sum=None, yty=None, mesh=None, mesh_axis="data",
                    moments="fp32"):
    """Host panel loop over (x, y): zero-pad the tail to the static panel
    shape and mask it out, so every panel reuses ONE compiled program.
    With `mesh`, panel rows are sharded over `mesh_axis` and the moment
    deltas psum over ICI (`_sharded_panel_fn`) — same math, p-way panels.

    moments='df64': kernel entries, whitened projection and moment
    accumulators run in emulated fp64 (`_panel_delta_df64`); w_solve/
    w_kmm AND c_raw/b_w/m1_w are then DF pairs in and out (pass DF
    accumulators when extending a df64 posterior)."""
    dt = x_m.dtype
    n = x.shape[0]
    df64 = moments == "df64"
    if df64:
        from nngp_tpu.ops.df64 import DF

        k = w_solve.hi.shape[1]
        k2 = w_kmm.hi.shape[1] if get == "ntk" else 0

        def _z(shape):
            z = jnp.zeros(shape, jnp.float32)
            return DF(z, jnp.zeros_like(z))
    else:
        k = w_solve.shape[1]
        k2 = w_kmm.shape[1] if get == "ntk" else 0
    if c_raw is None:
        if df64:
            c_raw = _z((k, k))
            b_w = _z((k, 1))
            m1_w = _z((k2, k)) if get == "ntk" else None
        else:
            c_raw = jnp.zeros((k, k), dt)
            b_w = jnp.zeros((k, 1), dt)
            m1_w = (jnp.zeros((k2, k), dt)
                    if get == "ntk" else None)
        diag_sum = jnp.zeros((), dt)
    if yty is None:
        yty = jnp.zeros((), dt)
    if get != "ntk":
        # the accumulators want concrete operands even when unused
        if df64:
            m1_acc = _z((0, k))
            w_kmm_acc = _z((x_m.shape[0], 0))
        else:
            m1_acc = jnp.zeros((0, k), dt)
            w_kmm_acc = jnp.zeros((x_m.shape[0], 0), dt)
    else:
        m1_acc, w_kmm_acc = m1_w, w_kmm
    p = min(panel_size, max(n, 1))
    if mesh is not None:
        q = mesh.shape[mesh_axis]
        p = -(-p // q) * q          # shard_map needs p % q == 0; pad covers
        panel_fn = _sharded_panel_fn(mesh, mesh_axis, spec, get, precision,
                                     moments)
    elif df64:
        panel_fn = partial(_accumulate_panel_df64, spec, get)
    else:
        panel_fn = partial(_accumulate_panel, spec, get, precision)
    for s in range(0, n, p):
        e = min(s + p, n)
        x_p = np.asarray(x[s:e])
        y_p = np.asarray(y[s:e])
        mask = np.ones(e - s, dtype=x_p.dtype)
        if e - s < p:
            pad = p - (e - s)
            x_p = np.concatenate([x_p, np.zeros((pad, x_p.shape[1]),
                                                x_p.dtype)])
            y_p = np.concatenate([y_p, np.zeros((pad, 1), y_p.dtype)])
            mask = np.concatenate([mask, np.zeros(pad, mask.dtype)])
        c_raw, b_w, m1_acc, diag_sum, yty = panel_fn(
            x_m, w_solve, w_kmm_acc,
            jnp.asarray(x_p, dt), jnp.asarray(y_p, dt),
            jnp.asarray(mask, dt), c_raw, b_w, m1_acc, diag_sum, yty)
    return c_raw, b_w, (m1_acc if get == "ntk" else None), diag_sum, yty


def select_inducing(n: int, m: int, seed: int = 0) -> np.ndarray:
    """Seeded uniform inducing subset (sorted for locality)."""
    if m >= n:
        return np.arange(n)
    rng = np.random.default_rng(seed)
    return np.sort(rng.choice(n, size=m, replace=False))


@partial(jax.jit, static_argnames=("spec", "get", "precision"))
def _rpchol_panel(spec, get, precision, x_c, x_s, sel, f):
    """One proposal panel's residual columns: g = K(:, S) - F F_S^T.
    Unfilled F columns are zero, so the full-width matmul is exact."""
    with jax.default_matmul_precision(precision):
        if get == "ntk":
            _, k_cs = spec.kernel_fn(x_c, x_s, ("nngp", "ntk"))
        else:
            k_cs = spec.kernel_fn(x_c, x_s, "nngp")
        g = k_cs - f @ f[sel].T
    return g, g[sel]


@partial(jax.jit, static_argnames=("precision",))
def _rpchol_update(precision, g, perm, inv_lt, f, d, j):
    """Accept a round's pivots: F[:, j:j+B] = g[:, perm] @ invL^T (columns
    past the accepted rank are zero in inv_lt — they land as zeros and are
    overwritten by later rounds), residual diag -= row norms."""
    with jax.default_matmul_precision(precision):
        f_new = g[:, perm] @ inv_lt
    f = jax.lax.dynamic_update_slice(f, f_new, (0, j))
    d = jnp.maximum(d - jnp.sum(f_new * f_new, axis=1), 0.0)
    return f, d


def select_inducing_rpchol(spec: KernelSpec, x, m: int, get: str = "nngp",
                           seed: int = 0, block: int = 64,
                           max_candidates: int = 65536,
                           precision: str = "highest") -> np.ndarray:
    """Block randomly-pivoted Cholesky (RPCholesky) inducing selection.

    Samples pivots with probability proportional to the RESIDUAL kernel
    diagonal d_i = K_ii - |F_i|^2 after projecting out the already-chosen
    columns — the near-optimal column-Nystrom selection (trace-norm error
    within a log factor of the best rank-m approximation; Chen, Epperly,
    Tropp & Webber, "Randomly pivoted Cholesky", 2022). It dominates
    uniform selection on the TRACE error by construction (asserted in
    tests/test_nystrom.py on clustered data) — but measured PREDICTIVE
    q-error on the forest and synth6 workloads favors uniform
    (experiments/nystrom_rpchol_ab.log): held-out queries follow the
    train density, which uniform matches, while trace-optimal coverage
    spends capacity on kernel-space outliers. Opt in when the serving
    distribution will NOT follow the train density.

    TPU-first shape: per round, ONE device panel computes the B proposal
    columns' residuals against all candidates (MXU matmul vs the growing
    factor F, never materializing K), a BxB pivoted Cholesky on host
    (fp64 dpstrf) accepts the linearly-independent proposals, and one
    device update appends the accepted columns and downdates the residual
    diagonal. O(rounds) dispatches, O(N*(m+block)) device memory — the
    same panel-streaming discipline as `fit_nystrom`.

    With n > max_candidates the pivots are drawn from a seeded uniform
    candidate subsample (the standard practical compromise: F is (N, m)
    and must fit in HBM). May return FEWER than m indices when the kernel
    is numerically rank-deficient on the candidates — every remaining
    residual direction is then below fp noise and extra inducing rows
    would only feed the whitening stage junk.
    """
    from scipy.linalg import lapack

    x = np.asarray(x)
    n = x.shape[0]
    if m >= n:
        return np.arange(n)
    rng = np.random.default_rng(seed)
    if n > max_candidates:
        cand = np.sort(rng.choice(n, size=max_candidates, replace=False))
    else:
        cand = np.arange(n)
    nc = cand.shape[0]
    x_c = jnp.asarray(x[cand])
    d0 = spec.diag_fn(x_c, get)
    trace0 = float(jnp.sum(d0))
    f = jnp.zeros((nc, m + block), x_c.dtype)
    d = jnp.asarray(d0)
    chosen: list = []
    taken = np.zeros(nc, dtype=bool)
    j = 0
    max_rounds = 4 * (-(-m // block)) + 4
    for _ in range(max_rounds):
        if j >= m:
            break
        d_host = np.array(d, np.float64)     # owned copy (jax buffers are
        d_host[taken] = 0.0                  # read-only views)
        tot = float(d_host.sum())
        if tot <= 1e-12 * max(trace0, 1.0):
            break                       # numerically exhausted
        sel = rng.choice(nc, size=block, p=d_host / tot)
        g, h_small = _rpchol_panel(spec, get, precision, x_c, x_c[sel],
                                   jnp.asarray(sel), f)
        h64 = np.asarray(h_small, np.float64)
        h64 = 0.5 * (h64 + h64.T)
        # pivoted Cholesky of the proposal block: P^T H P = L L^T, rank r
        c_fact, piv, r, info = lapack.dpstrf(h64, lower=1)
        if info < 0 or r == 0:
            continue                    # all proposals dependent; resample
        r = min(int(r), m - j)
        perm = sel[piv[:r] - 1]         # dpstrf pivots are 1-based
        ell = np.tril(c_fact[:r, :r])
        li, tinfo = lapack.dtrtri(ell, lower=1)
        if tinfo != 0:
            continue
        inv_lt = np.zeros((block, block), np.float64)
        inv_lt[:r, :r] = li.T           # cols >= r stay zero (rejected)
        f, d = _rpchol_update(precision, g, jnp.asarray(piv[:block] - 1),
                              jnp.asarray(inv_lt, x_c.dtype), f, d, j)
        # dpstrf may permute duplicates of already-taken pivots into the
        # accepted prefix only if their residual diag survived — taken[]
        # guards the sampler, so perm entries are fresh by construction
        chosen.extend(int(sel[p - 1]) for p in piv[:r])
        taken[perm] = True
        j += r
    if not chosen:
        raise ValueError(
            "RPCholesky selected no pivots — degenerate kernel diagonal "
            "(all-zero rows?)")
    return np.sort(cand[np.asarray(chosen[:m])])


def fit_nystrom(spec: KernelSpec, x_train, y_train, num_inducing: int = 2048,
                diag_reg: float = 1e-3, get: str = "nngp",
                diag_reg_absolute_scale: bool = False, seed: int = 0,
                panel_size: int = _DEFAULT_PANEL,
                rank_rtol: Optional[float] = None,
                input_scale: Optional[float] = None,
                precision: str = "highest", whiten: str = "chol",
                inducing: str = "uniform", inducing_rows=None,
                mesh=None, mesh_axis: str = "data",
                finalize: str = "auto",
                moments: str = "fp32") -> NystromPosterior:
    """Streaming Nystrom/DTC fit. O(n m^2) MXU flops, O(m^2 + panel*m)
    device memory — n is unbounded by HBM (the row panels stream from
    host). With num_inducing >= n this IS the exact posterior (up to the
    eigenvalue truncation); the intended regime is n far beyond the ~70k
    exact-fit single-chip edge (BASELINE.md scale table).

    precision: 'highest' (default; fp32 6-pass MXU accumulation) or 'high'
    (3-pass, ~2x faster moments) — measure q-error parity at forest scale
    before trusting 'high' on a new workload.

    whiten: 'chol' (default) jittered-Cholesky whitening basis — ~5x
    cheaper host stage, rank always m; 'eigh' the eigenvalue-truncated
    basis (rank <= m). Measured q-error parity between the two on the
    fp32 forest workload (experiments/nystrom_whiten_ab.log).

    inducing: 'uniform' (default, seeded subset) or 'rpchol' (randomly
    pivoted Cholesky, `select_inducing_rpchol`) — near trace-OPTIMAL
    column selection at O(n m) extra kernel evals. Measured on the forest
    AND Zipf-skewed synth6 workloads: uniform WINS on predictive q-error
    and evidence (experiments/nystrom_rpchol_ab.log) because test queries
    follow the train density, which uniform matches while trace-optimal
    coverage spends capacity on kernel-space outliers. Reach for
    'rpchol' only when the serving distribution is expected to differ
    from the train density (uniform-in-feature-space queries, adversarial
    tails). May yield fewer than num_inducing rows when the kernel is
    numerically rank-deficient.

    inducing_rows: explicit (m, d) inducing rows in RAW input units —
    overrides `inducing`/`num_inducing` selection entirely. DTC never
    requires inducing points to be training rows, so any feature-space
    rows work; this is the hook `NystromPosterior.grow_inducing` uses to
    refit with an enlarged set.

    finalize: where the k x k solve stage and the whitening bases run —
    'host' (fp64 LAPACK on the host: one 16 MB fetch + ~1-3 s single-core
    at m=2048), 'device' (emulated-fp64 Cholesky/inverse on the MXU,
    `ops/df64.py` — no host round-trip; fp32 posteriors only), or 'auto'
    (default: 'device' on a TPU backend for fp32, else 'host').
    Measured on chip at m=2048 (experiments/finalize_ab.log, interleaved
    A/B): fit 1.39 -> 0.35 s, extend-1000 1.01 -> 0.088 s, q-error
    IDENTICAL to 4 decimals. extend/forget/grow_inducing reuse the fit's
    resolved choice. First use per (m, get) shape pays a one-time ~250 s
    remote compile — `Estimator.warmup` covers serving.

    moments: 'fp32' (default) — panel moments via 6-pass fp32 MXU — or
    'df64': the K_mm entries behind the whitening bases, the panel
    kernel entries, the whitened projection and the accumulators all run
    in emulated fp64 (`ops/df64_kernel.py` recursion + Ozaki matmuls).
    The payoff is NOT lower arithmetic noise per se (measured ~0 q-error
    change at a fixed rank cut, experiments/nystrom_df64_moments_ab.log)
    but a DEEPER default rank cut: fp32 K_mm entry noise floors the
    usable rank_rtol at 1e-8 and that floor owns the measured fp32-vs-
    fp64 serving gap (2.52 vs 2.40 at 90k m=2048 — an all-fp64 pipeline
    pinned to 1e-8 also scores 2.51, experiments/nystrom_prec_attrib.py);
    df64 entries push the default cut to 1e-12 (`_default_rank_rtol`).
    Deep cuts additionally require the whitening basis itself to stay a
    DF pair (w_solve_lo/w_kmm_lo tails) and the predict projections to
    run in df64 — with both, the fp32 pipeline reproduces the fp64
    oracle's q-error digit-for-digit at every cut
    (experiments/nystrom_cut_depth.py; BASELINE.md round 3l).
    fp32 posteriors only; extend/forget/grow stay df64 through the
    posterior's stored moment tails (c_lo/b_lo/m1_lo).

    mesh: optional jax.sharding.Mesh — shard every panel's rows over
    `mesh_axis` so the O(n m^2) moment flops data-parallelize across
    chips; each panel's (k, k) deltas psum over ICI (comm O(k^2)/panel,
    independent of n). Moments are row sums, so the sharded fit is
    bit-equivalent math to the single-device panel loop (same whitening,
    same host solve stage); `extend` stays sharded through the posterior's
    `mesh` field.
    """
    if get not in ("nngp", "ntk"):
        raise ValueError(f"get must be 'nngp' or 'ntk', got {get!r}")
    from nngp_tpu.gp.posterior import _auto_input_scale

    x = np.asarray(x_train)
    y = np.asarray(y_train, dtype=x.dtype)
    if y.ndim == 1:
        y = y[:, None]
    n = x.shape[0]
    if input_scale is None:
        input_scale = _auto_input_scale(x, spec.layers)
    if input_scale != 1.0:
        x = x * (1.0 / input_scale)
    if inducing_rows is not None:
        x_m_np = np.asarray(inducing_rows, dtype=x.dtype)
        if input_scale != 1.0:
            x_m_np = x_m_np * (1.0 / input_scale)
        x_m = jnp.asarray(x_m_np)
    elif inducing == "uniform":
        x_m = jnp.asarray(x[select_inducing(n, num_inducing, seed)])
    elif inducing == "rpchol":
        idx = select_inducing_rpchol(spec, x, num_inducing, get=get,
                                     seed=seed, precision=precision)
        x_m = jnp.asarray(x[idx])
    else:
        raise ValueError(
            f"inducing must be 'uniform' or 'rpchol', got {inducing!r}")
    if rank_rtol is None:
        rank_rtol = _default_rank_rtol(x_m.dtype, moments)

    if whiten not in ("chol", "eigh"):
        raise ValueError(f"whiten must be 'chol' or 'eigh', got {whiten!r}")
    if moments not in ("fp32", "df64"):
        raise ValueError(f"moments must be 'fp32' or 'df64', "
                         f"got {moments!r}")
    if moments == "df64" and x_m.dtype != jnp.float32:
        raise ValueError("moments='df64' is the emulated-fp64 path for "
                         f"fp32 posteriors; got dtype {x_m.dtype} (real "
                         "fp64 already carries full precision)")
    finalize = _resolve_finalize(finalize, x_m.dtype)
    w_solve, w_kmm = _inducing_bases(
        spec, get, float(rank_rtol), x_m, whiten=whiten,
        device=(finalize == "device" and whiten == "chol"),
        entries=moments)
    c_raw, b_w, m1_w, diag_sum, yty = _stream_moments(
        spec, get, precision, x_m, w_solve, w_kmm, x, y, panel_size,
        mesh=mesh, mesh_axis=mesh_axis, moments=moments)
    if diag_reg_absolute_scale:
        reg = jnp.asarray(diag_reg, x_m.dtype)
    else:
        reg = (diag_reg * diag_sum / n).astype(x_m.dtype)
    ic, beta_w = _finalize(c_raw, b_w, reg, x_m.dtype, finalize)
    if moments == "df64":
        mom = dict(c_raw=c_raw.hi, c_lo=c_raw.lo, b_w=b_w.hi, b_lo=b_w.lo,
                   m1_w=(m1_w.hi if m1_w is not None else None),
                   m1_lo=(m1_w.lo if m1_w is not None else None))
        # the whitening bases are DF pairs — split into hi fields + tails
        w_solve, mom["w_solve_lo"] = w_solve.hi, w_solve.lo
        if w_kmm is not None:
            w_kmm, mom["w_kmm_lo"] = w_kmm.hi, w_kmm.lo
    else:
        mom = dict(c_raw=c_raw, b_w=b_w, m1_w=m1_w)
    return NystromPosterior(
        x_m=x_m, w_solve=w_solve, ic=ic, beta_w=beta_w, reg=reg,
        diag_sum=diag_sum, w_kmm=w_kmm, spec=spec, get=get,
        diag_reg=diag_reg, num_train=n,
        input_scale=float(input_scale), precision=precision,
        rank_rtol=float(rank_rtol), panel_size=panel_size,
        mesh=mesh, mesh_axis=mesh_axis, yty=yty, finalize=finalize,
        moments=moments, **mom)
