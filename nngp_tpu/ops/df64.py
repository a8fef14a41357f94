"""Emulated double precision (double-float) linear algebra for TPU.

TPUs have no native fp64, but two hot spots in this framework genuinely
need ~1e-12 relative accuracy at condition numbers far beyond fp32's
1/eps ~ 1e7:

  * the Nystrom finalize stage — Cholesky + triangular inversion of the
    whitened moment matrix C + rI, whose conditioning grows with n/ridge
    (`gp/nystrom.py:_finalize_host` ships it to the single host core in
    fp64 today: ~2-3 s per fit/extend at m=2048, plus a 16 MB tunnel
    round-trip)
  * the inducing whitening basis K_mm^-1/2 (same story, paid per
    cold fit / `grow_inducing`).

This module keeps that math ON DEVICE by representing each value as an
unevaluated pair of fp32s (hi, lo) with |lo| <= ulp(hi)/2 — the classic
double-float ("double-single") format, ~48-bit significand. Elementwise
ops run on the VPU with error-free transformations (Dekker/Knuth
two_sum/two_prod); matrix products run on the MXU via the Ozaki
splitting scheme with INTEGER slices:

  each row of A (column of B) is cut into w=7-bit integer slices on a
  power-of-two grid aligned to the row's max element. An int8 x int8
  MXU dot accumulates slice products in int32 EXACTLY (14-bit products,
  k <= 2^17 terms), so each slice-pair dot is error-free BY CONSTRUCTION
  — on TPU and CPU alike, which is what makes this module fully testable
  on the CPU suite. (A pure bf16-slice variant was probed first and is
  NOT exact: float slices keep per-element exponents, so products fall
  off the fp32 accumulator grid — measured 7e-6 error at k=256,
  experiments/ozaki_probe.py.) Summing the per-pair int32 partials into
  a double-float accumulator keeps ~2^-45 end to end.

No reference counterpart: `/root/reference` runs everything in native
x64 on CPU (`train.py:24`). This module is what makes those numerics
available on an fp32 accelerator without a host round-trip.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "DF", "df_from_f32", "df_const", "df_round", "df_add", "df_sub",
    "df_mul",
    "df_div", "df_sqrt", "hp_matmul", "hp_matmul_blocked", "df_cholesky",
    "df_trtri_lower", "df_cholesky_inverse_factor",
]


# ---------------------------------------------------------------------------
# error-free transformations (VPU elementwise)
# ---------------------------------------------------------------------------

def _two_sum(a, b):
    """s + e == a + b exactly (Knuth; no magnitude precondition)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _quick_two_sum(a, b):
    """s + e == a + b exactly, REQUIRES |a| >= |b| (or a == 0)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    """Truncation split of fp32 into two <=12-bit halves (exact): mask
    the low 12 mantissa bits through an int32 bitcast. Bit ops are opaque
    to both XLA's algebraic simplifier and LLVM's fma contraction — the
    arithmetic Dekker split (c = 4097*a; hi = c - (c - a)) is NOT safe
    under XLA:CPU, where `4097*a - a` contracts to the exact `4096*a`
    and the outer subtract then contracts to round(a): the split
    silently collapses to (a, 0) and every "exact" partial product turns
    into a full fp32 rounding (measured 1.5e-8 relative on
    df_mul(df_sub(1, rho), df_add(1, rho)) inside one fusion)."""
    bits = jax.lax.bitcast_convert_type(jnp.asarray(a, jnp.float32),
                                        jnp.int32)
    hi = jax.lax.bitcast_convert_type(bits & jnp.int32(-4096), jnp.float32)
    return hi, a - hi


def _two_prod(a, b):
    """p + e == a * b to ~2^-46 relative, built ONLY from the four EXACT
    Dekker partial products (12-bit halves: every product is
    fp32-representable, so compiler fma contraction is a no-op on each).

    The classic form `p = a*b; e = (ah*bh - p) + ...` is NOT safe under
    XLA:CPU: optimization barriers are expanded away before fusion, the
    cheap rounded product gets DUPLICATED into each consumer fusion, and
    LLVM contracts single-use `a*b + x` into fma(a, b, x) — so different
    consumers observe differently-rounded p and the reconstructed error
    term is off by ulp(p) (measured: 3.9e-8 relative on df_mul by a
    scalar, tests/test_df64.py::test_df_mul_scalar_operand_under_jit)."""
    ah, al = _split(a)
    bh, bl = _split(b)
    s, e1 = _two_sum(ah * bh, ah * bl)
    s, e2 = _two_sum(s, al * bh)
    e = (e1 + e2) + al * bl
    return s, e


# ---------------------------------------------------------------------------
# double-float arithmetic: a value is a pair (hi, lo), |lo| <= ulp(hi)/2
# ---------------------------------------------------------------------------

class DF(NamedTuple):
    """A (hi, lo) fp32 array pair. NamedTuple: natively pytree-transparent,
    so DF values pass through jit/scan boundaries unmodified."""

    hi: jax.Array
    lo: jax.Array

    @property
    def T(self):
        return DF(self.hi.T, self.lo.T)


def df_from_f32(hi):
    """Lift an fp32 array into double-float (lo = 0)."""
    hi = jnp.asarray(hi, jnp.float32)
    return DF(hi, jnp.zeros_like(hi))


def df_const(hi, lo=0.0):
    """An OPAQUE df constant for use inside traced df arithmetic.

    A literal constant entering two_sum is unsafe under jit: XLA's
    algebraic simplifier combines constants across add/sub chains —
    `(x + c) - c` rewrites to `x` — which deletes the reconstructed
    rounding error (measured: df_add(1, rho) lost its entire lo part,
    eps32-level error on the (1-rho)(1+rho) product driving df_acos).
    An optimization_barrier at constant creation blocks the rewrite:
    the simplifier runs before barrier expansion. (Barriers do NOT
    protect against LLVM fma contraction — that needed the exact-partial
    `_two_prod` and the bit-mask `_split`; this guard is ONLY about
    HLO-level constant algebra.)"""
    hi, lo = jax.lax.optimization_barrier(
        (jnp.float32(hi), jnp.float32(lo)))
    return DF(hi, lo)


def df_round(a: DF):
    """Round to a single fp32 (hi absorbs lo by construction)."""
    return a.hi + a.lo


def df_add(a: DF, b: DF) -> DF:
    # accurate (non-sloppy) double-double add: error stays relative to the
    # RESULT under cancellation, not to the larger input
    s, e = _two_sum(a.hi, b.hi)
    t, f = _two_sum(a.lo, b.lo)
    e = e + t
    s, e = _quick_two_sum(s, e)
    e = e + f
    return DF(*_quick_two_sum(s, e))


def df_neg(a: DF) -> DF:
    return DF(-a.hi, -a.lo)


def df_sub(a: DF, b: DF) -> DF:
    return df_add(a, df_neg(b))


def df_mul(a: DF, b: DF) -> DF:
    p, e = _two_prod(a.hi, b.hi)
    e = e + (a.hi * b.lo + a.lo * b.hi)
    return DF(*_quick_two_sum(p, e))


def df_div(a: DF, b: DF) -> DF:
    """Long division with two correction terms (~full df accuracy)."""
    q1 = a.hi / b.hi
    r = df_sub(a, df_mul(b, df_from_f32(q1)))
    q2 = r.hi / b.hi
    r = df_sub(r, df_mul(b, df_from_f32(q2)))
    q3 = r.hi / b.hi
    s, e = _two_sum(q1, q2)
    e = e + q3
    return DF(*_quick_two_sum(s, e))


def df_sqrt(a: DF) -> DF:
    """One Heron correction on the fp32 sqrt: error ~ eps_f32^2. Domain:
    a >= 0 elementwise (0 maps to 0)."""
    s = jnp.sqrt(jnp.maximum(a.hi, 0.0))
    s_df = df_from_f32(s)
    diff = df_sub(a, df_mul(s_df, s_df))
    denom = jnp.where(s > 0, 2.0 * s, jnp.float32(1.0))
    corr = jnp.where(s > 0, diff.hi / denom, jnp.float32(0.0))
    return DF(*_quick_two_sum(s, corr))


def _df_tree_sum(a: DF, axis: int = 0) -> DF:
    """Pairwise (tree) df reduction along `axis` — log2(n) vectorized
    df_adds, each step halving the array (vs a sequential fori reduction
    whose O(n) depth would serialize the VPU)."""
    hi = jnp.moveaxis(a.hi, axis, 0)
    lo = jnp.moveaxis(a.lo, axis, 0)
    n = hi.shape[0]
    while n > 1:
        half = n // 2
        top = DF(hi[:half], lo[:half])
        bot = DF(hi[half:2 * half], lo[half:2 * half])
        s = df_add(top, bot)
        if n % 2:
            hi = jnp.concatenate([s.hi, hi[2 * half:]], axis=0)
            lo = jnp.concatenate([s.lo, lo[2 * half:]], axis=0)
            n = half + 1
        else:
            hi, lo = s.hi, s.lo
            n = half
    return DF(hi[0], lo[0])


# ---------------------------------------------------------------------------
# high-precision matmul (MXU): Ozaki integer slicing
# ---------------------------------------------------------------------------

_W = 7                       # bits per slice (int8-safe: |slice| <= 127)
_SLICES = 8                  # 8 x 7 = 56 bits >= the 48-bit df significand
_PAIR_CUTOFF = 7             # keep pairs down to 2^-49 relative


def _row_grids(hi, w=_W):
    """Power-of-two slice grid per row: g = 2^(ceil(log2 max|row|) - w).
    All-zero rows get g = 1 (their slices are all zero anyway)."""
    mx = jnp.max(jnp.abs(hi), axis=1, keepdims=True)
    # exact power of two >= mx (frexp: mx = f * 2^e with f in [0.5, 1));
    # ldexp is EXACT scaling — jnp.exp2 is a polynomial approximation and
    # a grid that is off by 1e-7 breaks the exact-reconstruction contract.
    # Floor e so the LAST slice's grid (g0 * 2^-49) stays a normal fp32:
    # an underflowed grid is 0 and r/g would NaN — rows with max < 2^-70
    # slice as ~zero instead (they are below any use here anyway).
    _, e = jnp.frexp(jnp.where(mx > 0, mx, 1.0))
    return jnp.ldexp(jnp.float32(1.0), jnp.maximum(e - w, -70)
                     ).astype(jnp.float32)


def _int_slices(a: DF, num=_SLICES, w=_W):
    """Integer Ozaki slices of a double-float matrix, per-row grids:
    a ~= sum_k slices[k] * g * 2^(-w k), slices int8 in [-127, 127].
    Extraction runs in df so nothing below 2^-48 of the row max is lost
    before the last slice."""
    g0 = _row_grids(a.hi, w)
    r = a
    out = []
    g = g0
    for _ in range(num):
        q = jnp.clip(jnp.round(r.hi / g), -127.0, 127.0)
        out.append(q.astype(jnp.int8))
        # q * g is exact in fp32 (7-bit integer times a power of two)
        r = df_sub(r, df_from_f32(q * g))
        g = g * jnp.float32(0.5 ** w)
    return out, g0


def hp_matmul(a, b, transpose_b: bool = False) -> DF:
    """High-precision matmul: (m, k) x (k, n) -> df64 (m, n) on the MXU.

    `a`, `b` may be fp32 arrays or DF pairs. Every slice-pair product is
    an int8 x int8 -> int32 dot — EXACT by construction for k <= 2^17 —
    and the pair partials are combined into a double-float with two_sum,
    so the result carries ~2^-45 relative error independent of platform.

    transpose_b=True computes a @ b.T without materializing the
    transpose (the contraction dimension is chosen accordingly).
    """
    a_df = a if isinstance(a, DF) else df_from_f32(a)
    b_df = b if isinstance(b, DF) else df_from_f32(b)
    k = a_df.hi.shape[1]
    # worst case |level partial| <= (#pairs per level) * 127^2 * k: at
    # k = 8192 that is 1.06e9, a 2x margin under int32 (at 16384 it would
    # sit at 98% of INT32_MAX — too close for a correctness kernel)
    if k > 8192:
        raise ValueError(f"hp_matmul contraction dim {k} > 8192 could "
                         "overflow the int32 accumulator — block the call")
    # slice A by rows; slice B along its contraction dim (rows of B, or
    # rows of B.T when transpose_b — i.e. per-row grids of the stored b)
    sa, ga = _int_slices(a_df)
    if transpose_b:
        sb, gb = _int_slices(b_df)
        dims = (((1,), (1,)), ((), ()))
    else:
        sbt, gb = _int_slices(b_df.T)
        sb = [s.T for s in sbt]
        dims = (((1,), (0,)), ((), ()))
    # scale outer product via broadcast multiply (powers of two: exact;
    # a matmul here would be subject to the ambient precision context)
    scale = ga * gb.T                                   # (m, n)

    # pairs grouped by total level l = i + j: same scale -> sum the int32
    # partials in INTEGER first (<= 8 pairs of 14+log2(k) bits: safe),
    # then one exact int->df conversion + df_add per level.
    acc = None
    for lvl in range(min(_PAIR_CUTOFF, 2 * (_SLICES - 1)), -1, -1):
        p32 = None
        for i in range(_SLICES):
            j = lvl - i
            if j < 0 or j >= _SLICES:
                continue
            d = jax.lax.dot_general(sa[i], sb[j], dims,
                                    preferred_element_type=jnp.int32)
            p32 = d if p32 is None else p32 + d
        if p32 is None:
            continue
        # exact int32 -> df conversion: split at 2^12 (both halves are
        # fp32-exact), scale by the power-of-two grids (exact)
        q, rem = jnp.divmod(p32, 4096)
        lvl_scale = scale * jnp.float32(0.5 ** (_W * lvl))
        piece = DF((q.astype(jnp.float32) * 4096.0) * lvl_scale,
                   rem.astype(jnp.float32) * lvl_scale)
        piece = DF(*_two_sum(piece.hi, piece.lo))
        acc = piece if acc is None else df_add(acc, piece)
    return acc


def _df_slice_cols(a: DF, s: int, e: int) -> DF:
    return DF(a.hi[:, s:e], a.lo[:, s:e])


def hp_matmul_blocked(a, b, transpose_b: bool = False,
                      block: int = 8192) -> DF:
    """`hp_matmul` for contraction dims beyond the int32-overflow cap:
    split the contraction into <= `block` chunks and df_add the exact
    partials (each chunk's slice products stay exact; the df adds carry
    ~2^-48 — same contract as one big call)."""
    a_df = a if isinstance(a, DF) else df_from_f32(jnp.asarray(a))
    b_df = b if isinstance(b, DF) else df_from_f32(jnp.asarray(b))
    k = a_df.hi.shape[1]
    if k <= block:
        return hp_matmul(a_df, b_df, transpose_b=transpose_b)
    acc = None
    for s in range(0, k, block):
        e = min(s + block, k)
        ac = _df_slice_cols(a_df, s, e)
        bc = (_df_slice_cols(b_df, s, e) if transpose_b
              else DF(b_df.hi[s:e], b_df.lo[s:e]))
        part = hp_matmul(ac, bc, transpose_b=transpose_b)
        acc = part if acc is None else df_add(acc, part)
    return acc


# ---------------------------------------------------------------------------
# blocked double-float Cholesky / triangular inverse
# ---------------------------------------------------------------------------

def _df_chol_block(a: DF, pivot_floor) -> DF:
    """Unblocked lower Cholesky of a (b, b) df matrix: fori_loop over
    columns with full-matrix masked rank-1 updates (VPU; O(b^3) df
    flops). Pivots are floored at `pivot_floor` (fp32 moment noise can
    leave the matrix microscopically indefinite; flooring reverts those
    directions toward the ridge prior, mirroring the host fallback's
    eigenvalue clamp). Entries above the diagonal are zeroed."""
    b = a.hi.shape[0]
    rows = jnp.arange(b)

    def body(j, carry):
        hi, lo = carry
        piv_hi = jax.lax.dynamic_index_in_dim(
            jnp.diagonal(hi), j, 0, keepdims=False)
        piv_lo = jax.lax.dynamic_index_in_dim(
            jnp.diagonal(lo), j, 0, keepdims=False)
        floored = piv_hi < pivot_floor
        piv = DF(jnp.where(floored, pivot_floor, piv_hi),
                 jnp.where(floored, 0.0, piv_lo))
        s = df_sqrt(piv)
        col = DF(jax.lax.dynamic_index_in_dim(hi, j, 1, keepdims=False),
                 jax.lax.dynamic_index_in_dim(lo, j, 1, keepdims=False))
        l_col = df_div(col, DF(jnp.broadcast_to(s.hi, col.hi.shape),
                               jnp.broadcast_to(s.lo, col.lo.shape)))
        below = rows > j
        l_hi = jnp.where(below, l_col.hi, 0.0).at[j].set(s.hi)
        l_lo = jnp.where(below, l_col.lo, 0.0).at[j].set(s.lo)
        outer = df_mul(DF(l_hi[:, None], l_lo[:, None]),
                       DF(l_hi[None, :], l_lo[None, :]))
        upd = df_sub(DF(hi, lo), outer)
        keep = below[:, None] & below[None, :]
        hi = jnp.where(keep, upd.hi, hi)
        lo = jnp.where(keep, upd.lo, lo)
        hi = hi.at[:, j].set(l_hi)
        lo = lo.at[:, j].set(l_lo)
        return hi, lo

    hi, lo = jax.lax.fori_loop(0, b, body, (a.hi, a.lo))
    tril = rows[:, None] >= rows[None, :]
    return DF(jnp.where(tril, hi, 0.0), jnp.where(tril, lo, 0.0))


def _df_trtri_block(l: DF) -> DF:
    """Unblocked inverse of a (b, b) df lower-triangular matrix. Row i of
    X = L^-1 is (e_i - L[i, :i] @ X[:i, :]) / L[i, i]; the inner matvec
    vectorizes as a masked df product + tree reduction, so the loop is
    O(b) sequential steps of O(b^2) VPU work."""
    b = l.hi.shape[0]
    rows = jnp.arange(b)
    eye = jnp.eye(b, dtype=jnp.float32)
    ldiag = DF(jnp.diagonal(l.hi), jnp.diagonal(l.lo))

    def body(i, carry):
        x_hi, x_lo = carry
        li = DF(jax.lax.dynamic_index_in_dim(l.hi, i, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(l.lo, i, 0, keepdims=False))
        mask = (rows < i).astype(jnp.float32)
        li = DF(li.hi * mask, li.lo * mask)
        prod = df_mul(DF(li.hi[:, None], li.lo[:, None]), DF(x_hi, x_lo))
        s = _df_tree_sum(prod, axis=0)                  # (b,)
        e_i = jax.lax.dynamic_index_in_dim(eye, i, 0, keepdims=False)
        num = df_sub(df_from_f32(e_i), s)
        piv_hi = jax.lax.dynamic_index_in_dim(ldiag.hi, i, 0,
                                              keepdims=False)
        piv_lo = jax.lax.dynamic_index_in_dim(ldiag.lo, i, 0,
                                              keepdims=False)
        xi = df_div(num, DF(jnp.broadcast_to(piv_hi, num.hi.shape),
                            jnp.broadcast_to(piv_lo, num.lo.shape)))
        col_mask = (rows <= i).astype(jnp.float32)
        x_hi = x_hi.at[i, :].set(xi.hi * col_mask)
        x_lo = x_lo.at[i, :].set(xi.lo * col_mask)
        return x_hi, x_lo

    z = jnp.zeros((b, b), jnp.float32)
    x_hi, x_lo = jax.lax.fori_loop(0, b, body, (z, z))
    return DF(x_hi, x_lo)


def _pick_block(m: int, block: int) -> int:
    """Keep the unrolled block grid small (nb <= 4 at any m <= 4*block):
    the remote TPU compiler dislikes very large unrolled programs
    (CLAUDE.md), and the per-block VPU loops amortize better at larger b."""
    block = min(block, m)
    nb = -(-m // block)
    while nb > 4:
        block *= 2
        nb = -(-m // block)
    return block


def _df_chol_blocks(a: DF, block: int, pivot_floor):
    """Blocked right-looking df Cholesky. Returns (l_blocks, inv_diag,
    nb, block): the lower block grid and each diagonal block's df inverse
    (computed anyway for the panel solves — callers reuse them)."""
    m = a.hi.shape[0]
    block = _pick_block(m, block)
    nb = -(-m // block)
    mp = nb * block
    if mp != m:
        pad = mp - m
        hi = jnp.pad(a.hi, ((0, pad), (0, pad)))
        hi = hi.at[jnp.arange(m, mp), jnp.arange(m, mp)].set(1.0)
        lo = jnp.pad(a.lo, ((0, pad), (0, pad)))
        a = DF(hi, lo)

    def blk(i, j):
        return DF(a.hi[i * block:(i + 1) * block,
                       j * block:(j + 1) * block],
                  a.lo[i * block:(i + 1) * block,
                       j * block:(j + 1) * block])

    l_blocks = [[None] * nb for _ in range(nb)]
    inv_diag = [None] * nb
    for j in range(nb):
        ajj = blk(j, j)
        for t in range(j):
            ljt = l_blocks[j][t]
            ajj = df_sub(ajj, hp_matmul(ljt, ljt, transpose_b=True))
        ljj = _df_chol_block(ajj, pivot_floor)
        l_blocks[j][j] = ljj
        inv_diag[j] = _df_trtri_block(ljj)
        for i in range(j + 1, nb):
            aij = blk(i, j)
            for t in range(j):
                aij = df_sub(aij, hp_matmul(l_blocks[i][t], l_blocks[j][t],
                                            transpose_b=True))
            l_blocks[i][j] = hp_matmul(aij, inv_diag[j], transpose_b=True)
    return l_blocks, inv_diag, nb, block


def _assemble(blocks, nb, block, m):
    hi = jnp.zeros((nb * block, nb * block), jnp.float32)
    lo = jnp.zeros_like(hi)
    for i in range(nb):
        for j in range(i + 1):
            if blocks[i][j] is None:
                continue
            hi = jax.lax.dynamic_update_slice(hi, blocks[i][j].hi,
                                              (i * block, j * block))
            lo = jax.lax.dynamic_update_slice(lo, blocks[i][j].lo,
                                              (i * block, j * block))
    return DF(hi[:m, :m], lo[:m, :m])


def _df_trtri_blocks(l_blocks, inv_diag, nb):
    """Blocked lower-triangular inverse from the Cholesky block grid:
    X[i][j] = -invL[i][i] @ (sum_{j <= t < i} L[i][t] X[t][j])."""
    x = [[None] * nb for _ in range(nb)]
    for i in range(nb):
        x[i][i] = inv_diag[i]
    for j in range(nb):
        for i in range(j + 1, nb):
            s = None
            for t in range(j, i):
                term = hp_matmul(l_blocks[i][t], x[t][j])
                s = term if s is None else df_add(s, term)
            x[i][j] = df_neg(hp_matmul(inv_diag[i], s))
    return x


def df_cholesky(a: DF, block: int = 512, pivot_floor: float = 0.0) -> DF:
    """Blocked lower Cholesky of an (m, m) double-float SPD matrix:
    diagonal blocks factor on the VPU, panels and trailing updates ride
    the MXU via `hp_matmul`. m pads to a block multiple with inert
    identity rows. fp64-class accuracy — the point: fp32 Cholesky breaks
    down at kappa ~ 1e7, while the Nystrom moment matrix C + rI reaches
    1e9+ at n ~ 1e6 rows."""
    m = a.hi.shape[0]
    l_blocks, _, nb, blk = _df_chol_blocks(
        a, block, jnp.float32(pivot_floor))
    return _assemble(l_blocks, nb, blk, m)


def df_trtri_lower(l: DF, block: int = 512) -> DF:
    """Blocked inverse of an (m, m) df lower-triangular matrix."""
    m = l.hi.shape[0]
    block = _pick_block(m, block)
    nb = -(-m // block)
    mp = nb * block
    if mp != m:
        pad = mp - m
        hi = jnp.pad(l.hi, ((0, pad), (0, pad)))
        hi = hi.at[jnp.arange(m, mp), jnp.arange(m, mp)].set(1.0)
        l = DF(hi, jnp.pad(l.lo, ((0, pad), (0, pad))))
    lb = [[DF(l.hi[i * block:(i + 1) * block, j * block:(j + 1) * block],
              l.lo[i * block:(i + 1) * block, j * block:(j + 1) * block])
           for j in range(nb)] for i in range(nb)]
    inv_diag = [_df_trtri_block(lb[i][i]) for i in range(nb)]
    x = _df_trtri_blocks(lb, inv_diag, nb)
    return _assemble(x, nb, block, m)


def _block_rows(v: DF, nb: int, block: int) -> list:
    """Split an (m, r) df matrix into nb row chunks of `block`, zero-padding
    the tail chunk."""
    m, r = v.hi.shape
    mp = nb * block
    hi = jnp.pad(v.hi, ((0, mp - m), (0, 0)))
    lo = jnp.pad(v.lo, ((0, mp - m), (0, 0)))
    return [DF(hi[i * block:(i + 1) * block],
               lo[i * block:(i + 1) * block]) for i in range(nb)]


def _forward_solve_blocks(l_blocks, inv_diag, nb, b_chunks):
    """y = L^-1 b with df block substitution: per-element error ~
    kappa * 2^-49 (no kappa^2 amplification — unlike going through the
    explicit inverse, which is why beta uses this path)."""
    y = [None] * nb
    for i in range(nb):
        rhs = b_chunks[i]
        for t in range(i):
            rhs = df_sub(rhs, hp_matmul(l_blocks[i][t], y[t]))
        y[i] = hp_matmul(inv_diag[i], rhs)
    return y


def _back_solve_blocks(l_blocks, inv_diag, nb, y):
    """z = L^-T y with df block substitution."""
    z = [None] * nb
    for i in range(nb - 1, -1, -1):
        rhs = y[i]
        for t in range(i + 1, nb):
            # L[t][i]^T @ z[t]: contract over the t-block rows
            rhs = df_sub(rhs, hp_matmul(l_blocks[t][i].T, z[t]))
        z[i] = hp_matmul(inv_diag[i].T, rhs)
    return z


def df_cholesky_inverse_factor(c_hi, reg, b_hi=None, block: int = 512,
                               pivot_floor_rel: float = 1e-3,
                               c_lo=None, b_lo=None):
    """On-device (C + reg I)^-1 inverse square-root factor in emulated
    fp64 — the device counterpart of the Nystrom host finalize
    (`gp/nystrom.py:_finalize_host`): ic = inv(chol(C + rI))^T, so
    ic ic^T ~= (C + reg I)^-1.

    `c_hi` is the fp32 moment matrix (symmetrized here), `reg` a scalar
    ridge > 0. Pivots are floored at pivot_floor_rel * reg: directions
    whose fp32 moment noise drove a pivot non-positive revert toward the
    ridge prior (the same semantics as the host fallback's eigenvalue
    clamp — `_finalize_host` docstring).

    Accuracy contract (tests/test_df64.py): the factor L and solves carry
    ~kappa * 2^-49; the explicit blocked inverse behind `ic` carries
    ~kappa^2 * 2^-49 normwise — the same shape as LAPACK's blocked dtrtri
    at 2^-53, and below ic's own fp32 output rounding for kappa up to
    ~3e8.

    Returns (ic_f32, beta_f32_or_None, logdet_f32):
      beta = (C + reg I)^-1 b computed via two df block triangular
      SOLVES (kappa * 2^-49 — tighter than the host's inverse-based
      beta at kappa^2 * 2^-53); None when b_hi is None.
      logdet = log det(C + reg I) = 2 sum log diag L.

    c_lo / b_lo: optional df tails when the caller accumulated the
    moments in double-float (`gp/nystrom.py` moments='df64') — the
    factorization then starts from the full ~2^-48 moment value instead
    of its fp32 rounding.
    """
    c_hi = jnp.asarray(c_hi, jnp.float32)
    m = c_hi.shape[0]
    sym = 0.5 * (c_hi + c_hi.T)
    sym_lo = (0.5 * (jnp.asarray(c_lo, jnp.float32)
                     + jnp.asarray(c_lo, jnp.float32).T)
              if c_lo is not None else jnp.zeros_like(sym))
    r = jnp.asarray(reg, jnp.float32)
    diag = jnp.arange(m)
    d = df_add(DF(sym[diag, diag], sym_lo[diag, diag]),
               df_from_f32(jnp.broadcast_to(r, (m,))))
    a = DF(sym.at[diag, diag].set(d.hi),
           sym_lo.at[diag, diag].set(d.lo))
    floor = jnp.float32(pivot_floor_rel) * r
    l_blocks, inv_diag, nb, blk = _df_chol_blocks(a, block, floor)
    x = _df_trtri_blocks(l_blocks, inv_diag, nb)
    inv = _assemble(x, nb, blk, m)
    ic = df_round(inv.T)

    beta = None
    if b_hi is not None:
        b_df = DF(jnp.asarray(b_hi, jnp.float32),
                  jnp.asarray(b_lo, jnp.float32) if b_lo is not None
                  else jnp.zeros_like(jnp.asarray(b_hi, jnp.float32)))
        b_chunks = _block_rows(b_df, nb, blk)
        y = _forward_solve_blocks(l_blocks, inv_diag, nb, b_chunks)
        z = _back_solve_blocks(l_blocks, inv_diag, nb, y)
        beta = jnp.concatenate([df_round(zi) for zi in z], axis=0)[:m]

    # logdet = 2 sum log diag(L): fp32 log of df diag (hi + lo) is plenty
    # (log squashes the df tail below fp32 ulp of the SUM); padded inert
    # diagonal entries are 1 -> log 1 = 0, but mask anyway.
    ld = jnp.zeros((), jnp.float32)
    for j in range(nb):
        dj = l_blocks[j][j]
        dvals = jnp.diagonal(dj.hi) + jnp.diagonal(dj.lo)
        good = jnp.arange(blk) + j * blk < m
        ld = ld + 2.0 * jnp.sum(jnp.where(good, jnp.log(
            jnp.where(good, dvals, 1.0)), 0.0))
    return ic, beta, ld
