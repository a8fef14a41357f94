"""ops/df64: emulated double precision on fp32 hardware.

The int8-slice Ozaki products are exact by construction on ANY backend
(int32 accumulation), so the CPU suite verifies the full accuracy claims;
the chip run only re-confirms MXU lowering (experiments/ozaki_probe.py).

Oracle construction note: an fp32 ROUNDING of a kappa >= 1e9 SPD matrix
is generally indefinite in exact arithmetic (rounding perturbs
eigenvalues by ~eps32 * |A| > lam_min), so the high-kappa tests build
the input as an EXACT df pair of a matrix that is PD by construction
(L L^T with fp32 L), and every oracle is evaluated on the df-representable
value — cancellation against unrepresentable bits is not the ops' doing.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nngp_tpu.ops.df64 import (DF, df_add, df_div, df_from_f32, df_mul,
                               df_round, df_sqrt, df_sub, hp_matmul,
                               df_cholesky, df_trtri_lower,
                               df_cholesky_inverse_factor,
                               _df_trtri_block)


def _df_to_f64(a: DF) -> np.ndarray:
    return np.asarray(a.hi, np.float64) + np.asarray(a.lo, np.float64)


def _lift(x64) -> DF:
    """Round-trip x64 into its df-representable value."""
    hi = np.asarray(x64, np.float32)
    lo = np.asarray(x64 - hi.astype(np.float64), np.float32)
    return DF(jnp.asarray(hi), jnp.asarray(lo))


def test_elementwise_df_ops_reach_twice_fp32_accuracy():
    rng = np.random.default_rng(0)
    a = _lift(rng.uniform(0.1, 10.0, 4096))
    b = _lift(rng.uniform(0.1, 10.0, 4096))
    a64, b64 = _df_to_f64(a), _df_to_f64(b)
    for op, ref in [(df_add, a64 + b64), (df_sub, a64 - b64),
                    (df_mul, a64 * b64), (df_div, a64 / b64)]:
        got = _df_to_f64(op(a, b))
        rel = np.abs(got - ref) / np.abs(ref)
        assert rel.max() < 1e-13, (op.__name__, rel.max())
    got = _df_to_f64(df_sqrt(a))
    rel = np.abs(got - np.sqrt(a64)) / np.sqrt(a64)
    assert rel.max() < 1e-13


def test_df_mul_scalar_operand_under_jit():
    """Regression: XLA:CPU duplicates a cheap rounded product into each
    consumer fusion (optimization barriers are expanded before fusion)
    and LLVM contracts the single-use `a*b + x` into fma — so the classic
    Dekker `p = a*b; e = (ah*bh - p) + ...` two_prod saw two DIFFERENT
    roundings of p and df_mul lost half its digits (3.9e-8 relative),
    but ONLY when the fusion chose to duplicate (observed with a scalar
    operand; vector*vector kept p multi-use and fused once). _two_prod is
    now built from the four exact Dekker partials, which contraction
    cannot change. Covers jit'd df_mul, df_div, df_sqrt against the same
    scalar; df_kernel_eval under jit is covered in the kernel tests."""
    rng = np.random.default_rng(1)
    v64 = rng.uniform(1.0, 1e6, 2048)
    a = _lift(v64)
    c64 = 1.0 / 6.0
    c = _lift(np.float64(c64))
    for op, ref in [(df_mul, v64 * c64), (df_div, v64 / c64)]:
        got = _df_to_f64(jax.jit(op)(a, c))
        rel = np.abs(got - ref) / np.abs(ref)
        assert rel.max() < 1e-13, (op.__name__, rel.max())
    got = _df_to_f64(jax.jit(df_sqrt)(a))
    rel = np.abs(got - np.sqrt(v64)) / np.sqrt(v64)
    assert rel.max() < 1e-13


def test_df_sqrt_handles_zero():
    out = df_sqrt(df_from_f32(jnp.zeros(4)))
    assert np.all(np.asarray(out.hi) == 0.0)
    assert np.all(np.isfinite(np.asarray(out.lo)))


def test_hp_matmul_fp32_inputs_beats_fp32_by_many_digits():
    rng = np.random.default_rng(1)
    # wide dynamic range ACROSS rows of a / columns of b: the slicing
    # grids are per-row/per-column, so this must not cost accuracy
    a = (rng.standard_normal((192, 384)) *
         10.0 ** rng.uniform(-6, 6, (192, 1))).astype(np.float32)
    b = (rng.standard_normal((384, 160)) *
         10.0 ** rng.uniform(-6, 6, (1, 160))).astype(np.float32)
    want = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    got = _df_to_f64(jax.jit(hp_matmul)(jnp.asarray(a), jnp.asarray(b)))
    # contract: error <= ~2^-49 relative to rowmax(a) x colmax(b) — the
    # same normwise backward-error SHAPE as any GEMM, 2^25 tighter than
    # fp32's 2^-24
    contract = (np.abs(a).max(1, keepdims=True).astype(np.float64) @
                np.abs(b).max(0, keepdims=True).astype(np.float64))
    rel = np.abs(got - want) / contract
    assert rel.max() < 1e-12, rel.max()
    got32 = np.asarray(
        jnp.asarray(a) @ jnp.asarray(b), np.float64)
    rel32 = np.abs(got32 - want) / contract
    assert rel.max() < 1e-4 * rel32.max()   # >= 10^4 x better than fp32


def test_hp_matmul_df_inputs_and_transpose_b():
    rng = np.random.default_rng(2)
    a64 = rng.standard_normal((128, 256))
    b64 = rng.standard_normal((96, 256))
    got = _df_to_f64(hp_matmul(_lift(a64), _lift(b64), transpose_b=True))
    want = _df_to_f64(_lift(a64)) @ _df_to_f64(_lift(b64)).T
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 1e-12, rel


def test_hp_matmul_zero_rows_and_ragged_k():
    rng = np.random.default_rng(3)
    a = rng.standard_normal((17, 33)).astype(np.float32)
    a[5] = 0.0                       # all-zero row: grid guard
    b = rng.standard_normal((33, 9)).astype(np.float32)
    got = _df_to_f64(hp_matmul(jnp.asarray(a), jnp.asarray(b)))
    want = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    assert np.abs(got - want).max() < 1e-10 * max(np.abs(want).max(), 1.0)


def test_hp_matmul_rejects_overflowing_contraction():
    a = jnp.zeros((2, 8193), jnp.float32)
    b = jnp.zeros((8193, 2), jnp.float32)
    with pytest.raises(ValueError, match="8192"):
        hp_matmul(a, b)


def _hard_chol_problem(m, diag_bits, seed):
    """(a_df, l_repr64): A = L L^T with fp32 L whose diagonal spans
    2^0 .. 2^-diag_bits (kappa(A) ~ 2^(2*diag_bits)), PD by construction;
    a_df is the df-representable A, exact to 2^-48."""
    rng = np.random.default_rng(seed)
    l32 = np.tril(rng.standard_normal((m, m)) * 0.1).astype(np.float32)
    d = np.exp2(-np.linspace(0, diag_bits, m)).astype(np.float32)
    for i in range(m):
        l32[i, i] = d[i]
        l32[i, :i] *= d[i]           # keep rows scaled like their pivot
    a64 = l32.astype(np.float64) @ l32.astype(np.float64).T
    return _lift(a64), np.linalg.cholesky(_df_to_f64(_lift(a64)))


@pytest.mark.parametrize("m,diag_bits", [(96, 6), (200, 15), (384, 15)])
def test_df_cholesky_matches_fp64_where_fp32_fails(m, diag_bits):
    a_df, want = _hard_chol_problem(m, diag_bits, seed=4)
    got = _df_to_f64(jax.jit(df_cholesky)(a_df))
    # contract: column errors scale with the column's pivot (like fp64
    # Cholesky); normalize per column
    scale = np.maximum(np.abs(want).max(0), np.abs(want).max() * 1e-16)
    rel = (np.abs(got - want) / scale[None, :]).max()
    assert rel < 1e-9, (diag_bits, rel)
    if diag_bits >= 15:              # kappa ~ 1e9: fp32 chol unusable
        a32 = np.asarray(_df_to_f64(a_df), np.float32)
        try:
            l32 = np.linalg.cholesky(a32.astype(np.float64)
                                     .astype(np.float32))
            err32 = (np.abs(l32.astype(np.float64) - want)
                     / scale[None, :]).max()
        except np.linalg.LinAlgError:
            err32 = np.inf
        assert rel < 1e-3 * err32


def test_df_trtri_blocked_contract_and_unblocked_exactness():
    """Unblocked trtri is ~exact; the blocked path's explicit inverse
    carries ~kappa^2 * 2^-49 normwise (same shape as LAPACK dtrtri at
    2^-53) — both asserted."""
    rng = np.random.default_rng(5)
    m = 160
    q, _ = np.linalg.qr(rng.standard_normal((m, m)))
    lam = np.logspace(0, -8, m)
    l64 = np.linalg.cholesky((q * lam) @ q.T)       # kappa(L) ~ 1e4
    l_df = _lift(l64)
    want = np.linalg.inv(_df_to_f64(l_df))
    got_u = _df_to_f64(_df_trtri_block(l_df))
    rel_u = np.abs(got_u - want).max() / np.abs(want).max()
    assert rel_u < 1e-12, rel_u
    got_b = _df_to_f64(df_trtri_lower(l_df, block=64))
    rel_b = np.abs(got_b - want).max() / np.abs(want).max()
    kappa_l = np.abs(lam).max() ** 0.5 / np.abs(lam).min() ** 0.5
    assert rel_b < 100.0 * kappa_l ** 2 * 2.0 ** -49, rel_b


@pytest.mark.parametrize("m,block", [(96, 96), (200, 64)])
def test_df_cholesky_inverse_factor_vs_host_fp64(m, block):
    """The on-device finalize against the host-fp64 semantics it
    replaces, at conditioning fp32 cannot touch (|C|/r = 1e8)."""
    rng = np.random.default_rng(6)
    psi = rng.standard_normal((4 * m, m))
    c64 = psi.T @ psi
    c32 = np.asarray(c64, np.float32)
    reg = 1e-8 * float(np.abs(np.diag(c32)).mean()) * m
    b32 = rng.standard_normal((m, 1)).astype(np.float32)
    ic, beta, ld = jax.jit(
        lambda c, b: df_cholesky_inverse_factor(c, jnp.float32(reg), b,
                                                block=block))(
        jnp.asarray(c32), jnp.asarray(b32))
    c_exact = 0.5 * (c32.astype(np.float64) + c32.astype(np.float64).T)
    a_exact = c_exact + reg * np.eye(m)
    # ic is fp32 OUTPUT (its contract): compare the implied inverse at
    # a tolerance set by ic's own fp32 rounding, kappa-amplified
    want_inv = np.linalg.inv(a_exact)
    got_inv = np.asarray(ic, np.float64) @ np.asarray(ic, np.float64).T
    rel = np.abs(got_inv - want_inv).max() / np.abs(want_inv).max()
    kappa = np.linalg.cond(a_exact)
    assert rel < max(1e-5, 100.0 * kappa * 2.0 ** -24), (kappa, rel)
    # beta goes through df SOLVES: much tighter than the inverse
    want_beta = np.linalg.solve(a_exact, b32.astype(np.float64))
    rel_b = np.abs(np.asarray(beta, np.float64) - want_beta).max() / \
        np.abs(want_beta).max()
    assert rel_b < 1e-5, rel_b
    sign, want_ld = np.linalg.slogdet(a_exact)
    assert sign > 0
    assert abs(float(ld) - want_ld) < 1e-4 * abs(want_ld)


def test_df_cholesky_pivot_floor_recovers_indefinite_noise():
    """A matrix that is PSD in exact arithmetic but rank-deficient: the
    floored pivots keep the factor and inverse finite."""
    rng = np.random.default_rng(7)
    u = rng.standard_normal((64, 8))
    c32 = np.asarray(u @ u.T, np.float32)          # rank 8: zero pivots
    reg = 1e-6 * float(np.abs(np.diag(c32)).mean())
    ic, beta, _ = df_cholesky_inverse_factor(
        jnp.asarray(c32), jnp.float32(reg),
        jnp.ones((64, 1), jnp.float32))
    assert np.all(np.isfinite(np.asarray(ic)))
    assert np.all(np.isfinite(np.asarray(beta)))


def test_hp_matmul_tiny_magnitude_rows_stay_finite():
    """Rows with max < 2^-70: the slice grid floors instead of
    underflowing to 0 (which would divide r/g into NaN)."""
    a = np.full((4, 8), 1e-25, np.float32)
    a[1] = 1e-35                       # below the 2^-70 grid floor
    a[2] = 0.0
    b = np.ones((8, 3), np.float32)
    out = hp_matmul(jnp.asarray(a), jnp.asarray(b))
    got = _df_to_f64(out)
    assert np.all(np.isfinite(got))
    want = a.astype(np.float64) @ b.astype(np.float64)
    assert np.abs(got[0] - want[0]).max() < 1e-12 * np.abs(want[0]).max()


# ---------------------------------------------------------------------------
# df kernel recursion (ops/df64_kernel.py)
# ---------------------------------------------------------------------------

def _kernel_case(layers, x1, x2, get=("nngp", "ntk")):
    from nngp_tpu.models.kernel_spec import KernelSpec
    from nngp_tpu.ops.df64_kernel import df_kernel_eval

    ref = KernelSpec(layers).kernel_fn(
        jnp.asarray(np.asarray(x1, np.float64)),
        jnp.asarray(np.asarray(x2, np.float64)), get)
    got = df_kernel_eval(layers, x1, x2, get)
    return [(np.asarray(r), _df_to_f64(g)) for r, g in zip(ref, got)]


def _scale_rel(ref, got):
    return np.abs(got - ref).max() / np.abs(ref).max()


@pytest.mark.parametrize("mk", ["relu_d1", "relu_d3", "erf_d2", "abs_d1",
                                "relu_hypers"])
def test_df_kernel_matches_fp64_oracle(mk):
    """df Gram entries reach ~1e-13 scale-relative vs the fp64 CPU oracle
    on [0,1000]-scale features — 6 decimal digits beyond fp32 (~1e-7).
    Requires x64 (CPU suite)."""
    from nngp_tpu.models.kernel_spec import Dense, Activation, mlp

    layers = {
        "relu_d1": mlp(depth=1),
        "relu_d3": mlp(depth=3),
        "erf_d2": mlp(depth=2, activation="erf", b_std=0.5),
        "abs_d1": mlp(depth=1, activation="abs"),
        "relu_hypers": (Dense(512, 0.24, 62.0), Activation("relu"),
                        Dense(1, 0.26, 0.0)),
    }[mk]
    rng = np.random.default_rng(3)
    x1 = rng.uniform(0, 1000, (48, 61)).astype(np.float32)
    x2 = rng.uniform(0, 1000, (40, 61)).astype(np.float32)
    for ref, got in _kernel_case(layers, x1, x2):
        assert _scale_rel(ref, got) < 3e-12


def test_df_kernel_near_duplicate_rows():
    """rho -> 1 regime (the fp32 failure mode this module exists for):
    NNGP entries stay ~1e-13 — the J1 dual depends on theta only through
    theta^2 ~ 2(1-rho), which df carries exactly. The NTK multiplier is
    LINEAR in theta, whose abs error at rho -> 1 is sqrt(df-eps) ~ 2^-24
    — the same shape as real fp64's sqrt(2^-53) ~ 1e-8 (both "sqrt of an
    ill-known tiny"), so the assert pins ~1e-7, far beyond fp32's 1e-4."""
    from nngp_tpu.models.kernel_spec import mlp

    rng = np.random.default_rng(5)
    x1 = rng.uniform(0, 1000, (32, 61)).astype(np.float32)
    x2 = np.concatenate([
        (x1[:16] * np.float32(1 + 1e-6)).astype(np.float32),
        x1[:16]])
    (rn, gn), (rt, gt) = _kernel_case(mlp(depth=1), x1, x2)
    assert _scale_rel(rn, gn) < 3e-12
    assert _scale_rel(rt, gt) < 1e-6


def test_df_kernel_nngp_only_and_input_moments():
    """get='nngp' skips the NTK chain; df input Gram/diag are exact for
    fp32-representable inputs (Ozaki slices + two_prod)."""
    from nngp_tpu.models.kernel_spec import mlp
    from nngp_tpu.ops.df64_kernel import (df_input_diag, df_input_gram,
                                          df_kernel_eval)

    rng = np.random.default_rng(7)
    x = rng.uniform(0, 1000, (24, 20)).astype(np.float32)
    k0 = _df_to_f64(df_input_gram(x, x))
    want = np.asarray(x, np.float64) @ np.asarray(x, np.float64).T / 20.0
    assert np.abs(k0 - want).max() / np.abs(want).max() < 1e-14
    d0 = _df_to_f64(df_input_diag(x))
    assert np.abs(d0 - np.diag(want)).max() / want.max() < 1e-14
    g = df_kernel_eval(mlp(depth=1), x, None, "nngp")
    assert _df_to_f64(g).shape == (24, 24)


def test_df_kernel_rejects_sin_and_traced_stds():
    from nngp_tpu.models.kernel_spec import Dense, mlp
    from nngp_tpu.ops.df64_kernel import df_kernel_eval

    x = np.ones((4, 8), np.float32)
    with pytest.raises(NotImplementedError):
        df_kernel_eval(mlp(depth=1, activation="sin"), x, x, "nngp")
    traced = (Dense(4, jnp.float32(1.0), jnp.float32(0.0)),)
    with pytest.raises(TypeError):
        df_kernel_eval(traced, x, x, "nngp")
