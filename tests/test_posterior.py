"""GP posterior parity vs an independent numpy fp64 oracle implementing the
documented gradient_descent_mse_ensemble t=infinity formulas (SURVEY.md
section 7 item 2)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nngp_tpu.gp import fit_gp
from nngp_tpu.models.kernel_spec import KernelSpec, reference_kernel, mlp


def _np_kernel(spec, x1, x2):
    """Numpy fp64 re-derivation of the kernel (independent code path)."""
    d = x1.shape[1]
    nngp = x1 @ x2.T / d
    ntk = np.zeros_like(nngp)
    d1 = np.sum(x1 * x1, axis=1)[:, None] / d
    d2 = np.sum(x2 * x2, axis=1)[None, :] / d
    from nngp_tpu.models.kernel_spec import Dense
    for layer in spec.layers:
        if isinstance(layer, Dense):
            w2, b2 = layer.w_std ** 2, layer.b_std ** 2
            nngp = w2 * nngp + b2
            ntk = w2 * ntk + nngp
            d1 = w2 * d1 + b2
            d2 = w2 * d2 + b2
        else:
            sq = np.sqrt(d1 * d2)
            cos = np.clip(nngp / sq, -1, 1)
            if layer.name == "relu":
                theta = np.arccos(cos)
                tdot = (np.pi - theta) / (2 * np.pi)
                t = sq * (np.sin(theta) + (np.pi - theta) * cos) / (2 * np.pi)
                ntk = ntk * tdot
                nngp = t
                d1, d2 = d1 / 2, d2 / 2
            elif layer.name == "erf":
                den = np.sqrt((1 + 2 * d1) * (1 + 2 * d2))
                t = (2 / np.pi) * np.arcsin(np.clip(2 * nngp / den, -1, 1))
                tdot = (4 / np.pi) / np.sqrt((1 + 2 * d1) * (1 + 2 * d2) - 4 * nngp ** 2)
                ntk = ntk * tdot
                nngp = t
                d1 = (2 / np.pi) * np.arcsin(2 * d1 / (1 + 2 * d1))
                d2 = (2 / np.pi) * np.arcsin(2 * d2 / (1 + 2 * d2))
    return nngp, ntk


def _oracle_predict(spec, x_tr, y_tr, x_te, diag_reg, get):
    k_tt, th_tt = _np_kernel(spec, x_tr, x_tr)
    k_st, th_st = _np_kernel(spec, x_te, x_tr)
    k_ss, _ = _np_kernel(spec, x_te, x_te)
    n = x_tr.shape[0]
    if get == "nngp":
        solve = k_tt
    else:
        solve = th_tt
    reg = diag_reg * np.mean(np.diag(solve))
    inv = np.linalg.inv(solve + reg * np.eye(n))
    if get == "nngp":
        mean = k_st @ inv @ y_tr
        cov = k_ss - k_st @ inv @ k_st.T
    else:
        mean = th_st @ inv @ y_tr
        cov = (k_ss + th_st @ inv @ k_tt @ inv @ th_st.T
               - th_st @ inv @ k_st.T - k_st @ inv @ th_st.T)
    return mean, cov


@pytest.mark.parametrize("get", ["nngp", "ntk"])
@pytest.mark.parametrize("layers_fn", [reference_kernel,
                                       lambda: KernelSpec(mlp(2, activation="erf"))])
def test_posterior_matches_oracle(get, layers_fn):
    spec = layers_fn()
    rng = np.random.default_rng(0)
    x_tr = rng.uniform(0, 1000, size=(40, 10))
    y_tr = rng.standard_normal((40, 1)) * 5 + 10
    x_te = rng.uniform(0, 1000, size=(15, 10))

    post = fit_gp(spec, jnp.asarray(x_tr), jnp.asarray(y_tr),
                  diag_reg=1e-3, get=get)
    mean, cov = post.predict(jnp.asarray(x_te), compute_cov=True)
    mean_o, cov_o = _oracle_predict(spec, x_tr, y_tr, x_te, 1e-3, get)
    # Oracle uses explicit inverse, we use Cholesky solves; at the [0,1000]
    # feature scale the Gram condition number makes ~1e-7 relative drift fair.
    np.testing.assert_allclose(np.asarray(mean), mean_o, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(cov), cov_o, rtol=1e-6, atol=1e-8)

    # diag path agrees with full-cov diagonal (clamped at 0)
    mean2, var = post.predict(jnp.asarray(x_te), compute_cov="diag")
    np.testing.assert_allclose(np.asarray(mean2), mean_o, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(var), np.maximum(np.diag(cov_o), 0), rtol=1e-5, atol=1e-8
    )


def test_posterior_interpolates_training_data():
    """With a tiny ridge the posterior mean at train points ~= targets and
    variance ~ 0."""
    spec = reference_kernel()
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 100, size=(25, 6))
    y = rng.standard_normal((25, 1))
    post = fit_gp(spec, jnp.asarray(x), jnp.asarray(y), diag_reg=1e-8)
    mean, var = post.predict(jnp.asarray(x), compute_cov="diag")
    np.testing.assert_allclose(np.asarray(mean), y, atol=1e-4)
    assert np.all(np.asarray(var) < 1e-3 * float(post.spec.diag_fn(jnp.asarray(x)).mean()))


@pytest.mark.parametrize("get", ["nngp", "ntk"])
def test_extend_equals_full_refit(get):
    spec = reference_kernel()
    rng = np.random.default_rng(2)
    x1, y1 = rng.uniform(0, 10, (30, 5)), rng.standard_normal((30, 1))
    x2, y2 = rng.uniform(0, 10, (8, 5)), rng.standard_normal((8, 1))
    x_te = rng.uniform(0, 10, (6, 5))

    post = fit_gp(spec, jnp.asarray(x1), jnp.asarray(y1), get=get)
    ext = post.extend(jnp.asarray(x2), jnp.asarray(y2))

    m_ext, v_ext = ext.predict(jnp.asarray(x_te), compute_cov="diag")
    # Full refit with the SAME absolute ridge the incremental path kept.
    full = fit_gp(spec, jnp.concatenate([jnp.asarray(x1), jnp.asarray(x2)]),
                  np.vstack([y1, y2]), diag_reg=float(post.reg),
                  get=get, diag_reg_absolute_scale=True)
    m_full, v_full = full.predict(jnp.asarray(x_te), compute_cov="diag")
    np.testing.assert_allclose(np.asarray(m_ext), np.asarray(m_full), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(v_ext), np.asarray(v_full),
                               rtol=1e-6, atol=1e-10)


def test_fused_fit_factor_matches_dense():
    """Left-looking fused Gram+Cholesky (the large-n single-chip fit path)
    must reproduce the dense factor for both gets (fp64 CPU oracle)."""
    import jax
    from nngp_tpu.gp.posterior import _fused_fit_factor
    from nngp_tpu.models.kernel_spec import (
        apply_diag_recursion,
        reference_kernel,
    )
    from nngp_tpu.ops.gram import input_diag

    spec = reference_kernel()
    rng = np.random.default_rng(11)
    n = 600
    x = jnp.asarray(rng.uniform(0, 1000, (n, 14)))
    dn, dt = apply_diag_recursion(input_diag(x), spec.layers)
    for get, dvec in (("nngp", dn), ("ntk", dt)):
        reg = 1e-3 * jnp.mean(dvec)
        l = _fused_fit_factor(spec.layers, x, reg, get, block_size=128)
        k = spec.kernel_fn(x, x, get)
        idx = jnp.arange(n)
        k = k.at[idx, idx].set(dvec + reg)
        want = jax.lax.linalg.cholesky(k)
        np.testing.assert_allclose(np.asarray(l), np.asarray(want),
                                   rtol=1e-9, atol=1e-9)


def test_fused_fit_factor_columns_layout():
    """layout='columns' (memory-lean large-n form) must match 'inplace'."""
    import jax
    from nngp_tpu.ops.linalg import fused_panel_cholesky
    rng = np.random.default_rng(12)
    n = 500
    a = rng.standard_normal((n, n))
    k = a @ a.T + n * np.eye(n)

    def panel_fn(s, e):
        return jnp.asarray(k[s:, s:e])

    l_in = fused_panel_cholesky(panel_fn, n, jnp.float64, block_size=128,
                                layout="inplace")
    l_co = fused_panel_cholesky(panel_fn, n, jnp.float64, block_size=128,
                                layout="columns")
    want = np.linalg.cholesky(k)
    np.testing.assert_allclose(np.asarray(l_in), want, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(l_co), want, rtol=1e-9, atol=1e-9)


def test_blocked_cholesky_ignores_garbage_upper_triangle():
    """The documented pairing with gram_pallas(mirror='lower'): strictly-
    upper garbage must not leak into the factor (no input symmetrization)."""
    from nngp_tpu.ops.linalg import blocked_cholesky
    rng = np.random.default_rng(13)
    n = 300
    a = rng.standard_normal((n, n))
    k = a @ a.T + n * np.eye(n)
    dirty = np.tril(k) + np.triu(np.full((n, n), np.nan), 1)
    l = blocked_cholesky(jnp.asarray(dirty), block_size=128)
    np.testing.assert_allclose(np.asarray(l), np.linalg.cholesky(k),
                               rtol=1e-9, atol=1e-9)


def test_block_factor_solves_and_append_match_dense():
    """BlockLowerTriangular (layout='blocks') must reproduce the dense
    factor, both triangular solves, and the append-rows extension."""
    from nngp_tpu.ops.linalg import (
        BlockLowerTriangular,
        block_cholesky_append_rows,
        block_tri_solve_lower,
        block_tri_solve_lower_t,
        fused_panel_cholesky,
    )
    rng = np.random.default_rng(14)
    n, m, r = 500, 70, 9
    a = rng.standard_normal((n + m, n + m))
    k = a @ a.T + (n + m) * np.eye(n + m)

    def panel_fn(s, e):
        return jnp.asarray(k[s:n, s:e])

    bf = fused_panel_cholesky(panel_fn, n, jnp.float64, block_size=128,
                              layout="blocks")
    assert isinstance(bf, BlockLowerTriangular)
    assert bf.shape == (n, n)
    want = np.linalg.cholesky(k[:n, :n])
    np.testing.assert_allclose(np.asarray(bf.to_dense()), want,
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(bf.diagonal()), np.diag(want),
                               rtol=1e-9, atol=1e-9)

    rhs = rng.standard_normal((n, r))
    np.testing.assert_allclose(
        np.asarray(block_tri_solve_lower(bf, jnp.asarray(rhs))),
        np.linalg.solve(want, rhs), rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(block_tri_solve_lower_t(bf, jnp.asarray(rhs))),
        np.linalg.solve(want.T, rhs), rtol=1e-8, atol=1e-9)

    ext = block_cholesky_append_rows(
        bf, jnp.asarray(k[n:, :n]), jnp.asarray(k[n:, n:]))
    assert ext.shape == (n + m, n + m)
    np.testing.assert_allclose(np.asarray(ext.to_dense()),
                               np.linalg.cholesky(k),
                               rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("get", ["nngp", "ntk"])
def test_posterior_block_factor_end_to_end(get, monkeypatch):
    """Force the block-factor fit path at tiny n: fit/predict/extend through
    a BlockLowerTriangular must match the plain dense-path posterior.

    Tolerances are ~1e-5 relative, not 1e-9: the fused path pins the solve
    kernel's diagonal to the exact O(n) recursion values while the dense
    path keeps the computed diagonal's acos(rho=1) sqrt(eps) noise — the two
    fits differ by ~1e-8 in the Gram diagonal by design."""
    import nngp_tpu.gp.posterior as P
    from nngp_tpu.ops.linalg import BlockLowerTriangular

    spec = reference_kernel()
    rng = np.random.default_rng(15)
    # distinctive shapes so the monkeypatched trace can't hit a stale
    # _fit_impl jit cache entry
    x = rng.uniform(0, 1000, (700, 7))
    y = rng.standard_normal((700, 1))
    x2, y2 = rng.uniform(0, 1000, (12, 7)), rng.standard_normal((12, 1))
    x_te = rng.uniform(0, 1000, (17, 7))

    dense = fit_gp(spec, jnp.asarray(x), jnp.asarray(y), get=get)
    monkeypatch.setattr(P, "_FUSED_FIT_MIN_N", 64)
    monkeypatch.setattr(P, "_BLOCK_LAYOUT_MIN_N", 64)
    post = fit_gp(spec, jnp.asarray(x), jnp.asarray(y), get=get)
    assert isinstance(post.l, BlockLowerTriangular)
    assert len(post.l.blocks) > 1
    if get == "ntk":
        # block-tier NTK keeps NO resident train NNGP Gram: the posterior
        # covariance recomputes it panel-wise (one live n^2 object total)
        assert post.k_tt_nngp is None

    np.testing.assert_allclose(np.asarray(post.alpha),
                               np.asarray(dense.alpha), rtol=2e-5, atol=1e-7)
    m_b, v_b = post.predict(jnp.asarray(x_te), compute_cov="diag")
    m_d, v_d = dense.predict(jnp.asarray(x_te), compute_cov="diag")
    np.testing.assert_allclose(np.asarray(m_b), np.asarray(m_d),
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(v_b), np.asarray(v_d),
                               rtol=2e-5, atol=1e-7)

    ext_b = post.extend(jnp.asarray(x2), jnp.asarray(y2))
    ext_d = dense.extend(jnp.asarray(x2), jnp.asarray(y2))
    assert isinstance(ext_b.l, BlockLowerTriangular)
    if get == "ntk":
        assert ext_b.k_tt_nngp is None    # lazy k_tt stays lazy post-extend
    m_b, v_b = ext_b.predict(jnp.asarray(x_te), compute_cov="diag")
    m_d, v_d = ext_d.predict(jnp.asarray(x_te), compute_cov="diag")
    np.testing.assert_allclose(np.asarray(m_b), np.asarray(m_d),
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(v_b), np.asarray(v_d),
                               rtol=2e-5, atol=1e-7)
    if get == "ntk":
        # the FULL posterior covariance also runs through the panel-wise
        # K_tt rebuild (compute_cov=True is the reference's default shape)
        _, cov_b = ext_b.predict(jnp.asarray(x_te), compute_cov=True)
        _, cov_d = ext_d.predict(jnp.asarray(x_te), compute_cov=True)
        np.testing.assert_allclose(np.asarray(cov_b), np.asarray(cov_d),
                                   rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("get", ["nngp", "ntk"])
def test_fused_fit_dense_inplace_tier_matches_plain(get, monkeypatch):
    """The fused-fit fast path at the dense-inplace tier (4096 <= n < 28k;
    for NTK it now holds 2 live n^2 buffers instead of 3) must reproduce the
    plain small-n fit."""
    import nngp_tpu.gp.posterior as P

    spec = reference_kernel()
    rng = np.random.default_rng(16)
    x = rng.uniform(0, 1000, (410, 6))
    y = rng.standard_normal((410, 1))
    x_te = rng.uniform(0, 1000, (13, 6))

    plain = fit_gp(spec, jnp.asarray(x), jnp.asarray(y), get=get)
    monkeypatch.setattr(P, "_FUSED_FIT_MIN_N", 64)   # block layout stays 28k
    monkeypatch.setattr(P, "_MONOLITHIC_MAX_N", 64)  # skip the mono tier
    fused = fit_gp(spec, jnp.asarray(x), jnp.asarray(y), get=get)
    assert not hasattr(fused.l, "blocks")            # dense in-place tier
    if get == "ntk":
        assert fused.k_tt_nngp is not None
        np.testing.assert_allclose(np.asarray(fused.k_tt_nngp),
                                   np.asarray(plain.k_tt_nngp),
                                   rtol=1e-10, atol=1e-10)
    m_f, v_f = fused.predict(jnp.asarray(x_te), compute_cov="diag")
    m_p, v_p = plain.predict(jnp.asarray(x_te), compute_cov="diag")
    # ~1e-5 tolerance: the fused path pins the exact recursion diagonal
    # (see test_posterior_block_factor_end_to_end).
    np.testing.assert_allclose(np.asarray(m_f), np.asarray(m_p),
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_p),
                               rtol=2e-5, atol=1e-7)


def test_panel_gram_matches_kernel_fn():
    """panel_gram (bounded-temps full Gram; the NTK large-n k_tt builder)
    must equal the monolithic kernel_fn Gram for both gets, ragged panels
    included."""
    from nngp_tpu.ops.gram import panel_gram
    spec = KernelSpec(mlp(3, activation="erf"))
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.uniform(0, 1000, (130, 9)))
    for get in ("nngp", "ntk"):
        want = spec.kernel_fn(x, x, get)
        got = panel_gram(spec.layers, x, get, block_size=48)
        # ~1e-10 relative: the panel matmuls tile differently from the
        # monolithic dot, so fp64 rounding differs in the last bits
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-9, atol=1e-7)


@pytest.mark.parametrize("get", ["nngp", "ntk"])
def test_monolithic_tier_matches_plain(get, monkeypatch):
    """The monolithic-Gram + blocked-Cholesky tier (default-off; selectable
    via mono_max_n — see _MONOLITHIC_MAX_N in gp/posterior.py) must
    reproduce the plain small-n fit, extend included."""
    import nngp_tpu.gp.posterior as P
    from nngp_tpu.ops.linalg import BlockLowerTriangular

    spec = reference_kernel()
    rng = np.random.default_rng(21)
    x = rng.uniform(0, 1000, (530, 6))
    y = rng.standard_normal((530, 1))
    x2, y2 = rng.uniform(0, 1000, (9, 6)), rng.standard_normal((9, 1))
    x_te = rng.uniform(0, 1000, (15, 6))

    plain = fit_gp(spec, jnp.asarray(x), jnp.asarray(y), get=get)
    monkeypatch.setattr(P, "_FUSED_FIT_MIN_N", 64)
    # mono tier is default-off (session-dependent perf, see posterior.py);
    # raise the bound above n to route through it
    monkeypatch.setattr(P, "_MONOLITHIC_MAX_N", 16384)
    mono = fit_gp(spec, jnp.asarray(x), jnp.asarray(y), get=get)
    assert not isinstance(mono.l, BlockLowerTriangular)
    if get == "ntk":
        assert mono.k_tt_nngp is not None     # resident below block tier
    m_m, v_m = mono.predict(jnp.asarray(x_te), compute_cov="diag")
    m_p, v_p = plain.predict(jnp.asarray(x_te), compute_cov="diag")
    np.testing.assert_allclose(np.asarray(m_m), np.asarray(m_p),
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(v_m), np.asarray(v_p),
                               rtol=2e-5, atol=1e-7)

    ext_m = mono.extend(jnp.asarray(x2), jnp.asarray(y2))
    ext_p = plain.extend(jnp.asarray(x2), jnp.asarray(y2))
    m_m, v_m = ext_m.predict(jnp.asarray(x_te), compute_cov="diag")
    m_p, v_p = ext_p.predict(jnp.asarray(x_te), compute_cov="diag")
    np.testing.assert_allclose(np.asarray(m_m), np.asarray(m_p),
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(v_m), np.asarray(v_p),
                               rtol=2e-5, atol=1e-7)


def test_pallas_fit_tier_matches_plain(monkeypatch):
    """The Pallas-Gram + blocked-Cholesky tier (default on TPU fp32 nngp
    fits below _PALLAS_FIT_MAX_N; interleaved A/B pallas_fit_ab2.log) must
    be AS accurate as the plain fp32 fit — judged against the same fp64
    oracle, since two fp32 Gram producers (Mosaic fast-math duals vs XLA)
    legitimately differ from each other by ~2x the fp32 solve noise.
    Runs the Mosaic kernel in interpret mode on CPU (backend gate
    monkeypatched); predict and extend both checked."""
    import nngp_tpu.gp.posterior as P
    from nngp_tpu.ops.linalg import BlockLowerTriangular

    spec = reference_kernel()
    rng = np.random.default_rng(23)
    x = rng.uniform(0, 1000, (530, 6))
    y = rng.standard_normal((530, 1))
    x2, y2 = rng.uniform(0, 1000, (9, 6)), rng.standard_normal((9, 1))
    x_te = rng.uniform(0, 1000, (15, 6))

    def run(post):
        post = post.extend(jnp.asarray(x2, post.x_train.dtype),
                           jnp.asarray(y2, post.y_train.dtype))
        m, v = post.predict(jnp.asarray(x_te, post.x_train.dtype),
                            compute_cov="diag")
        return np.asarray(m), np.asarray(v)

    f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
    m_o, v_o = run(fit_gp(spec, jnp.asarray(x), jnp.asarray(y)))  # fp64
    m_p, v_p = run(fit_gp(spec, f32(x), f32(y)))                  # plain fp32
    monkeypatch.setattr(P, "_FUSED_FIT_MIN_N", 64)
    monkeypatch.setattr(P, "_PALLAS_FIT_MAX_N", 1 << 30)
    monkeypatch.setattr(P, "_pallas_fit_enabled", lambda: True)
    # spy: the tier must actually route through the Mosaic kernel
    import nngp_tpu.ops.gram_pallas as GP
    calls = {"n": 0}
    real = GP.gram_pallas

    def spy(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(GP, "gram_pallas", spy)
    pal = fit_gp(spec, f32(x), f32(y))
    assert calls["n"] == 1
    assert not isinstance(pal.l, BlockLowerTriangular)
    m_q, v_q = run(pal)

    err_plain = np.max(np.abs(m_p - m_o))
    err_pal = np.max(np.abs(m_q - m_o))
    # as-accurate-as: within 3x the plain fp32 path's oracle error
    # (floored at 1e-3 log2 units so a lucky plain draw can't fail us)
    assert err_pal <= 3 * max(err_plain, 1e-3), (err_pal, err_plain)
    verr_plain = np.max(np.abs(v_p - v_o) / v_o)
    verr_pal = np.max(np.abs(v_q - v_o) / v_o)
    assert verr_pal <= 3 * max(verr_plain, 1e-3), (verr_pal, verr_plain)


def test_pallas_fit_tier_gates():
    """fp64 inputs and get='ntk' must never route through the Pallas tier
    (its kernel is fp32-only and nngp-only) even when the tier is enabled."""
    import nngp_tpu.gp.posterior as P

    spec = reference_kernel()
    rng = np.random.default_rng(5)
    x64 = jnp.asarray(rng.uniform(0, 1000, (96, 4)), jnp.float64)
    y64 = jnp.asarray(rng.standard_normal((96, 1)), jnp.float64)
    # thresholds wide open: dtype/get gates alone must steer away
    l, alpha, reg, _ = P._fit_impl(
        x64, y64, spec, "nngp", 1e-3, False,
        fused_min_n=64, block_min_n=10**9, pallas_max_n=10**9)
    assert l.dtype == jnp.float64          # pallas would have cast to fp32
    x32, y32 = x64.astype(jnp.float32), y64.astype(jnp.float32)
    l, alpha, reg, k_tt = P._fit_impl(
        x32, y32, spec, "ntk", 1e-3, False,
        fused_min_n=64, block_min_n=10**9, pallas_max_n=10**9)
    assert k_tt is not None                # ntk keeps its resident k_tt


def _padded_parity_case(monkeypatch, force_fused):
    """Shared body: a padded fit + in-place extends must equal the dense
    posterior exactly (same tier family, fp64)."""
    import nngp_tpu.gp.posterior as P

    spec = reference_kernel()
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.uniform(0, 1000, (130, 6)))
    y = jnp.asarray(rng.standard_normal((130, 1)))
    x2 = jnp.asarray(rng.uniform(0, 1000, (9, 6)))
    y2 = jnp.asarray(rng.standard_normal((9, 1)))
    x3 = jnp.asarray(rng.uniform(0, 1000, (4, 6)))
    y3 = jnp.asarray(rng.standard_normal((4, 1)))
    x_te = jnp.asarray(rng.uniform(0, 1000, (15, 6)))

    if force_fused:
        monkeypatch.setattr(P, "_FUSED_FIT_MIN_N", 64)

    dense = fit_gp(spec, x, y)
    pad = fit_gp(spec, x, y, pad_to=160)
    assert pad.num_padded == 160 and pad.num_train == 130
    assert np.allclose(float(pad.reg), float(dense.reg), rtol=1e-12)

    def check(p_dense, p_pad):
        m_d, v_d = p_dense.predict(x_te, compute_cov="diag")
        m_p, v_p = p_pad.predict(x_te, compute_cov="diag")
        np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_d),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_d),
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(p_pad.log_marginal_likelihood(),
                                   p_dense.log_marginal_likelihood(),
                                   rtol=1e-9)

    check(dense, pad)

    # two rounds of in-place extends: shapes must NOT change (the whole
    # point — one compiled program across acquisition rounds)
    dense2, pad2 = dense.extend(x2, y2), pad.extend(x2, y2)
    assert pad2.num_padded == 160 and pad2.num_train == 139
    assert pad2.l.shape == pad.l.shape
    check(dense2, pad2)
    dense3, pad3 = dense2.extend(x3, y3), pad2.extend(x3, y3)
    assert pad3.num_padded == 160 and pad3.num_train == 143
    check(dense3, pad3)

    # exhausting the slots falls back to a dense append (shape change)
    big_x = jnp.asarray(rng.uniform(0, 1000, (40, 6)))
    big_y = jnp.asarray(rng.standard_normal((40, 1)))
    dense4, pad4 = dense3.extend(big_x, big_y), pad3.extend(big_x, big_y)
    assert pad4.n_real is None and pad4.num_train == 183
    check(dense4, pad4)

    # strip_padding materializes the equivalent dense posterior
    stripped = pad3.strip_padding()
    assert stripped.n_real is None and stripped.num_train == 143
    check(dense3, stripped)


def test_padded_fit_plain_tier(monkeypatch):
    _padded_parity_case(monkeypatch, force_fused=False)


def test_padded_fit_fused_tier(monkeypatch):
    _padded_parity_case(monkeypatch, force_fused=True)


def test_padded_fit_with_input_scale():
    """Padding composes with the fp32 prescale (pinned scale 2.0). fp32
    parity is judged against the fp64 oracle: a 96-row and a 64-row
    program tile their Gram matmuls differently, so their last-bit fp32
    rounding differs and the ill-conditioned solve amplifies it — the
    padded fit must simply be AS close to fp64 truth as the dense one."""
    spec = reference_kernel()
    rng = np.random.default_rng(33)
    x64 = rng.uniform(0, 1000, (64, 4))
    y64 = rng.standard_normal((64, 1))
    xt64 = rng.uniform(0, 1000, (7, 4))
    f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
    oracle = fit_gp(spec, jnp.asarray(x64), jnp.asarray(y64),
                    input_scale=2.0)
    m_o, _ = oracle.predict_mean_std(jnp.asarray(xt64))
    dense = fit_gp(spec, f32(x64), f32(y64), input_scale=2.0)
    pad = fit_gp(spec, f32(x64), f32(y64), input_scale=2.0, pad_to=96)
    assert float(pad.reg) == float(dense.reg)
    m_d, _ = dense.predict_mean_std(f32(xt64))
    m_p, s_p = pad.predict_mean_std(f32(xt64))
    err_d = np.max(np.abs(np.asarray(m_d) - np.asarray(m_o)))
    err_p = np.max(np.abs(np.asarray(m_p) - np.asarray(m_o)))
    assert err_p <= 3 * max(err_d, 1e-3), (err_p, err_d)
    assert np.all(np.isfinite(np.asarray(s_p)))
    ext = pad.extend(f32(xt64), jnp.zeros((7, 1), jnp.float32))
    assert ext.num_train == 71 and ext.num_padded == 96


def test_padded_fit_guards():
    spec = reference_kernel()
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1000, (16, 3))
    y = rng.standard_normal((16, 1))
    with pytest.raises(ValueError, match="pad_to"):
        fit_gp(spec, x, y, pad_to=8)            # pad_to < n
    with pytest.raises(ValueError, match="nngp"):
        fit_gp(spec, x, y, get="ntk", pad_to=32)
    with pytest.raises(ValueError, match="column-block"):
        fit_gp(spec, x, y, pad_to=50000)


def test_padded_extend_bucketed():
    """bucket=: a variable-size batch is rounded up to a power-of-two
    inert-padded append — same posterior as the exact-size append, slots
    past the real rows stay reusable by the NEXT append."""
    spec = reference_kernel()
    rng = np.random.default_rng(41)
    x = jnp.asarray(rng.uniform(0, 1000, (100, 5)))
    y = jnp.asarray(rng.standard_normal((100, 1)))
    x_te = jnp.asarray(rng.uniform(0, 1000, (11, 5)))
    pad = fit_gp(spec, x, y, pad_to=300)
    dense = fit_gp(spec, x, y)

    def check(p_pad, p_dense):
        m_p, s_p = p_pad.predict_mean_std(x_te)
        m_d, s_d = p_dense.predict_mean_std(x_te)
        np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_d),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_d),
                                   rtol=1e-7, atol=1e-9)

    # 10 rows bucketed to 64: n_real advances by 10 only
    x2 = jnp.asarray(rng.uniform(0, 1000, (10, 5)))
    y2 = jnp.asarray(rng.standard_normal((10, 1)))
    pad = pad.extend(x2, y2, bucket=64)
    dense = dense.extend(x2, y2)
    assert pad.num_train == 110 and pad.num_padded == 300
    check(pad, dense)

    # next bucketed append overwrites the bucket-pad slots just rewritten
    x3 = jnp.asarray(rng.uniform(0, 1000, (70, 5)))
    y3 = jnp.asarray(rng.standard_normal((70, 1)))
    pad = pad.extend(x3, y3, bucket=64)      # buckets to 128
    dense = dense.extend(x3, y3)
    assert pad.num_train == 180
    check(pad, dense)

    # evidence stays exact through bucketed appends
    np.testing.assert_allclose(pad.log_marginal_likelihood(),
                               dense.log_marginal_likelihood(), rtol=1e-9)

    # bucket that no longer fits -> dense fallback
    x4 = jnp.asarray(rng.uniform(0, 1000, (100, 5)))
    y4 = jnp.asarray(rng.standard_normal((100, 1)))
    pad = pad.extend(x4, y4, bucket=64)      # buckets to 128 > 120 slots
    dense = dense.extend(x4, y4)
    assert pad.n_real is None and pad.num_train == 280
    check(pad, dense)


def test_spec_params_matches_concrete_spec():
    """fit_gp(spec_params=...) with a structure spec must equal the
    concrete-spec fit bit-for-bit at fp64 rounding (same arithmetic, the
    constants just arrive as operands) — predict, evidence, and extend."""
    from nngp_tpu.models.kernel_spec import KernelSpec, mlp

    rng = np.random.default_rng(51)
    x = rng.uniform(0, 1000, (150, 5))
    y = rng.standard_normal((150, 1))
    xt = jnp.asarray(rng.uniform(0, 1000, (9, 5)))
    y2 = jnp.asarray(rng.standard_normal((9, 1)))
    concrete = KernelSpec(mlp(1, 512, "relu", 0.7, 30.0))
    structure = reference_kernel()          # different values, same shape
    params = {"w_stds": np.array([0.7, 0.7]),
              "b_stds": np.array([30.0, 30.0])}

    a = fit_gp(concrete, x, y, input_scale=1.0)
    b = fit_gp(structure, x, y, spec_params=params)
    assert b.input_scale == 1.0             # probe skipped (traced b)
    m_a, v_a = a.predict(xt, compute_cov="diag")
    m_b, v_b = b.predict(xt, compute_cov="diag")
    np.testing.assert_allclose(np.asarray(m_b), np.asarray(m_a),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(v_b), np.asarray(v_a),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(b.log_marginal_likelihood(),
                               a.log_marginal_likelihood(), rtol=1e-10)
    ea, eb = a.extend(xt, y2), b.extend(xt, y2)
    m_a, _ = ea.predict_mean_std(xt)
    m_b, _ = eb.predict_mean_std(xt)
    np.testing.assert_allclose(np.asarray(m_b), np.asarray(m_a),
                               rtol=1e-10, atol=1e-10)
    with pytest.raises(ValueError, match="spec_params"):
        fit_gp(structure, x, y,
               spec_params={"w_stds": np.ones(3), "b_stds": np.ones(3)})


def test_spec_params_programs_stable_across_values(monkeypatch):
    """The whole point: new learned constants (and a new diag_reg — now a
    data leaf) must NOT retrace fit, predict, or extend — including the
    padded/bucketed append, so relearn + pad_acquisitions loops compile
    once. Exercised on both the plain and fused tiers."""
    import nngp_tpu.gp.posterior as P

    structure = reference_kernel()
    rng = np.random.default_rng(53)
    x = rng.uniform(0, 1000, (140, 5))
    y = rng.standard_normal((140, 1))
    xt = jnp.asarray(rng.uniform(0, 1000, (9, 5)))
    y2 = jnp.asarray(rng.standard_normal((9, 1)))
    p1 = {"w_stds": np.array([1.0, 1.0]), "b_stds": np.array([0.1, 0.1])}
    p2 = {"w_stds": np.array([0.5, 0.9]), "b_stds": np.array([40.0, 2.0])}

    for force_fused in (False, True):
        if force_fused:
            monkeypatch.setattr(P, "_FUSED_FIT_MIN_N", 64)
        a = fit_gp(structure, x, y, spec_params=p1, pad_to=180)
        sa, _ = a.predict_mean_std(xt)
        a = a.extend(xt, y2, bucket=8)
        c_fit = P._fit_impl._cache_size()
        c_app = P._padded_append._cache_size()
        c_pred = type(a).predict_mean_std._cache_size()

        b = fit_gp(structure, x, y, spec_params=p2, diag_reg=3e-3,
                   pad_to=180)
        sb, _ = b.predict_mean_std(xt)
        b = b.extend(xt, y2, bucket=8)
        assert P._fit_impl._cache_size() == c_fit
        assert type(a).predict_mean_std._cache_size() == c_pred
        assert P._padded_append._cache_size() == c_app
        # and they really are different models
        assert float(np.max(np.abs(np.asarray(sb) - np.asarray(sa)))) > 1e-3
