"""Model evidence: `GPPosterior.log_marginal_likelihood`, `select_diag_reg`,
and the closed-form Nystrom/DTC `log_evidence`.

The reference has no model selection (diag_reg hard-coded at 1e-3,
`/root/reference/train.py:171`); these are validated against direct numpy
fp64 evaluations of the Gaussian log density.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import nngp_tpu.gp.posterior as P
from nngp_tpu.gp import fit_gp, select_diag_reg
from nngp_tpu.gp.nystrom import fit_nystrom
from nngp_tpu.models.kernel_spec import KernelSpec, Dense, Relu, \
    reference_kernel


def _data(n=80, d=6, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, scale, (n, d)).astype(np.float64)
    y = np.sin(x.sum(axis=1))[:, None] + 0.1 * rng.standard_normal((n, 1))
    return x, y


def _dense_mll(spec, x, y, reg, get):
    """Direct numpy log N(y; 0, K_solve + reg I)."""
    k = np.asarray(spec.kernel_fn(jnp.asarray(x), jnp.asarray(x), get),
                   np.float64)
    a = k + reg * np.eye(len(x))
    l = np.linalg.cholesky(a)
    alpha = np.linalg.solve(a, y)
    return float(-0.5 * float(y.ravel() @ alpha.ravel())
                 - np.sum(np.log(np.diag(l)))
                 - 0.5 * len(x) * np.log(2 * np.pi))


@pytest.mark.parametrize("get", ["nngp", "ntk"])
def test_mll_matches_numpy_oracle(get):
    x, y = _data()
    spec = reference_kernel()
    post = fit_gp(spec, x, y, diag_reg=1e-3, get=get)
    want = _dense_mll(spec, x, y, float(post.reg), get)
    np.testing.assert_allclose(float(post.log_marginal_likelihood()), want,
                               rtol=1e-8)


def test_mll_input_scale_invariant():
    """For a scale-equivariant spec the prescale compensation must make the
    raw-unit evidence independent of the forced power-of-two scale."""
    x, y = _data(scale=1000.0, seed=3)
    spec = KernelSpec((Dense(512), Relu(), Dense(1)))
    m0 = float(fit_gp(spec, x, y, input_scale=1.0).log_marginal_likelihood())
    m1 = float(fit_gp(spec, x, y,
                      input_scale=64.0).log_marginal_likelihood())
    np.testing.assert_allclose(m1, m0, rtol=1e-9)


def test_mll_block_factor_layout(monkeypatch):
    """The evidence reads the factor diagonal through the column-block
    layout too (large-n fits)."""
    monkeypatch.setattr(P, "_FUSED_FIT_MIN_N", 64)
    monkeypatch.setattr(P, "_BLOCK_LAYOUT_MIN_N", 64)
    x, y = _data(n=96, seed=5)
    spec = reference_kernel()
    post = fit_gp(spec, x, y)
    assert hasattr(post.l, "blocks")
    want = _dense_mll(spec, x, y, float(post.reg), "nngp")
    np.testing.assert_allclose(float(post.log_marginal_likelihood()), want,
                               rtol=1e-8)


def test_select_diag_reg_picks_argmax():
    x, y = _data(n=100, seed=7)
    spec = reference_kernel()
    cands = (1e-4, 1e-3, 1e-2, 1e-1)
    best, scores = select_diag_reg(spec, x, y, candidates=cands)
    assert set(scores) == {float(c) for c in cands}
    assert all(np.isfinite(v) for v in scores.values())
    assert float(best.diag_reg) == max(scores, key=scores.get)


def test_nystrom_evidence_matches_dense_at_full_rank():
    """m = n with no truncation makes Q = K exactly, so the DTC evidence
    equals the dense MLL at the same (relative) ridge."""
    x, y = _data(n=70, seed=9)
    spec = reference_kernel()
    post = fit_nystrom(spec, x, y, num_inducing=70, rank_rtol=1e-14)
    exact = fit_gp(spec, x, y)
    np.testing.assert_allclose(post.log_evidence(),
                               float(exact.log_marginal_likelihood()),
                               rtol=1e-6)


def test_nystrom_evidence_scale_invariant_and_extend():
    x, y = _data(n=60, scale=1000.0, seed=11)
    x2, y2 = _data(n=20, scale=1000.0, seed=12)
    spec = KernelSpec((Dense(512), Relu(), Dense(1)))
    p0 = fit_nystrom(spec, x, y, num_inducing=24, input_scale=1.0)
    p1 = fit_nystrom(spec, x, y, num_inducing=24, input_scale=64.0)
    np.testing.assert_allclose(p1.log_evidence(), p0.log_evidence(),
                               rtol=1e-9)
    # extend accumulates y^T y: evidence equals refit on the concatenation
    # with the same inducing set and ridge
    ext = p0.extend(x2, y2)
    np.testing.assert_allclose(
        float(ext.yty), float(np.sum(y ** 2) + np.sum(y2 ** 2)), rtol=1e-12)
    assert np.isfinite(ext.log_evidence())


def test_distributed_mll_matches_dense_with_padding():
    """The sharded evidence must equal the dense oracle at a ragged n
    (inert pad rows: pivot 1, alpha 0 — zero contribution)."""
    from nngp_tpu.parallel import distributed_fit, make_mesh
    x, y = _data(n=61, seed=15)           # 61 % 8 != 0 -> padding engaged
    spec = reference_kernel()
    mesh = make_mesh()
    dist = distributed_fit(spec, x, y, mesh, 1e-3, "nngp", block_size=4)
    assert dist.num_padded > dist.num_train
    want = _dense_mll(spec, x, y, float(dist.reg), "nngp")
    np.testing.assert_allclose(float(dist.log_marginal_likelihood()), want,
                               rtol=1e-8)


def test_nystrom_evidence_none_yty_raises():
    """A posterior restored from a pre-evidence checkpoint (yty=None) must
    refuse — and extend must not resurrect a partial sum."""
    import dataclasses
    x, y = _data(n=40, seed=13)
    post = fit_nystrom(reference_kernel(), x, y, num_inducing=16)
    old = dataclasses.replace(post, yty=None)
    with pytest.raises(ValueError, match="refit"):
        old.log_evidence()
    ext = old.extend(x[:8], y[:8])
    assert ext.yty is None
    with pytest.raises(ValueError, match="refit"):
        ext.log_evidence()
