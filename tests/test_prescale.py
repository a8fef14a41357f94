"""Input-prescale (fp32 Gram overflow guard) semantics.

The reference runs raw features in fp64 (`/root/reference/train.py:24`),
where chunk_size=64 factorized categorical slots reaching 2^64
(`/root/reference/QuerySampler.py:224-235`) are harmless; their squared fp32
Gram entries overflow. For scale-equivariant specs (bias-free Dense +
1-homogeneous activations) `fit_gp`/`distributed_fit` divide the inputs by
an exact power of two and compensate std/cov on exit — these tests pin the
exactness of that compensation and the auto-selection rules.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nngp_tpu.gp import fit_gp
from nngp_tpu.gp.posterior import _auto_input_scale
from nngp_tpu.models.kernel_spec import (
    KernelSpec,
    mlp,
    is_scale_equivariant,
    reference_kernel,
)


def _data(n=60, m=16, d=5, seed=0, scale=1000.0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(0, scale, (n, d)).astype(dtype))
    y = jnp.asarray(rng.standard_normal((n, 1)).astype(dtype))
    xt = jnp.asarray(rng.uniform(0, scale, (m, d)).astype(dtype))
    return x, y, xt


@pytest.mark.parametrize("get", ["nngp", "ntk"])
def test_prescale_compensation_is_exact_fp64(get):
    """Scaled fit == unscaled fit to fp64 rounding: mean, std, full cov,
    and the incremental extend."""
    x, y, xt = _data()
    spec = reference_kernel()
    p0 = fit_gp(spec, x, y, get=get)
    p1 = fit_gp(spec, x, y, get=get, input_scale=1024.0)
    assert p1.input_scale == 1024.0

    m0, s0 = p0.predict_mean_std(xt)
    m1, s1 = p1.predict_mean_std(xt)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=1e-9, atol=1e-11)

    _, c0 = p0.predict(xt, compute_cov=True)
    _, c1 = p1.predict(xt, compute_cov=True)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0),
                               rtol=1e-8, atol=1e-8)

    e0 = p0.extend(xt[:4], jnp.ones((4, 1), x.dtype))
    e1 = p1.extend(xt[:4], jnp.ones((4, 1), x.dtype))
    assert e1.input_scale == 1024.0
    em0, es0 = e0.predict_mean_std(xt[4:])
    em1, es1 = e1.predict_mean_std(xt[4:])
    # extend runs the duals on the scaled inputs whose last-bit arccos
    # rounding differs; the ill-conditioned solve amplifies it to ~1e-8
    np.testing.assert_allclose(np.asarray(em1), np.asarray(em0),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(es1), np.asarray(es0),
                               rtol=1e-6, atol=1e-9)


def test_auto_scale_selection_rules():
    spec = reference_kernel()
    assert is_scale_equivariant(spec.layers)
    # fp64 never prescales (no overflow risk; keeps oracle paths raw)
    x64, _, _ = _data(scale=2.0**60)
    assert _auto_input_scale(x64, spec.layers) == 1.0
    # fp32 below the threshold stays raw ([0,1000] forest scale)
    x32, _, _ = _data(scale=1000.0, dtype=np.float32)
    assert _auto_input_scale(x32, spec.layers) == 1.0
    # fp32 oversized picks the enclosing power of two
    xh, _, _ = _data(scale=2.0**40, dtype=np.float32)
    s = _auto_input_scale(xh, spec.layers)
    assert s == 2.0 ** np.ceil(np.log2(float(jnp.max(jnp.abs(xh)))))
    # non-homogeneous activation: no exact compensation exists
    erf_spec = KernelSpec(mlp(1, activation="erf"))
    assert not is_scale_equivariant(erf_spec.layers)
    assert _auto_input_scale(xh, erf_spec.layers) == 1.0
    # bias terms also break homogeneity
    biased = KernelSpec(mlp(1, b_std=0.5))
    assert not is_scale_equivariant(biased.layers)
    assert _auto_input_scale(xh, biased.layers) == 1.0


@pytest.mark.parametrize("get", ["nngp", "ntk"])
def test_fp32_huge_features_match_fp64_oracle(get):
    """2^63-scale features (synth6-style packed chunks): the fp32 fit
    auto-prescales, stays finite, and tracks the raw-feature fp64 oracle."""
    x, y, xt = _data(scale=2.0**63)
    spec = reference_kernel()
    p64 = fit_gp(spec, x, y, get=get)
    m64, s64 = p64.predict_mean_std(xt)

    x32 = jnp.asarray(np.asarray(x, np.float32))
    y32 = jnp.asarray(np.asarray(y, np.float32))
    p32 = fit_gp(spec, x32, y32, get=get)
    assert p32.input_scale > 1.0
    m32, s32 = p32.predict_mean_std(jnp.asarray(np.asarray(xt, np.float32)))
    assert np.all(np.isfinite(np.asarray(m32)))
    assert np.all(np.isfinite(np.asarray(s32)))
    np.testing.assert_allclose(np.asarray(m32).ravel(),
                               np.asarray(m64).ravel(), rtol=0, atol=0.05)
    # std agrees to fp32 accuracy RELATIVE to its (enormous) magnitude
    np.testing.assert_allclose(np.asarray(s32).ravel(),
                               np.asarray(s64).ravel(), rtol=0.05)


def test_layout_bound_scale_no_device_probe():
    """`input_scale_for_bound(encoder.max_abs_bound(), ...)` — the
    production fit path — picks a covering power of two from the LAYOUT
    (no data probe), agrees with the data probe's decision on real
    workloads, and the Estimator wires it through automatically."""
    from nngp_tpu.featurize.stats import TableStats
    from nngp_tpu.featurize.encoder import SingleTableEncoder
    from nngp_tpu.gp.posterior import input_scale_for_bound
    import pandas as pd

    spec = reference_kernel()
    # numeric-only table: bound is the [0,1000] range scale -> no prescale
    rng = np.random.default_rng(3)
    df_num = pd.DataFrame({"a": rng.uniform(0, 9, 50),
                           "b": rng.uniform(0, 9, 50)})
    st_num = TableStats.from_dataframe(
        df_num, ["numerical", "numerical"], "tnum", chunk_size=64)
    enc_num = SingleTableEncoder(st_num)
    assert enc_num.max_abs_bound() == 1000.0
    assert input_scale_for_bound(enc_num.max_abs_bound(),
                                 spec.layers) == 1.0
    # categorical chunk_size=64 table: slots reach 2^64-1 -> scale 2^64
    df_cat = pd.DataFrame({"c": ["v%d" % (i % 7) for i in range(50)]})
    st_cat = TableStats.from_dataframe(
        df_cat, ["categorical"], "tcat", chunk_size=64)
    enc_cat = SingleTableEncoder(st_cat)
    assert enc_cat.max_abs_bound() == 2.0 ** 64 - 1.0
    assert input_scale_for_bound(enc_cat.max_abs_bound(),
                                 spec.layers) == 2.0 ** 64
    # chunk_norm folds the chunks onto [0,1000]: no prescale needed
    enc_cn = SingleTableEncoder(st_cat, chunk_norm=True)
    assert enc_cn.max_abs_bound() <= 1000.0
    assert input_scale_for_bound(enc_cn.max_abs_bound(),
                                 spec.layers) == 1.0
    # fp64 / non-equivariant specs never prescale, bound notwithstanding
    assert input_scale_for_bound(2.0 ** 64, spec.layers, fp64=True) == 1.0
    erf_spec = KernelSpec(mlp(1, activation="erf"))
    assert input_scale_for_bound(2.0 ** 64, erf_spec.layers) == 1.0
    # the bound COVERS every encodable line: scale >= any data probe
    enc_rows = enc_cat.encode_batch([[(0, [0, 5])], [(0, [63])]],
                                    dtype=np.float32)
    assert float(np.max(np.abs(enc_rows))) <= enc_cat.max_abs_bound()


def test_estimator_extend_scale_guard(tmp_path):
    """fp32 serving semantics when the data-probed fit scale cannot cover
    a later extend: the guard raises a CLEAR error (advising a refit)
    instead of silently NaN-ing the factor, and the server's live
    posterior survives untouched. (A layout-bound 'always covering' scale
    was tried and reverted — dividing small numeric features by the 2^64
    chunk ceiling underflows the solve; see Estimator._fit.)"""
    from nngp_tpu.featurize.stats import TableStats
    from nngp_tpu.serve.estimator import Estimator
    import pandas as pd

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"x": rng.uniform(0, 9, 80),
                       "tag": ["t%d" % (i % 5) for i in range(80)]})
    st = TableStats.from_dataframe(
        df, ["numerical", "categorical"], "ta", chunk_size=64)
    qp = tmp_path / "q"
    qp.mkdir()
    # training lines WITHOUT categorical predicates: the (free, host-side)
    # data probe picks scale 1.0
    (qp / "query_1.txt").write_text(
        "".join(f"ta@x,{8.0 - i*0.1},{i*0.1}@@{i+1}\n" for i in range(40)))
    est = Estimator("toy", None, str(qp), stats=[st],
                    dtype=np.float32, verbose=False)
    assert float(est.posterior.input_scale) == 1.0
    # a categorical extend carries ~2^63 chunk slots the factor's scale
    # cannot cover -> loud guard, live posterior intact
    old_post = est.posterior
    with pytest.raises(ValueError, match="input_scale"):
        est.extend_with_lines(["ta@tag,1@@5"])
    assert est.posterior is old_post
    # numeric extends within coverage still work
    n = est.extend_with_lines(["ta@x,5.0,1.0@@3"])
    assert n == 1
    m, s = est.predict(["ta@x,5.0,1.0@"])
    assert np.all(np.isfinite(m)) and np.all(np.isfinite(s))


def test_distributed_prescale_matches_single_chip():
    """distributed_fit auto-prescales the same way; sharded predict/extend
    agree with the single-chip prescaled posterior."""
    from jax.sharding import Mesh
    from nngp_tpu.parallel import distributed_fit

    x, y, xt = _data(n=48, m=8, scale=2.0**50, dtype=np.float32)
    spec = reference_kernel()
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    dist = distributed_fit(spec, x, y, mesh, diag_reg=1e-3)
    assert dist.input_scale > 1.0
    single = fit_gp(spec, x, y, diag_reg=1e-3)
    assert single.input_scale == dist.input_scale
    dm, ds = dist.predict_mean_std(xt)
    sm, ss = single.predict_mean_std(xt)
    # fp32 with different-but-equivalent op orders (masked vs fused ridge,
    # distributed vs dense solves) on an ill-conditioned Gram: ~1e-3
    np.testing.assert_allclose(np.asarray(dm).ravel(), np.asarray(sm).ravel(),
                               rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ds).ravel(), np.asarray(ss).ravel(),
                               rtol=1e-2, atol=1e-2 * float(np.max(ss)))
    ext_d = dist.extend(xt[:4], jnp.ones((4, 1), jnp.float32))
    ext_s = single.extend(xt[:4], jnp.ones((4, 1), jnp.float32))
    em_d, _ = ext_d.predict_mean_std(xt[4:])
    em_s, _ = ext_s.predict_mean_std(xt[4:])
    np.testing.assert_allclose(np.asarray(em_d).ravel(),
                               np.asarray(em_s).ravel(), rtol=1e-2, atol=1e-3)
