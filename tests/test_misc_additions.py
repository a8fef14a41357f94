"""k_inv serving fast path + legacy split-layout encoder."""

import numpy as np
import pytest

import jax.numpy as jnp

from nngp_tpu.featurize.encoder import SplitLayoutEncoder
from nngp_tpu.featurize.stats import ColumnStats, TableStats
from nngp_tpu.gp import fit_gp
from nngp_tpu.models.kernel_spec import reference_kernel


# NOTE: an explicit-(K+rI)^-1 "serving fast path" was tried and removed:
# in fp32 at n~10k the kappa^2 error amplification through the explicit
# inverse corrupted posterior variances (std error ~400x the std scale) and
# the matmul was slower than the backward-stable triangular solve anyway.


def test_split_layout_encoder_matches_queryset_convention():
    stats = TableStats("t", tuple(
        ColumnStats(c, "numerical", 0.0, 10.0) for c in "ABC"))
    enc = SplitLayoutEncoder(stats)
    assert enc.feat_dim == 6
    x = enc.encode_batch([[(1, 5.0, 2.0)], []])
    # row 0: col B upper -> slot 1 = 500, lower -> slot 3+1 = 200
    np.testing.assert_array_equal(x[0], [0, 500, 0, 1000, 200, 1000])
    np.testing.assert_array_equal(x[1], [0, 0, 0, 1000, 1000, 1000])
    _, y = enc.transform_to_arrays([[]], [8])
    assert y[0, 0] == 3.0


def test_split_layout_rejects_categorical():
    stats = TableStats("t", (
        ColumnStats("a", "categorical", categories=(0, 1)),))
    with pytest.raises(ValueError):
        SplitLayoutEncoder(stats)


def test_chunked_predict_matches_full():
    rng = np.random.default_rng(1)
    x_tr = jnp.asarray(rng.uniform(0, 1000, (80, 6)))
    y_tr = jnp.asarray(rng.standard_normal((80, 1)))
    x_te = rng.uniform(0, 1000, (50, 6))
    post = fit_gp(reference_kernel(), x_tr, y_tr)
    m_full, s_full = post.predict_mean_std(jnp.asarray(x_te))
    m_c, s_c = post.predict_mean_std_chunked(x_te, chunk=16)  # 3 full + tail
    np.testing.assert_allclose(m_c.ravel(), np.asarray(m_full).ravel(),
                               rtol=1e-10)
    np.testing.assert_allclose(s_c, np.asarray(s_full), rtol=1e-8)


def test_build_aux_file_end_to_end(tmp_path):
    """File-level aux pipeline (`/root/reference/neuroestimator/
    merge_subquery_card.py`): card.csv + sub-query file -> aux lines on
    disk, header skipped and nngp_card<=0 rows dropped."""
    from nngp_tpu.serve.feedback import build_aux_file

    card = tmp_path / "card.csv"
    card.write_text(
        "query;nngp_card;nngp_std;pg_card;mix_card;true_card\n"
        "q1;200.0;2.0;1.0;1.0;100.0\n"
        "q_dropped;0.0;1.0;1.0;1.0;50.0\n"
        "q2;50.0;1.0;1.0;1.0;-1\n")
    sub = tmp_path / "sub.txt"
    sub.write_text("ta,tb@x,1,0@@ta,tb,id@100\n"
                   "ta,tb@x,2,0@@ta,tb,id@400\n")
    out = tmp_path / "join_query_aux.txt"
    lines = build_aux_file(str(card), str(sub), str(out))
    assert len(lines) == 2
    on_disk = out.read_text().strip().split("\n")
    assert on_disk == lines
    q1 = lines[0].split("@")
    assert float(q1[-2]) == 2.0          # q_error = 200/100
    # second csv row (nngp_card=0) was dropped, so line 2 pairs with q2
    assert float(lines[1].split("@")[-2]) == 8.0


def test_gp_rbf_mll_decreases_and_interpolates():
    """Hand-rolled RBF GP (`/root/reference/train.py:60-150`): the 10-step
    MLL descent lowers the objective and the posterior interpolates."""
    import jax.numpy as jnp
    from nngp_tpu.models import gp_rbf

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(-1, 1, (40, 3)))
    y = jnp.asarray(np.sin(np.asarray(x).sum(axis=1, keepdims=True)))
    p0 = gp_rbf.init_params(x.dtype)
    mll0 = float(gp_rbf.neg_marginal_likelihood(p0, x, y))
    params = gp_rbf.train(x, y, num_steps=10, verbose=None)
    mll1 = float(gp_rbf.neg_marginal_likelihood(params, x, y))
    assert mll1 < mll0
    mean, cov = gp_rbf.predict(params, x, y, x)
    assert np.allclose(np.asarray(mean), np.asarray(y), atol=0.2)
    assert np.all(np.isfinite(np.asarray(cov)))


def test_sklearn_mlp_regressor_wrapper():
    from nngp_tpu.baselines.trainer import train_mlp_regressor
    rng = np.random.default_rng(8)
    x = rng.uniform(-1, 1, (120, 4))
    y = x.sum(axis=1)
    reg = train_mlp_regressor(x, y, num_hid=32, epochs=200, batch_size=32)
    pred = reg.predict(x)
    assert np.corrcoef(pred, y)[0, 1] > 0.8


def test_memory_probe_returns_host_rss():
    from nngp_tpu.utils.memory import memory_usage_gb
    out = memory_usage_gb()
    assert out.get("host_rss_gb", 0) > 0


def test_examples_run_headless(tmp_path, monkeypatch):
    """The two standalone demos (`/root/reference/draw.py`,
    `/root/reference/active/DeepEnsemble.py` re-imaginings) run end to end
    headless."""
    import importlib.util
    import os

    monkeypatch.chdir(tmp_path)

    def load(name):
        path = os.path.join(os.path.dirname(__file__), os.pardir,
                            "examples", f"{name}.py")
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    gp_demo = load("sklearn_gp_demo")
    out = tmp_path / "gp_demo.png"
    gp_demo.main(str(out))
    assert out.exists()

    ens_demo = load("deep_ensemble_demo")
    ens_demo.main()     # asserts internally: std grows off-support
