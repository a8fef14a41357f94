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
