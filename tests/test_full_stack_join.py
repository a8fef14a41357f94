"""Full-stack multi-join integration: sample -> encode -> fit -> evaluate on
the committed synthetic workload (workloads/synth_join_data)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from nngp_tpu.data.workload import load_multi_join_workload
from nngp_tpu.eval.qerror import symmetric_qerror
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.gp import fit_gp
from nngp_tpu.models.kernel_spec import reference_kernel

WORKLOAD = os.path.join(os.path.dirname(__file__), os.pardir,
                        "workloads", "synth_join_data")


@pytest.mark.skipif(not os.path.isdir(WORKLOAD),
                    reason="synthetic join workload not generated")
def test_multi_join_end_to_end_training():
    x, y, infos, enc = load_multi_join_workload(WORKLOAD, schema_name="synth")
    assert x.shape[0] == 2400
    assert {i.num_table for i in infos} == {1, 2, 3}

    (x_tr, y_tr, _i, x_te, y_te, infos_te, *_rest) = train_test_val_split(
        x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos)
    post = fit_gp(reference_kernel(), jnp.asarray(x_tr), jnp.asarray(y_tr))
    mean, std = post.predict_mean_std(jnp.asarray(x_te))
    errors = np.asarray(mean).ravel() - np.asarray(y_te).ravel()
    q = symmetric_qerror(errors)
    # the model must be meaningfully better than a constant predictor
    const_errors = float(np.mean(y_tr)) - np.asarray(y_te).ravel()
    assert np.median(q) < np.median(symmetric_qerror(const_errors))
    assert np.median(q) < 3.0
    assert np.all(np.asarray(std) >= 0)


@pytest.mark.skipif(not os.path.isdir(WORKLOAD),
                    reason="synthetic join workload not generated")
def test_multi_join_workload_stats_json_fallback():
    # loads stats from workloads/synth_stats (no CSVs present)
    x, y, infos, enc = load_multi_join_workload(WORKLOAD, schema_name="synth")
    assert enc.feat_dim == x.shape[1]
    # join feature block: fact-dim1 and fact-dim2 share key columns
    assert enc.total_num_joins >= 2


def test_binary_join_workload_end_to_end(tmp_path):
    """Sample a binary-join workload with ground truth, load it through the
    binary-join workload path, fit, sanity-check q-error."""
    import pandas as pd
    from nngp_tpu.data.sampler import BinaryJoinSampler
    from nngp_tpu.data.workload import load_binary_join_workload
    from nngp_tpu.featurize.stats import TableStats

    rng = np.random.default_rng(0)
    t1 = pd.DataFrame({"k": rng.integers(0, 30, 400),
                       "x": rng.uniform(0, 1, 400)})
    t2 = pd.DataFrame({"k": rng.integers(0, 30, 300),
                       "w": rng.uniform(0, 1, 300)})
    s1 = TableStats.from_dataframe(t1, ["numerical"] * 2, "t1")
    s2 = TableStats.from_dataframe(t2, ["numerical"] * 2, "t2")
    sampler = BinaryJoinSampler(t1, s1, t2, s2, seed=3)
    qdir = tmp_path / "bj"
    qdir.mkdir()
    sampler.sample_batch_query(num_joins=1, mini_batch=240,
                               save_path=str(qdir), data_centric=True)

    x, y, infos, enc = load_binary_join_workload(str(qdir),
                                                 stats_pair=[s1, s2])
    assert x.shape == (240, enc.feat_dim)
    assert all(i.num_table == 2 for i in infos)
    x_tr, y_tr, _, x_te, y_te, *_rest = train_test_val_split(
        x, y, 0.6, 0.2, all_query_infos=infos)
    post = fit_gp(reference_kernel(), jnp.asarray(x_tr), jnp.asarray(y_tr))
    mean, _std = post.predict_mean_std(jnp.asarray(x_te))
    q = symmetric_qerror(np.asarray(mean).ravel() - np.asarray(y_te).ravel())
    # non-equi binary joins from ~150 train rows are genuinely hard; the
    # gate here is "pipeline produces sane estimates", not model quality
    assert np.isfinite(q).all() and np.median(q) < 50
