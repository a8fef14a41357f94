"""Plots (kernel-matrix permutations + figure emission) and the structured
Metrics recorder — the qualitative-analysis parity surfaces of
`/root/reference/train.py:29-58` and `/root/reference/util.py:27-92`."""

import json
import os

import numpy as np

from nngp_tpu.eval.plots import (
    draw_calibration,
    draw_embeddings,
    draw_kernel_heatmap,
    draw_kernel_histogram,
    draw_uncertainty,
    permute_kernel_matrix,
    permute_train_test_kernel_matrix,
)
from nngp_tpu.featurize.parser import QueryInfo
from nngp_tpu.utils.profiling import Metrics, annotate


def _infos(preds):
    return [QueryInfo(num_table=1, num_joins=0, num_predicates=p,
                      is_equal_join=False, is_multi_key=False)
            for p in preds]


def test_permute_kernel_matrix_groups_by_attribute():
    """Symmetric permutation sorts rows/cols by the partition key
    (`/root/reference/train.py:29-38`): grouped-by-num_predicates order."""
    infos = _infos([3, 1, 2, 1])
    k = np.arange(16, dtype=float).reshape(4, 4)
    out = permute_kernel_matrix(k, infos, "num_predicates")
    # sorted groups: p=1 -> indices [1, 3], p=2 -> [2], p=3 -> [0]
    perm = [1, 3, 2, 0]
    np.testing.assert_array_equal(out, k[np.ix_(perm, perm)])


def test_permute_train_test_kernel_matrix():
    """Rows ordered by test std, columns by train attributes
    (`/root/reference/train.py:40-47`)."""
    train_infos = _infos([2, 1])
    k = np.arange(6, dtype=float).reshape(3, 2)     # (test=3, train=2)
    std = np.asarray([0.5, 0.1, 0.3])
    out = permute_train_test_kernel_matrix(k, train_infos, "num_predicates",
                                           std)
    np.testing.assert_array_equal(out, k[[1, 2, 0]][:, [1, 0]])


def test_draw_functions_emit_files(tmp_path):
    rng = np.random.default_rng(0)
    k = rng.standard_normal((6, 6))
    k = k @ k.T
    paths = {
        "heat": tmp_path / "heat.png",
        "hist": tmp_path / "hist.png",
        "unc": tmp_path / "unc.png",
        "emb": tmp_path / "emb.png",
    }
    draw_kernel_heatmap(k, str(paths["heat"]))
    draw_kernel_histogram(k, str(paths["hist"]), bins=10)
    draw_uncertainty(str(paths["unc"]), errors=rng.standard_normal(6),
                     uncertainty=rng.uniform(0, 1, 6),
                     y=rng.standard_normal(6))
    draw_embeddings(rng.standard_normal((6, 2)), str(paths["emb"]),
                    label=np.arange(6))
    for p in paths.values():
        assert os.path.getsize(p) > 0


def test_draw_calibration_emits_file_and_table(tmp_path):
    """The calibration curve (`/root/reference/util.py:296-313`): a
    perfectly specified Gaussian posterior should land near the diagonal."""
    rng = np.random.default_rng(3)
    mu = rng.standard_normal(4000)
    sd = np.full(4000, 1.0)
    y = mu + rng.standard_normal(4000) * sd
    out = tmp_path / "cal.png"
    table = draw_calibration(y, mu, sd, str(out))
    assert os.path.getsize(out) > 0
    assert table[0.0] == 0.0 and table[1.0] == 1.0
    # observed coverage tracks expected within sampling noise
    for p in (0.5, 0.9):
        assert abs(table[p] - p) < 0.05


def test_metrics_record_timeit_dump(tmp_path):
    m = Metrics()
    m.record("n_train", 100)
    with m.timeit("phase"):
        pass
    with annotate("region"):                 # no-op outside a trace
        pass
    out = tmp_path / "metrics.json"
    m.dump(str(out))
    payload = json.loads(out.read_text())
    assert payload["n_train"] == 100
    assert payload["phase_s"] >= 0
