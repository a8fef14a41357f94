"""BASELINE.md anchor-number parity gate (`pytest -m parity`).

Asserts the measured accuracy anchors that define reference parity — the
numbers BASELINE.md publishes and every round's bench is compared against.
The unit suite proves components correct in isolation; THIS gate catches
the round-3l failure class: a defensible-looking default change that ships
an end-to-end quality regression (the df64 rank-cut default was a 15%
median-q regression that every unit test passed).

Anchor provenance:
  * forest fp64-CPU NNGP/NTK 10.8k — BASELINE.md "Forest workload" table
    (reference numerics: fp64, diag_reg=1e-3, seed-10 60/20/20 split
    identical to `/root/reference/util.py:271-293`).
  * synth6 raw fp64 — BASELINE.md round-3 table (median 9.776/p95 5504):
    bit-exact reference encoding on the committed 6-table Zipf workload.
  * small-n pinned anchors — golden values computed once (fp64 CPU,
    deterministic seeds) covering the serving tiers whose defaults have
    regressed before: Nystrom, df64 moment streaming, chunk_norm.

Tolerances: fp64 CPU runs are deterministic up to XLA reduction-order
changes across versions — rtol 2e-3 on q-error stats is tight enough to
catch any real regression (the round-3l incident was 15%).

Wall-clock: ~6 min on the 1-core CPU image (the 10.8k fp64 Cholesky
dominates). Run it before flipping any numerics/default flag.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nngp_tpu.data.workload import (
    load_multi_join_workload,
    load_single_table_workload,
)
from nngp_tpu.eval.qerror import symmetric_qerror
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.gp import fit_gp, fit_nystrom
from nngp_tpu.models.kernel_spec import reference_kernel

pytestmark = pytest.mark.parity


@pytest.fixture(scope="module")
def forest_split():
    x, y, infos, _enc = load_single_table_workload(
        "workloads/forest_data", dtype=np.float64)
    return train_test_val_split(x, y, train_frac=0.6, test_frac=0.2,
                                all_query_infos=infos)


@pytest.fixture(scope="module")
def synth6_raw():
    x, y, infos, _enc = load_multi_join_workload(
        "workloads/synth6_join_data", schema_name="synth6",
        dtype=np.float64)
    return train_test_val_split(x, y, train_frac=0.6, test_frac=0.2,
                                all_query_infos=infos)


def _fit_predict_q(x_tr, y_tr, x_te, y_te, get="nngp", **kw):
    post = fit_gp(reference_kernel(), jnp.asarray(x_tr), jnp.asarray(y_tr),
                  diag_reg=1e-3, get=get, **kw)
    mean, _std = post.predict_mean_std(jnp.asarray(x_te))
    err = np.asarray(mean).ravel() - np.asarray(y_te).ravel()
    q = symmetric_qerror(err)
    mse = float(np.sum(err ** 2))
    return float(np.median(q)), float(np.quantile(q, 0.95)), mse


def test_forest_fp64_nngp_anchor(forest_split):
    """The headline reference-parity anchor: fp64 forest 10.8k, get='nngp'
    (BASELINE.md: median 2.5962 / p95 22.331 / MSE 18208.19)."""
    x_tr, y_tr, _, x_te, y_te, _, _, _, _ = forest_split
    med, p95, mse = _fit_predict_q(x_tr, y_tr, x_te, y_te, get="nngp")
    assert med == pytest.approx(2.5962, rel=2e-3)
    assert p95 == pytest.approx(22.331, rel=2e-3)
    assert mse == pytest.approx(18208.19, rel=1e-3)


def test_forest_fp64_ntk_anchor(forest_split):
    """get='ntk' t=inf semantics anchor (BASELINE.md: MSE 19725.31 /
    median 2.6333 / p95 26.162)."""
    x_tr, y_tr, _, x_te, y_te, _, _, _, _ = forest_split
    med, p95, mse = _fit_predict_q(x_tr, y_tr, x_te, y_te, get="ntk")
    assert med == pytest.approx(2.6333, rel=2e-3)
    assert p95 == pytest.approx(26.162, rel=2e-3)
    assert mse == pytest.approx(19725.31, rel=1e-3)


def test_synth6_raw_parity_anchor(synth6_raw):
    """Bit-exact reference encoding on the 6-table Zipf join workload
    (BASELINE.md: fp64 median 9.776 / p95 5504 — the POOR absolute number
    is the reference encoding's chunk dominance, kept as the parity
    surface; chunk_norm/ARD rows are the framework's improvements)."""
    x_tr, y_tr, _, x_te, y_te, _, _, _, _ = synth6_raw
    med, p95, _mse = _fit_predict_q(x_tr, y_tr, x_te, y_te, get="nngp")
    assert med == pytest.approx(9.776, rel=2e-3)
    assert p95 == pytest.approx(5504.05, rel=2e-3)


# ---- small-n golden anchors for the serving tiers ----------------------
# Values computed once on this image (fp64 CPU, deterministic seeds) by
# tests/golden/parity_pins.py — regenerate ONLY with an understood,
# measured quality change, never to make a red gate green.

_FOREST_2048_PINS = {
    # tier -> (median_q, p95_q); n_tr=2048 (seed-10 split prefix), n_te=3600.
    # Note the fp32+df64 Nystrom tier reproduces the fp64 oracle tier
    # DIGIT-FOR-DIGIT (the round-3l DF-pair property this gate protects).
    "exact_fp64": (3.1046, 42.5145),
    "nystrom_m256_fp64": (3.5658, 46.3905),
    "nystrom_m256_fp32_df64": (3.5658, 46.3905),
}


@pytest.fixture(scope="module")
def forest_2048(forest_split):
    x_tr, y_tr, _, x_te, y_te, _, _, _, _ = forest_split
    return x_tr[:2048], y_tr[:2048], x_te, y_te


def test_forest_2048_exact_pin(forest_2048):
    x_tr, y_tr, x_te, y_te = forest_2048
    med, p95, _ = _fit_predict_q(x_tr, y_tr, x_te, y_te)
    pin = _FOREST_2048_PINS["exact_fp64"]
    assert med == pytest.approx(pin[0], rel=2e-3)
    assert p95 == pytest.approx(pin[1], rel=2e-3)


def _nystrom_q(x_tr, y_tr, x_te, y_te, dtype, moments):
    post = fit_nystrom(reference_kernel(), x_tr.astype(dtype),
                       y_tr.astype(dtype), num_inducing=256,
                       diag_reg=1e-3, seed=0, moments=moments)
    mean, _ = post.predict_mean_std(jnp.asarray(x_te.astype(dtype)))
    q = symmetric_qerror(np.asarray(mean).ravel()
                         - np.asarray(y_te).ravel())
    return float(np.median(q)), float(np.quantile(q, 0.95))


def test_forest_2048_nystrom_fp64_pin(forest_2048):
    """The Nystrom/DTC serving tier's quality anchor — a rank_rtol /
    whitening / finalize default change that moves serving q-error
    (round-3l's failure) trips this pin."""
    x_tr, y_tr, x_te, y_te = forest_2048
    med, p95 = _nystrom_q(x_tr, y_tr, x_te, y_te, np.float64, "fp32")
    pin = _FOREST_2048_PINS["nystrom_m256_fp64"]
    assert med == pytest.approx(pin[0], rel=2e-3)
    assert p95 == pytest.approx(pin[1], rel=2e-3)


def test_synthimdb_2048_pin():
    """IMDB-shaped clique workload (synthimdb): golden 2048-row anchor so
    the forest/synth6/synthimdb no-regression trio is all gated."""
    x, y, infos, _enc = load_multi_join_workload(
        "workloads/synthimdb_data", schema_name="synthimdb",
        dtype=np.float64)
    x_tr, y_tr, _, x_te, y_te, _, _, _, _ = train_test_val_split(
        x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos)
    med, p95, _ = _fit_predict_q(x_tr[:2048], y_tr[:2048], x_te, y_te)
    assert med == pytest.approx(3.7554, rel=2e-3)
    assert p95 == pytest.approx(113.8391, rel=2e-3)


def test_forest_2048_nystrom_df64_moments_pin(forest_2048):
    """fp32 inputs + df64 moment streaming must reproduce the fp64 oracle
    tier's q-error (the round-3l DF-pair fix made this exact; a dropped
    tail anywhere in the moment/basis/predict chain breaks it)."""
    x_tr, y_tr, x_te, y_te = forest_2048
    med, p95 = _nystrom_q(x_tr, y_tr, x_te, y_te, np.float32, "df64")
    pin = _FOREST_2048_PINS["nystrom_m256_fp32_df64"]
    assert med == pytest.approx(pin[0], rel=2e-3)
    assert p95 == pytest.approx(pin[1], rel=2e-3)


def test_synthtpch_2048_pin():
    """TPC-H-shaped star workload (synthtpch, round 5): the third committed
    join-graph family (snowflake / clique / STAR through the lineitem fact
    table, all-numerical predicates per the reference's TPC-H loaders —
    `/root/reference/datasets.py:10-47`). Golden 2048-row anchor."""
    x, y, infos, _enc = load_multi_join_workload(
        "workloads/synthtpch_data", schema_name="synthtpch",
        dtype=np.float64)
    x_tr, y_tr, _, x_te, y_te, _, _, _, _ = train_test_val_split(
        x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos)
    med, p95, _ = _fit_predict_q(x_tr[:2048], y_tr[:2048], x_te, y_te)
    assert med == pytest.approx(2.7015, rel=2e-3)
    assert p95 == pytest.approx(30.861, rel=2e-3)


def test_synthtpcds_2048_pin():
    """TPC-DS-shaped workload (synthtpcds, round 5): star WITH a join-graph
    triangle (store_sales-item-promotion; the reference's TPC-DS loader
    layouts, `/root/reference/datasets.py:52-98`). The 99-dim wide-fact
    encoding and the triangle's dimension-to-dimension joins make this the
    hardest committed family — the anchor gates against regressions, not
    beauty. Golden 2048-row fp64 pin."""
    x, y, infos, _enc = load_multi_join_workload(
        "workloads/synthtpcds_data", schema_name="synthtpcds",
        dtype=np.float64)
    x_tr, y_tr, _, x_te, y_te, _, _, _, _ = train_test_val_split(
        x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos)
    med, p95, _ = _fit_predict_q(x_tr[:2048], y_tr[:2048], x_te, y_te)
    assert med == pytest.approx(5.964, rel=2e-3)
    assert p95 == pytest.approx(305.6134, rel=2e-3)
