"""End-to-end imdb_simple pipeline on synthetic IMDB-shaped CSVs.

The real IMDB dump is not in this image (the reference doesn't ship it
either, `/root/reference/readme.md:37`), so this drives the FULL deployment
path — raw CSVs -> SCHEMAS loaders -> DBSchema PK/FK recoding ->
MultiJoinSampler ground truth -> encoder -> GP fit -> serving Estimator —
on small synthetic tables with the exact imdb_simple shapes
(`/root/reference/neuroestimator/estimator/util.py:159-195`).
"""

import csv

import numpy as np
import pytest

import jax.numpy as jnp

from nngp_tpu.data.loaders import SCHEMAS
from nngp_tpu.data.sampler import MultiJoinSampler
from nngp_tpu.data.workload import load_multi_join_workload
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.featurize.schema import DBSchema
from nngp_tpu.gp import fit_gp
from nngp_tpu.models.kernel_spec import reference_kernel


def _write(path, header, rows):
    with open(path, "w", newline="") as f:
        w = csv.writer(f, delimiter=";")
        w.writerow(header)
        w.writerows(rows)


def _make_imdb_csvs(d, n_movies=60, seed=0):
    """Semicolon CSVs matching every imdb_simple loader's column layout.
    movie_id is dense 0..n-1 so the PK categorical recoding is the
    identity and the sampler's merge ground truth stays consistent."""
    rng = np.random.default_rng(seed)
    mid = np.arange(n_movies)
    _write(d / "title.csv", ["movie_id", "kind_id", "product_year",
                             "imdb_id"],
           np.column_stack([mid, rng.integers(1, 8, n_movies),
                            rng.integers(1950, 2020, n_movies),
                            rng.integers(0, 10 ** 6, n_movies)]))
    n_ci = 4 * n_movies
    _write(d / "cast_info.csv", ["person_id", "movie_id", "person_role_id"],
           np.column_stack([rng.integers(0, 500, n_ci),
                            rng.integers(0, n_movies, n_ci),
                            rng.integers(1, 12, n_ci)]))
    n_mi = 3 * n_movies
    _write(d / "movie_info.csv", ["movie_info_id", "movie_id",
                                  "info_type_id"],
           np.column_stack([np.arange(n_mi),
                            rng.integers(0, n_movies, n_mi),
                            rng.integers(1, 110, n_mi)]))
    n_mc = 2 * n_movies
    _write(d / "movie_companies.csv", ["movie_id", "company_id",
                                       "company_type_id"],
           np.column_stack([rng.integers(0, n_movies, n_mc),
                            rng.integers(0, 200, n_mc),
                            rng.integers(1, 3, n_mc)]))
    # imdb_simple reads this file through load_imdb_movie_info_idx2
    # (2 columns only)
    _write(d / "movie_info_idx.csv", ["movie_info_idx_id", "movie_id"],
           np.column_stack([np.arange(n_mi),
                            rng.integers(0, n_movies, n_mi)]))
    n_mk = 3 * n_movies
    _write(d / "movie_keyword.csv", ["movie_id", "keyword_id"],
           np.column_stack([rng.integers(0, n_movies, n_mk),
                            rng.integers(0, 400, n_mk)]))


def _sample_workload(csv_dir, query_dir, per_arity=60, max_tables=3):
    loaders, names = SCHEMAS["imdb_simple"]
    dfs, col_types, pks = [], [], []
    for fn in loaders:
        df, ct, pk = fn(str(csv_dir))
        dfs.append(df)
        col_types.append(ct)
        pks.append(pk)
    schema = DBSchema(dfs, col_types, names, pks, chunk_size=64)
    sampler = MultiJoinSampler(schema.dfs, schema.stats, seed=7)
    for k in range(1, max_tables + 1):
        sampler.sample_batch_query(str(query_dir), k, per_arity,
                                   data_centric=True)
    return schema


def test_imdb_simple_pipeline_end_to_end(tmp_path):
    csv_dir = tmp_path / "csv"
    q_dir = tmp_path / "queries"
    csv_dir.mkdir()
    q_dir.mkdir()
    _make_imdb_csvs(csv_dir)
    _sample_workload(csv_dir, q_dir)

    # workload loads stats from the RAW CSVs (the deployment path)
    x, y, infos, enc = load_multi_join_workload(
        str(q_dir), schema_name="imdb_simple", data_path=str(csv_dir))
    assert x.shape[0] == 180
    assert {i.num_table for i in infos} == {1, 2, 3}
    assert np.all(np.isfinite(x)) and np.all(np.isfinite(y))

    (x_tr, y_tr, _i, x_te, y_te, _it, *_r) = train_test_val_split(
        x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos)
    post = fit_gp(reference_kernel(), jnp.asarray(x_tr), jnp.asarray(y_tr))
    mean, std = post.predict_mean_std(jnp.asarray(x_te))
    assert np.all(np.isfinite(np.asarray(mean)))
    assert np.all(np.asarray(std) >= 0)
    # better than predicting the train-mean cardinality everywhere
    errors = np.asarray(mean).ravel() - np.asarray(y_te).ravel()
    const = float(np.mean(np.asarray(y_tr))) - np.asarray(y_te).ravel()
    assert np.mean(errors ** 2) < np.mean(const ** 2)


def test_imdb_simple_serving_estimator(tmp_path):
    """Serving tier over the same CSVs: stats built from data_path, query
    lines predicted card-less, checkpoint round-trip."""
    from nngp_tpu.serve import Estimator

    csv_dir = tmp_path / "csv"
    q_dir = tmp_path / "queries"
    csv_dir.mkdir()
    q_dir.mkdir()
    _make_imdb_csvs(csv_dir)
    _sample_workload(csv_dir, q_dir, per_arity=40, max_tables=2)

    est = Estimator("imdb_simple", str(csv_dir), str(q_dir),
                    dtype=np.float64, verbose=False)
    # serve the sampled arity-2 queries card-less
    with open(q_dir / "join_query_2.txt") as f:
        lines = ["@".join(ln.rsplit("@")[:-1])
                 for ln in f.read().splitlines() if ln][:10]
    mean, std = est.predict(lines)
    assert mean.shape == (len(lines),) and np.all(np.isfinite(mean))
    assert np.all(std >= 0)

    ckpt = tmp_path / "ckpt"
    est.save(str(ckpt))
    est2 = Estimator.restore(str(ckpt))
    m2, s2 = est2.predict(lines)
    np.testing.assert_allclose(m2, mean, rtol=1e-10)
