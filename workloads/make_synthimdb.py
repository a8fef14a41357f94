"""Generate the committed IMDB-shaped multi-join workload
(`workloads/synthimdb_data` + `workloads/synthimdb_stats`).

The reference's deployment story is IMDB/JOB-style multi-join serving
(`/root/reference/neuroestimator/estimator/util.py:159-195`), but the real
IMDB dump is not shippable. This generator produces the SAME schema the
reference's `imdb` loaders read — title / cast_info / movie_info /
movie_companies / movie_info_idx / movie_keyword, semicolon CSVs with the
exact column layouts of `nngp_tpu/data/loaders.py` — with Zipf-skewed
per-movie fanouts, then drives the full deployment path:

    raw CSVs -> SCHEMAS["imdb"] loaders -> DBSchema PK recoding ->
    MultiJoinSampler ground truth -> labeled query files + stats JSONs.

Unlike synth6's pure FK->PK snowflake, every fact table here joins through
the shared `movie_id` (a join-graph CLIQUE, like JOB), so sampled spanning
trees routinely contain FK<->FK edges whose materialized join explodes
under skew — ground truth relies on the message-passing
`tree_join_count` (O(n log n), `nngp_tpu/data/sampler.py`).

movie_id is dense 0..n-1: DBSchema recodes PK columns in the frames but
(like the reference, `/root/reference/schemas.py:57-67`) leaves FK columns
raw, so sampler ground truth needs PK codes == raw ids.

Deterministic: rerunning reproduces the committed files bit-for-bit.

    python workloads/make_synthimdb.py            # full 18k workload
    python workloads/make_synthimdb.py --scale 0.05 --per_arity 40  # smoke
"""

import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nngp_tpu.data.loaders import SCHEMAS
from nngp_tpu.data.sampler import MultiJoinSampler
from nngp_tpu.featurize.schema import DBSchema


def _fanout(rng, a, cap, n):
    """Per-movie multiplicity: Zipf(a)-1 capped — zero rows for a large
    fraction of movies (not every movie has cast/keywords), a heavy head
    for the popular ones."""
    return np.minimum(rng.zipf(a, n) - 1, cap)


def _repeat_ids(rng, a, cap, n_movies):
    """movie_id column of a fact table: each movie repeated by its fanout."""
    return np.repeat(np.arange(n_movies), _fanout(rng, a, cap, n_movies))


def build_tables(seed=47, scale=1.0):
    rng = np.random.default_rng(seed)
    nm = max(int(20000 * scale), 50)

    title = {
        "movie_id": np.arange(nm),
        "kind_id": np.minimum(rng.zipf(1.8, nm), 7),
        "product_year": 2025 - np.minimum(rng.zipf(1.3, nm) - 1, 135),
        "imdb_id": rng.permutation(nm) * 7 + 13,
    }

    ci_mid = _repeat_ids(rng, 1.8, 200, nm)
    cast_info = {
        "person_id": np.minimum(rng.zipf(1.4, len(ci_mid)), 200000),
        "movie_id": ci_mid,
        "person_role_id": np.minimum(rng.zipf(2.0, len(ci_mid)), 11),
    }

    mi_mid = _repeat_ids(rng, 1.9, 100, nm)
    movie_info = {
        "movie_info_id": np.arange(len(mi_mid)),
        "movie_id": mi_mid,
        "info_type_id": np.minimum(rng.zipf(1.6, len(mi_mid)), 110),
    }

    mc_mid = _repeat_ids(rng, 2.0, 50, nm)
    movie_companies = {
        "movie_id": mc_mid,
        "company_id": np.minimum(rng.zipf(1.3, len(mc_mid)), 30000),
        "company_type_id": 1 + (rng.random(len(mc_mid)) < 0.35).astype(int),
    }

    mii_mid = _repeat_ids(rng, 2.0, 30, nm)
    movie_info_idx = {
        "movie_info_idx_id": np.arange(len(mii_mid)),
        "movie_id": mii_mid,
        "info_type_id": 99 + np.minimum(rng.zipf(1.8, len(mii_mid)), 14),
    }

    mk_mid = _repeat_ids(rng, 1.8, 150, nm)
    movie_keyword = {
        "movie_id": mk_mid,
        "keyword_id": np.minimum(rng.zipf(1.2, len(mk_mid)), 120000),
    }

    return {
        "title.csv": title,
        "cast_info.csv": cast_info,
        "movie_info.csv": movie_info,
        "movie_companies.csv": movie_companies,
        "movie_info_idx.csv": movie_info_idx,
        "movie_keyword.csv": movie_keyword,
    }


def write_csvs(tables, csv_dir):
    os.makedirs(csv_dir, exist_ok=True)
    for fname, cols in tables.items():
        names = list(cols)
        rows = np.column_stack([cols[c] for c in names])
        with open(os.path.join(csv_dir, fname), "w", newline="") as f:
            w = csv.writer(f, delimiter=";")
            w.writerow(names)
            w.writerows(rows.tolist())
        print(f"{fname}: {rows.shape[0]} rows", flush=True)


def main(per_arity=3000, scale=1.0, out_name="synthimdb_data",
         stats_name="synthimdb_stats", csv_name="synthimdb_csv"):
    here = os.path.dirname(os.path.abspath(__file__))
    csv_dir = os.path.join(here, csv_name)
    out_dir = os.path.join(here, out_name)
    stats_dir = os.path.join(here, stats_name)
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(stats_dir, exist_ok=True)

    write_csvs(build_tables(scale=scale), csv_dir)

    # the deployment loader path, exactly as load_multi_join_workload
    # resolves schema_name="imdb" + data_path
    loaders, names = SCHEMAS["imdb"]
    dfs, col_types_list, pks = [], [], []
    for fn in loaders:
        df, col_types, pk = fn(csv_dir)
        dfs.append(df)
        col_types_list.append(col_types)
        pks.append(pk)
    schema = DBSchema(dfs, col_types_list, names, pks, chunk_size=64)
    for i, st in enumerate(schema.stats):
        st.save(os.path.join(stats_dir, f"{i}_{st.table_name}.json"))

    sampler = MultiJoinSampler(schema.dfs, schema.stats, seed=53)
    for k in range(1, 7):
        path = os.path.join(out_dir, f"join_query_{k}.txt")
        if os.path.exists(path):
            os.remove(path)
    procs = sampler.parallel_sampler(per_arity, out_dir, data_centric=True)
    for p in procs:
        p.join()
    for k in range(1, 7):
        path = os.path.join(out_dir, f"join_query_{k}.txt")
        with open(path) as f:
            print(f"num_tables={k}: {sum(1 for _ in f)} queries", flush=True)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--per_arity", type=int, default=3000)
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--out_name", type=str, default="synthimdb_data")
    ap.add_argument("--stats_name", type=str, default="synthimdb_stats")
    ap.add_argument("--csv_name", type=str, default="synthimdb_csv")
    a = ap.parse_args()
    main(a.per_arity, a.scale, a.out_name, a.stats_name, a.csv_name)
