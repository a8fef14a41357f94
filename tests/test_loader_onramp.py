"""Real-data on-ramp: every L0 loader driven end-to-end on tiny synthetic
CSVs — raw files -> SCHEMAS loaders -> DBSchema PK/FK recoding ->
MultiJoinSampler ground truth -> encoder -> finite feature matrices.

The real IMDB/TPC/Yelp dumps are not in this image (the reference doesn't
ship them either), so this pins the pipeline known-good for the day real
CSVs appear: if a loader's column layout, a schema's PK/FK wiring, or the
encoder's layout drifts, these fail. Together with tests/test_imdb_pipeline
(imdb_simple through fit + serving) this covers all 24 loaders in
`nngp_tpu/data/loaders.py` THROUGH ENCODE, not just parse.
"""

import csv

import numpy as np
import pytest

from nngp_tpu.data.loaders import LOADERS, SCHEMAS
from nngp_tpu.data.sampler import MultiJoinSampler, SingleTableSampler
from nngp_tpu.data.workload import (
    load_multi_join_workload,
    load_single_table_workload,
)
from nngp_tpu.featurize.schema import DBSchema
from nngp_tpu.featurize.stats import TableStats


def _write(path, header, rows):
    with open(path, "w", newline="") as f:
        w = csv.writer(f, delimiter=";")
        if header:
            w.writerow(header)
        w.writerows(rows)


def _make_schema_csvs(schema_name, d, n=40, seed=0):
    """Write one tiny CSV per loader of the schema, with every join-key
    column drawn from a SHARED dense 0..n-1 space so PK->FK recoding and
    merge-based COUNT(*) are exercised on real matches."""
    rng = np.random.default_rng(seed)
    loaders, names = SCHEMAS[schema_name]

    def pk(n_rows):
        return np.arange(n_rows)

    def fk(n_rows, space=n):
        return rng.integers(0, space, n_rows)

    def other(n_rows, lo=1, hi=50):
        return rng.integers(lo, hi, n_rows)

    if schema_name == "tpch":
        _write(d / "lineitem.csv",
               ["order_key", "part_key", "supp_key", "line_number",
                "quantity", "extended_price", "discount", "tax"],
               np.column_stack([fk(3 * n), fk(3 * n), fk(3 * n)]
                               + [other(3 * n) for _ in range(5)]))
        _write(d / "part.csv", ["part_key", "size", "retail_price"],
               np.column_stack([pk(n), other(n), other(n)]))
        _write(d / "orders.csv",
               ["order_key", "order_status", "total_price", "ship_priority"],
               np.column_stack([pk(n), other(n), other(n), other(n)]))
        _write(d / "supplier.csv", ["supp_key", "nationkey", "acctbal"],
               np.column_stack([pk(n), other(n), other(n)]))
    elif schema_name == "tpcds":
        _write(d / "store_sales.csv",
               ["item_sk", "customer_sk", "store_sk", "promo_sk", "quantity",
                "wholesale_cost", "list_price", "sales_price",
                "ext_discount_amt", "ext_sales_price", "ext_wholesale_cost",
                "ext_list_price", "ext_tax", "ext_coupon_amt", "net_paid",
                "net_paid_inc_tax", "net_profit"],
               np.column_stack([fk(3 * n), fk(3 * n), fk(3 * n), fk(3 * n)]
                               + [other(3 * n) for _ in range(13)]))
        _write(d / "store.csv",
               ["store_sk", "number_employees", "floor_space", "market_id",
                "devision_id", "company_id", "tax_percentage"],
               np.column_stack([pk(n)] + [other(n) for _ in range(6)]))
        _write(d / "item.csv",
               ["item_sk", "current_price", "wholesale_cost", "brand_id",
                "class_id", "category_id", "manufact_id"],
               np.column_stack([pk(n)] + [other(n) for _ in range(6)]))
        _write(d / "customer.csv",
               ["customer_sk", "birth_day", "birth_month", "birth_year"],
               np.column_stack([pk(n)] + [other(n) for _ in range(3)]))
        _write(d / "promotion.csv",
               ["promo_sk", "item_sk", "cost", "response_target"],
               np.column_stack([pk(n), fk(n), other(n), other(n)]))
    elif schema_name == "yelp":
        _write(d / "business.csv",
               ["business_id", "latitude", "longitude", "business_stars",
                "business_review_count"],
               np.column_stack([pk(n)] + [other(n) for _ in range(4)]))
        _write(d / "review.csv",
               ["review_id", "user_id", "business_id", "review_stars",
                "review_useful", "review_funny", "review_cool"],
               np.column_stack([pk(3 * n), fk(3 * n), fk(3 * n)]
                               + [other(3 * n) for _ in range(4)]))
        _write(d / "user.csv",
               ["user_id", "user_review_count", "user_useful", "user_funny",
                "user_cool", "fans", "average_stars", "compliment_hot",
                "compliment_more", "compliment_profile", "compliment_cute",
                "compliment_list", "compliment_note", "compliment_plain",
                "compliment_cool", "compliment_funny", "compliment_writer",
                "compliment_photos"],
               np.column_stack([pk(n)] + [other(n) for _ in range(17)]))
    elif schema_name == "imdb":
        # full imdb: 3-column movie_info_idx via load_imdb_movie_info_idx
        _write(d / "title.csv",
               ["movie_id", "kind_id", "product_year", "imdb_id"],
               np.column_stack([pk(n), other(n), other(n), other(n)]))
        _write(d / "cast_info.csv",
               ["person_id", "movie_id", "person_role_id"],
               np.column_stack([other(3 * n), fk(3 * n), other(3 * n)]))
        _write(d / "movie_info.csv",
               ["movie_info_id", "movie_id", "info_type_id"],
               np.column_stack([pk(2 * n), fk(2 * n), other(2 * n)]))
        _write(d / "movie_companies.csv",
               ["movie_id", "company_id", "company_type_id"],
               np.column_stack([fk(2 * n), other(2 * n), other(2 * n)]))
        _write(d / "movie_info_idx.csv",
               ["movie_info_idx_id", "movie_id", "info_type_id"],
               np.column_stack([pk(2 * n), fk(2 * n), other(2 * n)]))
        _write(d / "movie_keyword.csv", ["movie_id", "keyword_id"],
               np.column_stack([fk(2 * n), other(2 * n)]))
    else:
        raise AssertionError(schema_name)


@pytest.mark.parametrize("schema_name", ["tpch", "tpcds", "yelp", "imdb"])
def test_schema_onramp_through_encode(tmp_path, schema_name):
    csv_dir = tmp_path / "csv"
    q_dir = tmp_path / "queries"
    csv_dir.mkdir()
    q_dir.mkdir()
    _make_schema_csvs(schema_name, csv_dir)

    loaders, names = SCHEMAS[schema_name]
    dfs, col_types, pks = [], [], []
    for fn in loaders:
        df, ct, pk = fn(str(csv_dir))
        assert len(df.columns) == len(ct), fn.__name__
        dfs.append(df)
        col_types.append(ct)
        pks.append(pk)
    schema = DBSchema(dfs, col_types, names, pks, chunk_size=16)
    sampler = MultiJoinSampler(schema.dfs, schema.stats, seed=3)
    for k in (1, 2):
        sampler.sample_batch_query(str(q_dir), k, 10, data_centric=True)

    x, y, infos, enc = load_multi_join_workload(
        str(q_dir), schema_name=schema_name, data_path=str(csv_dir),
        chunk_size=16)
    assert x.shape[0] == 20
    assert x.shape[1] > 0
    assert np.all(np.isfinite(x)) and np.all(np.isfinite(y))
    assert {i.num_table for i in infos} == {1, 2}


def _make_single_table_csv(relation, d, n=50, seed=1):
    rng = np.random.default_rng(seed)
    if relation == "higgs":
        # loader reads columns 22..28 of a headerless CSV
        rows = rng.uniform(0, 5, (n, 29)).round(3)
        with open(d / "HIGGS.csv", "w", newline="") as f:
            csv.writer(f).writerows(rows)
    elif relation == "sales":
        with open(d / "train.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow([f"h{i}" for i in range(6)])
            w.writerows(np.column_stack([
                rng.integers(0, 9, n), rng.integers(0, 9, n),
                rng.integers(0, 5, n), rng.integers(0, 40, n),
                rng.integers(0, 200, n), rng.integers(0, 2, n)]))
    elif relation == "yelp-review":
        _write(d / "review_tmp.csv",
               ["review_id", "user_id", "business_id", "stars", "useful",
                "funny", "cool"],
               np.column_stack([np.arange(n), rng.integers(0, 10, n),
                                rng.integers(0, 10, n)]
                               + [rng.integers(0, 6, n) for _ in range(4)]))
    elif relation == "yelp-user":
        _write(d / "user_tmp.csv",
               ["user_id"] + [f"c{i}" for i in range(17)],
               np.column_stack([np.arange(n)]
                               + [rng.integers(0, 40, n)
                                  for _ in range(17)]))
    else:
        raise AssertionError(relation)


@pytest.mark.parametrize("relation", ["higgs", "sales", "yelp-review",
                                      "yelp-user"])
def test_single_table_onramp_through_encode(tmp_path, relation):
    """The remaining LOADERS entries (forest is covered by the committed
    real fixtures everywhere): CSV -> loader -> TableStats ->
    SingleTableSampler ground truth -> encoder, finite end to end."""
    csv_dir = tmp_path / "csv"
    q_dir = tmp_path / "queries"
    csv_dir.mkdir()
    q_dir.mkdir()
    _make_single_table_csv(relation, csv_dir)

    df, col_types = LOADERS[relation](str(csv_dir))
    stats = TableStats.from_dataframe(df, col_types, relation, chunk_size=16)
    sampler = SingleTableSampler(df, stats, seed=2)
    sampler.sample_batch_query(2, 8, cat_size=3, save_path=str(q_dir),
                               data_centric=True)

    x, y, infos, enc = load_single_table_workload(
        str(q_dir), relation=relation, name=relation,
        data_path=str(csv_dir), chunk_size=16)
    assert x.shape[0] == 8
    assert np.all(np.isfinite(x)) and np.all(np.isfinite(y))
    assert all(i.num_predicates == 2 for i in infos)


def test_synthtpch_generator_roundtrip(tmp_path, monkeypatch):
    """Round-5 workload generators stay runnable end to end: tiny-scale
    synthtpch generation (CSVs -> SCHEMAS['tpch'] loaders -> DBSchema ->
    sampler ground truth -> labeled files), then the labeled output loads
    and encodes through load_multi_join_workload."""
    import sys
    sys.path.insert(0, "workloads")
    import make_synthtpch
    out = tmp_path / "d"
    stats = tmp_path / "s"
    csvs = tmp_path / "c"
    # generator writes relative to workloads/: point it at tmp via args
    make_synthtpch.main(per_arity=6, scale=0.03, out_name=str(out),
                        stats_name=str(stats), csv_name=str(csvs))
    import numpy as np
    from nngp_tpu.featurize.stats import load_stats_dir
    from nngp_tpu.data.workload import load_multi_join_workload
    stats_list = load_stats_dir(str(stats))
    x, y, infos, _ = load_multi_join_workload(
        str(out), stats_list=stats_list, dtype=np.float64)
    assert x.shape[0] == 24 and x.shape[1] == 45
    assert np.all(np.isfinite(x)) and np.all(y >= 0)
