"""Generate the committed TPC-DS-shaped multi-join workload
(`workloads/synthtpcds_data` + `workloads/synthtpcds_stats`).

The reference ships TPC-DS loaders (`/root/reference/datasets.py:52-98`:
store_sales / store / item / customer / promotion with fixed numerical
column subsets) but no CSVs. This generator produces the SAME schema
those loaders read — semicolon CSVs with the exact column layouts of
`nngp_tpu/data/loaders.py:92-122` — and drives the full deployment path
(CSVs -> SCHEMAS["tpcds"] loaders -> DBSchema -> MultiJoinSampler ground
truth -> labeled query files + stats JSONs).

Shape coverage: the fourth committed join-graph family. Unlike the clean
TPC-H star, the TPC-DS graph contains a TRIANGLE — store_sales joins
item (item_sk), store_sales joins promotion (promo_sk AND the shared
item_sk column), and promotion itself carries item_sk — so sampled
spanning trees routinely route item->promotion->store_sales, exercising
dimension-to-dimension joins and the sampler's cyclic-graph tree
sampling. 5 tables -> query arities 1..5. All columns numerical; the
wide 17-column fact table dominates the encoding width.

Correlations: sales_price <= list_price (discounting), ext_* columns are
quantity x the per-unit ones, net_profit = net_paid - ext_wholesale_cost
(can go negative), and item prices ride through store_sales rows.

Keys are dense 0..n-1 so DBSchema's PK codes equal raw FK values (same
note as make_synthimdb.py / make_synthtpch.py).

Deterministic: rerunning reproduces the committed files bit-for-bit.

    python workloads/make_synthtpcds.py           # full 12k workload
    python workloads/make_synthtpcds.py --scale 0.05 --per_arity 25
"""

import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nngp_tpu.data.loaders import SCHEMAS
from nngp_tpu.data.sampler import MultiJoinSampler
from nngp_tpu.featurize.schema import DBSchema


def build_tables(seed=67, scale=1.0):
    rng = np.random.default_rng(seed)
    n_items = max(int(4000 * scale), 20)
    n_stores = max(int(12 * max(scale, 0.5)), 4)
    n_custs = max(int(15000 * scale), 30)
    n_promos = max(int(300 * scale), 8)
    n_sales = max(int(60000 * scale), 200)

    wholesale = np.round(1 + 99 * rng.random(n_items) ** 2, 2)
    item = {
        "item_sk": np.arange(n_items),
        "current_price": np.round(wholesale * rng.uniform(1.2, 3.0,
                                                          n_items), 2),
        "wholesale_cost": wholesale,
        "brand_id": np.minimum(rng.zipf(1.4, n_items), 400),
        "class_id": np.minimum(rng.zipf(1.6, n_items), 50),
        "category_id": np.minimum(rng.zipf(1.8, n_items), 10),
        "manufact_id": np.minimum(rng.zipf(1.3, n_items), 500),
    }

    store = {
        "store_sk": np.arange(n_stores),
        "number_employees": rng.integers(50, 301, n_stores),
        "floor_space": rng.integers(5000, 10000001, n_stores),
        "market_id": rng.integers(1, 11, n_stores),
        "devision_id": rng.integers(1, 7, n_stores),
        "company_id": rng.integers(1, 3, n_stores),
        "tax_percentage": np.round(rng.integers(0, 12, n_stores) / 100.0, 2),
    }

    customer = {
        "customer_sk": np.arange(n_custs),
        "birth_day": rng.integers(1, 29, n_custs),
        "birth_month": rng.integers(1, 13, n_custs),
        "birth_year": rng.integers(1930, 2008, n_custs),
    }

    promotion = {
        "promo_sk": np.arange(n_promos),
        "item_sk": np.minimum(rng.zipf(1.3, n_promos), n_items) - 1,
        "cost": np.round(1000.0 * np.minimum(rng.zipf(1.5, n_promos), 90),
                         2),
        "response_target": (rng.random(n_promos) < 0.5).astype(int),
    }

    it_sk = np.minimum(rng.zipf(1.2, n_sales), n_items) - 1
    quantity = 1 + np.minimum(rng.zipf(1.4, n_sales) - 1, 99)
    unit_wholesale = wholesale[it_sk]
    unit_list = np.round(unit_wholesale * rng.uniform(1.2, 3.0, n_sales), 2)
    unit_sales = np.round(unit_list * rng.uniform(0.5, 1.0, n_sales), 2)
    ext_discount = np.round(quantity * (unit_list - unit_sales), 2)
    ext_sales = np.round(quantity * unit_sales, 2)
    ext_wholesale = np.round(quantity * unit_wholesale, 2)
    ext_list = np.round(quantity * unit_list, 2)
    tax_rate = store["tax_percentage"]
    st_sk = np.minimum(rng.zipf(1.1, n_sales), n_stores) - 1
    ext_tax = np.round(ext_sales * tax_rate[st_sk], 2)
    coupon = np.round(ext_sales * np.where(rng.random(n_sales) < 0.1,
                                           rng.uniform(0.05, 0.5, n_sales),
                                           0.0), 2)
    net_paid = np.round(ext_sales - coupon, 2)
    store_sales = {
        "item_sk": it_sk,
        "customer_sk": np.minimum(rng.zipf(1.15, n_sales), n_custs) - 1,
        "store_sk": st_sk,
        "promo_sk": np.minimum(rng.zipf(1.5, n_sales), n_promos) - 1,
        "quantity": quantity,
        "wholesale_cost": unit_wholesale,
        "list_price": unit_list,
        "sales_price": unit_sales,
        "ext_discount_amt": ext_discount,
        "ext_sales_price": ext_sales,
        "ext_wholesale_cost": ext_wholesale,
        "ext_list_price": ext_list,
        "ext_tax": ext_tax,
        "ext_coupon_amt": coupon,
        "net_paid": net_paid,
        "net_paid_inc_tax": np.round(net_paid + ext_tax, 2),
        "net_profit": np.round(net_paid - ext_wholesale, 2),
    }

    return {
        "store_sales.csv": store_sales,
        "store.csv": store,
        "item.csv": item,
        "customer.csv": customer,
        "promotion.csv": promotion,
    }


def write_csvs(tables, csv_dir):
    os.makedirs(csv_dir, exist_ok=True)
    for fname, cols in tables.items():
        names = list(cols)
        rows = np.column_stack([np.asarray(cols[c], dtype=object)
                                for c in names])
        with open(os.path.join(csv_dir, fname), "w", newline="") as f:
            w = csv.writer(f, delimiter=";")
            w.writerow(names)
            w.writerows(rows.tolist())
        print(f"{fname}: {rows.shape[0]} rows", flush=True)


def main(per_arity=2400, scale=1.0, out_name="synthtpcds_data",
         stats_name="synthtpcds_stats", csv_name="synthtpcds_csv"):
    here = os.path.dirname(os.path.abspath(__file__))
    csv_dir = os.path.join(here, csv_name)
    out_dir = os.path.join(here, out_name)
    stats_dir = os.path.join(here, stats_name)
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(stats_dir, exist_ok=True)

    write_csvs(build_tables(scale=scale), csv_dir)

    loaders, names = SCHEMAS["tpcds"]
    dfs, col_types_list, pks = [], [], []
    for fn in loaders:
        df, col_types, pk = fn(csv_dir)
        dfs.append(df)
        col_types_list.append(col_types)
        pks.append(pk)
    schema = DBSchema(dfs, col_types_list, names, pks, chunk_size=64)
    for i, st in enumerate(schema.stats):
        st.save(os.path.join(stats_dir, f"{i}_{st.table_name}.json"))

    sampler = MultiJoinSampler(schema.dfs, schema.stats, seed=71)
    for k in range(1, len(names) + 1):
        path = os.path.join(out_dir, f"join_query_{k}.txt")
        if os.path.exists(path):
            os.remove(path)
    procs = sampler.parallel_sampler(per_arity, out_dir, data_centric=True)
    for p in procs:
        p.join()
    for k in range(1, len(names) + 1):
        path = os.path.join(out_dir, f"join_query_{k}.txt")
        with open(path) as f:
            print(f"num_tables={k}: {sum(1 for _ in f)} queries",
                  flush=True)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--per_arity", type=int, default=2400)
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--out_name", type=str, default="synthtpcds_data")
    ap.add_argument("--stats_name", type=str, default="synthtpcds_stats")
    ap.add_argument("--csv_name", type=str, default="synthtpcds_csv")
    a = ap.parse_args()
    main(a.per_arity, a.scale, a.out_name, a.stats_name, a.csv_name)
