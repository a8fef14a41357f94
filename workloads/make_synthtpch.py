"""Generate the committed TPC-H-shaped multi-join workload
(`workloads/synthtpch_data` + `workloads/synthtpch_stats`).

The reference ships TPC-H loaders (`/root/reference/datasets.py:10-47`:
lineitem / part / orders / supplier with fixed numerical column subsets)
but no CSVs. This generator produces the SAME schema those loaders read —
semicolon CSVs with the exact column layouts of
`nngp_tpu/data/loaders.py:71-90` — and drives the full deployment path:

    raw CSVs -> SCHEMAS["tpch"] loaders -> DBSchema PK recoding ->
    MultiJoinSampler ground truth -> labeled query files + stats JSONs.

Shape coverage: this is the third join-graph family in the committed
workloads — synth6 is a categorical-heavy FK->PK snowflake, synthimdb a
movie_id CLIQUE; TPC-H here is a STAR through the `lineitem` fact table
(order_key -> orders, part_key -> part, supp_key -> supplier) with
ALL-NUMERICAL predicates (no packed categorical chunks at all, so the
raw reference encoding is already fp32-friendly) and TPC-H-like
correlations: 1-7 lines per order, Zipf part popularity,
extended_price = quantity x part retail price, total_price = the sum of
an order's line prices (a cross-table correlation predicates can cut).

Keys are dense 0..n-1 so DBSchema's PK codes equal the raw FK values
(the reference recodes only PK columns, `/root/reference/schemas.py:57-67`
— same note as make_synthimdb.py).

Deterministic: rerunning reproduces the committed files bit-for-bit.

    python workloads/make_synthtpch.py            # full 12k workload
    python workloads/make_synthtpch.py --scale 0.05 --per_arity 40  # smoke
"""

import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nngp_tpu.data.loaders import SCHEMAS
from nngp_tpu.data.sampler import MultiJoinSampler
from nngp_tpu.featurize.schema import DBSchema


def build_tables(seed=59, scale=1.0):
    rng = np.random.default_rng(seed)
    n_orders = max(int(20000 * scale), 40)
    n_parts = max(int(5000 * scale), 20)
    n_supps = max(int(500 * scale), 10)

    part = {
        "part_key": np.arange(n_parts),
        "size": np.minimum(rng.zipf(1.6, n_parts), 50),
        "retail_price": np.round(
            900 + 100 * np.minimum(rng.zipf(1.4, n_parts), 200)
            + rng.integers(0, 100, n_parts), 2),
    }

    supplier = {
        "supp_key": np.arange(n_supps),
        "nationkey": rng.integers(0, 25, n_supps),
        "acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supps), 2),
    }

    # 1-7 lines per order (the TPC-H lineitem multiplicity), Zipf-skewed
    lines_per_order = np.minimum(rng.zipf(1.5, n_orders), 7)
    order_key_col = np.repeat(np.arange(n_orders), lines_per_order)
    n_lines = order_key_col.shape[0]
    line_number = np.concatenate(
        [np.arange(1, k + 1) for k in lines_per_order])
    part_key_col = np.minimum(rng.zipf(1.25, n_lines), n_parts) - 1
    supp_key_col = np.minimum(rng.zipf(1.35, n_lines), n_supps) - 1
    quantity = 1 + np.minimum(rng.zipf(1.5, n_lines) - 1, 49)
    # price correlates with the joined part's retail price and quantity
    extended_price = np.round(
        quantity * part["retail_price"][part_key_col]
        * rng.uniform(0.9, 1.1, n_lines), 2)
    discount = np.round(rng.integers(0, 11, n_lines) / 100.0, 2)
    tax = np.round(rng.integers(0, 9, n_lines) / 100.0, 2)

    lineitem = {
        "order_key": order_key_col,
        "part_key": part_key_col,
        "supp_key": supp_key_col,
        "line_number": line_number,
        "quantity": quantity,
        "extended_price": extended_price,
        "discount": discount,
        "tax": tax,
    }

    # orders.total_price = sum of its lines' discounted prices — the
    # cross-table correlation TPC-H queries cut on
    total_price = np.zeros(n_orders)
    np.add.at(total_price, order_key_col, extended_price * (1 - discount))
    orders = {
        "order_key": np.arange(n_orders),
        "order_status": np.minimum(rng.zipf(2.2, n_orders), 3) - 1,
        "total_price": np.round(total_price, 2),
        "ship_priority": (rng.random(n_orders) < 0.2).astype(int),
    }

    return {
        "lineitem.csv": lineitem,
        "part.csv": part,
        "orders.csv": orders,
        "supplier.csv": supplier,
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


def main(per_arity=3000, scale=1.0, out_name="synthtpch_data",
         stats_name="synthtpch_stats", csv_name="synthtpch_csv"):
    here = os.path.dirname(os.path.abspath(__file__))
    csv_dir = os.path.join(here, csv_name)
    out_dir = os.path.join(here, out_name)
    stats_dir = os.path.join(here, stats_name)
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(stats_dir, exist_ok=True)

    write_csvs(build_tables(scale=scale), csv_dir)

    # the deployment loader path, exactly as load_multi_join_workload
    # resolves schema_name="tpch" + data_path
    loaders, names = SCHEMAS["tpch"]
    dfs, col_types_list, pks = [], [], []
    for fn in loaders:
        df, col_types, pk = fn(csv_dir)
        dfs.append(df)
        col_types_list.append(col_types)
        pks.append(pk)
    schema = DBSchema(dfs, col_types_list, names, pks, chunk_size=64)
    for i, st in enumerate(schema.stats):
        st.save(os.path.join(stats_dir, f"{i}_{st.table_name}.json"))

    sampler = MultiJoinSampler(schema.dfs, schema.stats, seed=61)
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
    ap.add_argument("--per_arity", type=int, default=3000)
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--out_name", type=str, default="synthtpch_data")
    ap.add_argument("--stats_name", type=str, default="synthtpch_stats")
    ap.add_argument("--csv_name", type=str, default="synthtpch_csv")
    a = ap.parse_args()
    main(a.per_arity, a.scale, a.out_name, a.stats_name, a.csv_name)
