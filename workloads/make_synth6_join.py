"""Generate the committed 6-table Zipf-skewed multi-join workload
(`workloads/synth6_join_data` + `workloads/synth6_stats`).

A TPC-style snowflake — lineitem / orders / customer / part / supplier /
nation with PK->FK chains up to 4 hops — whose foreign keys and categorical
columns are Zipf-distributed, so join cardinalities span many orders of
magnitude (the regime the reference's IMDB deployment serves,
`/root/reference/neuroestimator/estimator/util.py:159-195`). 18,000 labeled
queries (3,000 per join arity 1..6) give a 10.8k-query training split —
large enough that the join-workload GP fit is MXU-bound, matching the
forest headline workload's scale. Ground truth comes from the framework's
own merge-based COUNT(*) engine (`nngp_tpu.data.sampler.MultiJoinSampler`).
Deterministic: rerunning reproduces the files bit-for-bit.

    python workloads/make_synth6_join.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from nngp_tpu.data.sampler import MultiJoinSampler
from nngp_tpu.featurize.stats import TableStats

NUM = "numerical"
CAT = "categorical"


def _zipf(rng, a, size, high):
    """Zipf(a) clipped to [0, high): heavy head, long tail."""
    v = rng.zipf(a, size)
    return np.minimum(v - 1, high - 1)


def build_tables(seed=29):
    """Snowflake join graph (edges = shared column names); every edge is
    FK -> PK, so merge-based COUNT(*) intermediates stay linear in the fact
    table even for the full 6-way join (a non-FK pair like
    customer x supplier on a shared nation key materializes multi-million
    row intermediates under Zipf skew — measured 1.7 s/query):
      nation.n_key    -- customer.n_key
      customer.c_key  -- orders.c_key
      orders.o_key    -- lineitem.o_key
      part.p_key      -- lineitem.p_key
      supplier.s_key  -- lineitem.s_key
    """
    rng = np.random.default_rng(seed)
    n_nation, n_cust, n_ord, n_line, n_part, n_supp = (
        25, 10000, 40000, 120000, 8000, 2000)

    nation = pd.DataFrame({
        "n_key": np.arange(n_nation),
        "n_region": rng.integers(0, 5, n_nation),
        "n_gdp": np.round(rng.lognormal(8, 1.5, n_nation), 2),
    })
    customer = pd.DataFrame({
        "c_key": np.arange(n_cust),
        "n_key": _zipf(rng, 1.6, n_cust, n_nation),     # skewed nation mix
        "c_age": rng.integers(18, 95, n_cust),
        "c_segment": _zipf(rng, 1.9, n_cust, 20),
        "c_balance": np.round(rng.normal(5000, 3000, n_cust), 2),
    })
    orders = pd.DataFrame({
        "o_key": np.arange(n_ord),
        "c_key": _zipf(rng, 1.3, n_ord, n_cust),        # few hot customers
        "o_date": rng.integers(0, 2556, n_ord),         # day index, 7 years
        "o_status": _zipf(rng, 2.2, n_ord, 8),
        "o_total": np.round(rng.lognormal(6, 1.2, n_ord), 2),
    })
    part = pd.DataFrame({
        "p_key": np.arange(n_part),
        "p_cat": _zipf(rng, 1.7, n_part, 25),
        "p_size": rng.integers(1, 51, n_part),
        "p_retail": np.round(rng.lognormal(4, 0.8, n_part), 2),
    })
    supplier = pd.DataFrame({
        "s_key": np.arange(n_supp),
        "s_region": _zipf(rng, 1.5, n_supp, 5),
        "s_rating": np.round(rng.uniform(0, 5, n_supp), 2),
    })
    lineitem = pd.DataFrame({
        "o_key": _zipf(rng, 1.2, n_line, n_ord),        # hot orders
        "p_key": _zipf(rng, 1.4, n_line, n_part),       # hot parts
        "s_key": _zipf(rng, 1.5, n_line, n_supp),
        "l_qty": rng.integers(1, 51, n_line),
        "l_price": np.round(rng.lognormal(4.5, 1.0, n_line), 2),
        "l_ship_mode": _zipf(rng, 2.0, n_line, 7),
    })

    names = ["lineitem", "orders", "customer", "part", "supplier", "nation"]
    dfs = [lineitem, orders, customer, part, supplier, nation]
    col_types = [
        [NUM, NUM, NUM, NUM, NUM, CAT],        # lineitem
        [NUM, NUM, NUM, CAT, NUM],             # orders
        [NUM, NUM, NUM, CAT, NUM],             # customer
        [NUM, CAT, NUM, NUM],                  # part
        [NUM, CAT, NUM],                       # supplier
        [NUM, CAT, NUM],                       # nation
    ]
    return dfs, col_types, names


def main(per_arity=3000, out_name="synth6_join_data",
         stats_name="synth6_stats"):
    """Defaults reproduce the committed 18k workload bit-for-bit; a larger
    --per_arity (same per-arity RNG streams) EXTENDS it, e.g. 25000/arity
    = 150k labeled queries for the beyond-one-chip Nystrom-tier runs."""
    here = os.path.dirname(os.path.abspath(__file__))
    out_dir = os.path.join(here, out_name)
    stats_dir = os.path.join(here, stats_name)
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(stats_dir, exist_ok=True)
    dfs, col_types, names = build_tables()
    stats = [TableStats.from_dataframe(df, ct, nm, chunk_size=64)
             for df, ct, nm in zip(dfs, col_types, names)]
    for i, st in enumerate(stats):
        st.save(os.path.join(stats_dir, f"{i}_{st.table_name}.json"))
    sampler = MultiJoinSampler(dfs, stats, seed=31)
    for k in range(1, 7):
        path = os.path.join(out_dir, f"join_query_{k}.txt")
        if os.path.exists(path):
            os.remove(path)
    # one OS process per arity, exactly the reference's offline fan-out
    # (`/root/reference/JoinQuerySampler.py:596-602`); deterministic since
    # each arity owns its forked RNG stream and its own output file
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
    ap.add_argument("--out_name", type=str, default="synth6_join_data")
    ap.add_argument("--stats_name", type=str, default="synth6_stats")
    a = ap.parse_args()
    main(a.per_arity, a.out_name, a.stats_name)
