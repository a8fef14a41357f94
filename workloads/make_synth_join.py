"""Generate the committed synthetic 3-table multi-join workload
(`workloads/synth_join_data` + `workloads/synth_stats`).

A small star schema — fact(fk_d1, fk_d2, m1, m2) with two dimension tables —
sampled and labeled with the framework's own ground-truth engine
(nngp_tpu.data.sampler.MultiJoinSampler). Deterministic: rerunning this
script reproduces the files bit-for-bit.

    python workloads/make_synth_join.py
"""

import os

import numpy as np
import pandas as pd

from nngp_tpu.data.sampler import MultiJoinSampler
from nngp_tpu.featurize.stats import TableStats


def build_tables(seed=7):
    rng = np.random.default_rng(seed)
    n_d1, n_d2, n_fact = 400, 300, 20000
    d1 = pd.DataFrame({
        "d1_key": np.arange(n_d1),
        "d1_a": rng.integers(0, 1000, n_d1),
        "d1_b": np.round(rng.uniform(-50, 50, n_d1), 3),
    })
    d2 = pd.DataFrame({
        "d2_key": np.arange(n_d2),
        "d2_a": rng.integers(0, 200, n_d2),
    })
    fact = pd.DataFrame({
        "d1_key": rng.integers(0, n_d1, n_fact),
        "d2_key": rng.integers(0, n_d2, n_fact),
        "m1": np.round(rng.exponential(100, n_fact), 2),
        "m2": rng.integers(0, 10000, n_fact),
    })
    names = ["fact", "dim1", "dim2"]
    dfs = [fact, d1, d2]
    col_types = [["numerical"] * 4, ["numerical"] * 3, ["numerical"] * 2]
    return dfs, col_types, names


def main():
    out_dir = os.path.join(os.path.dirname(__file__), "synth_join_data")
    stats_dir = os.path.join(os.path.dirname(__file__), "synth_stats")
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(stats_dir, exist_ok=True)
    dfs, col_types, names = build_tables()
    stats = [TableStats.from_dataframe(df, ct, nm, chunk_size=64)
             for df, ct, nm in zip(dfs, col_types, names)]
    for i, st in enumerate(stats):
        st.save(os.path.join(stats_dir, f"{i}_{st.table_name}.json"))
    sampler = MultiJoinSampler(dfs, stats, seed=11)
    for k in (1, 2, 3):
        path = os.path.join(out_dir, f"join_query_{k}.txt")
        if os.path.exists(path):
            os.remove(path)
        lines = sampler.sample_batch_query(out_dir, num_tables=k,
                                           mini_batch=800, data_centric=True)
        print(f"num_tables={k}: {len(lines)} queries")


if __name__ == "__main__":
    main()
