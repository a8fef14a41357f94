"""Ground-truth labeling throughput: message-passing tree counter vs the
materializing merge path, on the committed synthimdb workload (6-table
movie_id clique, Zipf fanouts — the IMDB-style regime the merge/sqldf
approach cannot label).

For each committed query the merge path's intermediate sizes are first
bounded with prefix tree-counts (the cardinality after each successive
merge IS the prefix join's count); merges whose any-prefix exceeds CAP
rows are skipped as infeasible rather than OOMing the box.

Run after regenerating the CSVs (workloads/make_synthimdb.py):
  PYTHONPATH=/root/repo nohup python experiments/label_throughput.py \
    > experiments/label_throughput.log 2>&1 &
"""
import time

import numpy as np
import pandas as pd

from nngp_tpu.data.loaders import SCHEMAS
from nngp_tpu.data.sampler import _mask_for_predicates, tree_join_count
from nngp_tpu.featurize.join import MultiJoinEncoder
from nngp_tpu.featurize.schema import DBSchema

CAP = 5_000_000  # rows a merge intermediate may reach before we call it off
PER_ARITY = 150


def merge_count(filtered, join_infos):
    """The replaced path: successive inner merges (renamed frames), as in
    MultiJoinSampler.query_true_card's fallback."""
    fr = {t: df.rename(columns={c: f"{t}.{c}" for c in df.columns})
          for t, df in filtered.items()}
    acc, included = None, set()
    remaining = list(join_infos)
    while remaining:
        for ji in list(remaining):
            t1, t2, col = ji.t1_id, ji.t2_id, ji.col_name
            if acc is None:
                acc = fr[t1].merge(fr[t2], left_on=f"{t1}.{col}",
                                   right_on=f"{t2}.{col}", how="inner")
                included |= {t1, t2}
            elif t1 in included or t2 in included:
                new = t2 if t1 in included else t1
                old = t1 if t1 in included else t2
                acc = acc.merge(fr[new], left_on=f"{old}.{col}",
                                right_on=f"{new}.{col}", how="inner")
                included.add(new)
            else:
                continue
            remaining.remove(ji)
    return len(acc.index)


def prefix_feasible(filtered, join_infos):
    """Max intermediate rows the merge path would materialize = the max
    over prefix-join cardinalities (computed by tree counting, cheap)."""
    worst = 0
    for k in range(1, len(join_infos) + 1):
        prefix = join_infos[:k]
        tabs = {ji.t1_id for ji in prefix} | {ji.t2_id for ji in prefix}
        c = tree_join_count({t: filtered[t] for t in tabs}, prefix)
        if c is None:
            return False, worst
        worst = max(worst, c)
        if worst > CAP:
            return False, worst
    return True, worst


def main():
    loaders, names = SCHEMAS["imdb"]
    dfs, cts, pks = [], [], []
    for fn in loaders:
        df, ct, pk = fn("workloads/synthimdb_csv")
        dfs.append(df)
        cts.append(ct)
        pks.append(pk)
    schema = DBSchema(dfs, cts, names, pks, chunk_size=64)
    enc = MultiJoinEncoder(schema.stats)
    dfs = [df.fillna(-1) for df in schema.dfs]

    for arity in (3, 4, 6):
        path = f"workloads/synthimdb_data/join_query_{arity}.txt"
        t_tree, t_merge, skipped = [], [], 0
        with open(path) as f:
            lines = [ln.strip() for ln in f if ln.strip()][:PER_ARITY]
        for line in lines:
            tids, preds, joins, card = enc.parse_line(line)
            filtered = {t: dfs[t].loc[_mask_for_predicates(
                dfs[t], schema.stats[t], preds[tids.index(t)])]
                for t in tids}
            t0 = time.perf_counter()
            c_tree = tree_join_count(filtered, joins)
            t_tree.append(time.perf_counter() - t0)
            assert c_tree == card, (line[:60], c_tree, card)
            ok, worst = prefix_feasible(filtered, joins)
            if not ok:
                skipped += 1
                continue
            t0 = time.perf_counter()
            c_merge = merge_count(filtered, joins)
            t_merge.append(time.perf_counter() - t0)
            assert c_merge == card
        tt = 1e3 * np.asarray(t_tree)
        tm = 1e3 * np.asarray(t_merge)
        print(f"[arity {arity}] n={len(lines)} tree median "
              f"{np.median(tt):.2f} ms p95 {np.quantile(tt, 0.95):.2f}; "
              f"merge median {np.median(tm):.2f} ms p95 "
              f"{np.quantile(tm, 0.95):.2f} (on its feasible "
              f"{len(t_merge)}/{len(lines)}); merge infeasible (> {CAP:.0e} "
              f"intermediate rows): {skipped} "
              f"({100 * skipped / len(lines):.0f}%)", flush=True)
    print("exit=0", flush=True)


if __name__ == "__main__":
    main()
