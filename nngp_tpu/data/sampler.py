"""Offline labeled-query generation (ground-truth COUNT(*) labeling).

Parity surfaces:
  SingleTableSampler <-> GeneralQuerySampler sampling half
      (`/root/reference/QuerySampler.py:59-138`): data-centric or uniform
      range predicates, IN-set categorical predicates, dedup, card >= 1,
      `pred@card` lines, one OS process per predicate arity.
  BinaryJoinSampler  <-> BinaryJoinQuerySampler (`JoinQuerySampler.py:
      185-367`): join ops {<,>,=,<=,>=,<>} numerical / {=,<>} categorical.
  MultiJoinSampler   <-> MultiJoinQuerySampler (`JoinQuerySampler.py:
      370-602`): acyclic join trees by frontier expansion, per-table
      predicates avoiding join keys, `tables@preds...@joins@card` lines.

Ground truth: the reference shells out to pandas `df.query`, pandasql
(sqlite) or ClickHouse. pandasql isn't available here and sqlite row-at-a-
time counting is slow anyway, so COUNT(*) is computed natively:
  - single table: vectorized boolean masks (no string eval);
  - equi-joins: successive pandas merges over the join tree;
  - non-equi binary joins: sort + searchsorted counting (O(n log n) instead
    of the reference's O(n^2) sqlite nested loop).
A ClickHouse path equivalent to `query_true_card_by_clickhouse`
(`JoinQuerySampler.py:505-565`) is provided behind an optional import.
"""

import os
import random
from multiprocessing import Process
from typing import Dict, Optional, Sequence

import numpy as np
import pandas as pd

from nngp_tpu.featurize.stats import CATEGORICAL, TableStats

from nngp_tpu.featurize.join import (      # one join-op vocabulary
    CATEGORICAL_JOIN_OPS,
    NUMERICAL_JOIN_OPS,
)


def _mask_for_predicates(df: pd.DataFrame, stats: TableStats, pred_list) -> np.ndarray:
    mask = np.ones(len(df.index), dtype=bool)
    for pred in pred_list:
        col = stats.columns[pred[0]]
        vals = df[col.name].to_numpy()
        if col.kind == CATEGORICAL:
            mask &= np.isin(vals, np.asarray(pred[1]))
        else:
            mask &= (vals <= pred[1]) & (vals >= pred[2])
    return mask


def true_card_single(df: pd.DataFrame, stats: TableStats, pred_list) -> int:
    """COUNT(*) under conjunctive predicates (replaces `df.query`,
    `/root/reference/QuerySampler.py:111-112`)."""
    return int(_mask_for_predicates(df, stats, pred_list).sum())


def _count_pairs_op(a: np.ndarray, b: np.ndarray, op: str) -> int:
    """Count pairs (x in a, y in b) with x OP y in O(n log n)."""
    b_sorted = np.sort(b)
    n = len(b_sorted)
    if op == "<":
        return int((n - np.searchsorted(b_sorted, a, side="right")).sum())
    if op == "<=":
        return int((n - np.searchsorted(b_sorted, a, side="left")).sum())
    if op == ">":
        return int(np.searchsorted(b_sorted, a, side="left").sum())
    if op == ">=":
        return int(np.searchsorted(b_sorted, a, side="right").sum())
    if op == "=":
        lo = np.searchsorted(b_sorted, a, side="left")
        hi = np.searchsorted(b_sorted, a, side="right")
        return int((hi - lo).sum())
    if op == "<>":
        lo = np.searchsorted(b_sorted, a, side="left")
        hi = np.searchsorted(b_sorted, a, side="right")
        return int((n - (hi - lo)).sum())
    raise ValueError(f"unsupported join op {op!r}")


def tree_join_count(filtered: Dict[int, pd.DataFrame], join_infos) -> Optional[int]:
    """Exact COUNT(*) of an acyclic equi-join WITHOUT materializing it.

    Upward message passing on the join tree (the counting semiring):
    each table's rows carry integer weights (initially 1); a child sends
    its parent the per-key sum of its row weights on the shared column,
    and the parent multiplies each of its rows by the message at that
    row's key. The root's weight sum is the join cardinality. Cost is
    O(sum_t n_t log n_t) — the reference's sqldf / successive-merge
    approach (`/root/reference/JoinQuerySampler.py:484-503`) is
    O(join output size), which explodes under Zipf-skewed FK<->FK joins
    (e.g. IMDB-style star schemas joined through a shared movie_id).

    Returns None when the edge set is not a spanning tree of the filtered
    tables (cycle-closing edge or disconnected) — callers fall back to
    the merge path. Exactness guard: weights are accumulated in float64;
    a result below 2^53 is provably exact (a contributing intermediate
    can only be smaller than the final count), and larger results are
    recomputed with arbitrary-precision Python ints.
    """
    # union-find tree check + adjacency
    uf = {t: t for t in filtered}

    def find(x):
        while uf[x] != x:
            uf[x] = uf[uf[x]]
            x = uf[x]
        return x

    adj: Dict[int, list] = {t: [] for t in filtered}
    for ji in join_infos:
        ra, rb = find(ji.t1_id), find(ji.t2_id)
        if ra == rb:
            return None  # cycle edge: equality filter needs the merge path
        uf[ra] = rb
        adj[ji.t1_id].append((ji.t2_id, ji.col_name))
        adj[ji.t2_id].append((ji.t1_id, ji.col_name))
    if len({find(t) for t in filtered}) != 1:
        return None  # disconnected: let the merge path raise

    # parent pointers + children-before-parents order (iterative DFS)
    root = next(iter(filtered))
    order, stack, seen = [], [root], {root}
    parent_edge: Dict[int, tuple] = {}
    while stack:
        t = stack.pop()
        order.append(t)
        for nb, col in adj[t]:
            if nb not in seen:
                seen.add(nb)
                parent_edge[nb] = (t, col)
                stack.append(nb)

    def _pass(as_object: bool):
        weights = {
            t: np.ones(len(df.index), dtype=object if as_object else np.float64)
            for t, df in filtered.items()
        }
        for t in reversed(order):
            if t == root:
                continue
            par, col = parent_edge[t]
            # one key dtype on both sides: int64/float64 mixes (fillna
            # turns NaN-bearing int columns into floats) must still match
            # on equal values, exactly as pd.merge does
            vals = filtered[t][col].to_numpy().astype(np.float64)
            pvals = filtered[par][col].to_numpy().astype(np.float64)
            # pd.merge MATCHES NaN keys with NaN keys (measured; the merge
            # path this replaces inherits that), so NaN must behave as one
            # more key value on both sides
            if as_object:
                acc: Dict = {}
                for v, w in zip(vals.tolist(), weights[t].tolist()):
                    if v != v:
                        v = "__nan__"  # self-matching NaN sentinel
                    acc[v] = acc.get(v, 0) + w
                mult = np.array(
                    [acc.get(v if v == v else "__nan__", 0)
                     for v in pvals.tolist()], dtype=object)
            else:
                msg = pd.Series(weights[t]).groupby(vals, dropna=False).sum()
                mult = msg.reindex(pd.Index(pvals), fill_value=0.0).to_numpy()
            weights[par] = weights[par] * mult
        return weights[root].sum()

    total = float(_pass(as_object=False))
    if total < float(2 ** 53):
        return int(round(total))
    return int(_pass(as_object=True))


class SingleTableSampler:
    """Samples labeled range/IN queries over one table."""

    def __init__(self, df: pd.DataFrame, stats: TableStats, seed: int = 1):
        self.df = df.fillna(-1)
        self.stats = stats
        self.rng = random.Random(seed)
        self._sorted_cols = {
            c.name: np.sort(self.df[c.name].to_numpy()) for c in stats.columns
        }

    def sample_numeric_col_predicate(self, col_idx, data_centric=False):
        col = self.stats.columns[col_idx]
        vals = self._sorted_cols[col.name]
        if data_centric:
            v1 = vals[self.rng.randrange(0, len(vals))]
            v2 = vals[self.rng.randrange(0, len(vals))]
        else:
            v1 = self.rng.uniform(col.min, col.max)
            v2 = self.rng.uniform(col.min, col.max)
        upper, lower = (v1, v2) if v1 >= v2 else (v2, v1)
        return col.name, upper, lower

    def sample_categorical_col_predicate(self, col_idx, data_centric=False,
                                         cat_size=1):
        col = self.stats.columns[col_idx]
        cat_size = min(cat_size, col.num_cat)
        if data_centric:
            vals = self.df[col.name].to_numpy()
            picks = [vals[i] for i in
                     self.rng.sample(range(len(vals)), cat_size)]
            picks = list(dict.fromkeys(picks))
        else:
            picks = self.rng.sample(list(col.categories), cat_size)
        codes = [col.code_of(c) for c in picks]
        return col.name, codes

    def sample_query(self, d, data_centric=False, cat_size=1,
                     col_pool: Optional[Sequence[int]] = None):
        """Returns (pred_list, pred_str)."""
        pool = list(col_pool) if col_pool is not None else list(range(self.stats.num_cols))
        assert 0 < d <= len(pool), "Error attribute number to sample!"
        col_indices = sorted(self.rng.sample(pool, k=d))
        pred_list, pred_str = [], []
        for ci in col_indices:
            if self.stats.columns[ci].kind == CATEGORICAL:
                name, codes = self.sample_categorical_col_predicate(
                    ci, data_centric, cat_size)
                pred_list.append((ci, codes))
                pred_str.append(",".join([name] + [str(c) for c in codes]))
            else:
                name, upper, lower = self.sample_numeric_col_predicate(
                    ci, data_centric)
                pred_list.append((ci, upper, lower))
                pred_str.append(",".join([name, str(upper), str(lower)]))
        return pred_list, "#".join(pred_str)

    def sample_batch_query(self, d, mini_batch, cat_size=10, save_path=None,
                           data_centric=False):
        """`pred@card` lines; dedup; card >= 1
        (`/root/reference/QuerySampler.py:114-133`)."""
        lines, seen = [], set()
        while len(lines) < mini_batch:
            pred_list, pred_str = self.sample_query(d, data_centric, cat_size)
            if pred_str in seen:
                continue
            seen.add(pred_str)
            card = true_card_single(self.df, self.stats, pred_list)
            if card < 1:
                continue
            lines.append(f"{pred_str}@{card}")
        if save_path:
            os.makedirs(save_path, exist_ok=True)
            with open(os.path.join(save_path, f"query_{d}.txt"), "a") as f:
                f.write("\n".join(lines) + "\n")
        return lines

    def parallel_sample(self, mini_batch, cat_size=50, save_path="./queryset",
                        data_centric=False):
        """One OS process per arity (`QuerySampler.py:135-138`)."""
        procs = []
        for d in range(1, self.stats.num_cols + 1):
            p = Process(target=self.sample_batch_query,
                        args=(d, mini_batch, cat_size, save_path, data_centric))
            p.start()
            procs.append(p)
        return procs


class MultiJoinSampler:
    """Acyclic multi-way equi-join query sampling + native ground truth."""

    def __init__(self, dfs: Sequence[pd.DataFrame], stats: Sequence[TableStats],
                 seed: int = 1):
        from nngp_tpu.featurize.join import MultiJoinEncoder
        self.dfs = [df.fillna(-1) for df in dfs]
        self.stats = list(stats)
        self.encoder = MultiJoinEncoder(stats)
        self.rng = random.Random(seed)
        # distinct per-table streams: identical seeds would make every
        # table draw the same predicate positions/quantiles in lockstep
        self.samplers = [SingleTableSampler(df, st, seed=seed + t_id)
                         for t_id, (df, st) in enumerate(
                             zip(self.dfs, self.stats))]
        self.num_tables = len(stats)

    def sample_tables_and_joins(self, num_tables):
        """Frontier expansion over the join graph
        (`/root/reference/JoinQuerySampler.py:419-443`)."""
        enc = self.encoder
        table_ids, join_infos = [], []
        start = self.rng.choice(range(self.num_tables))
        table_ids.append(start)
        frontier = set()
        for nb in enc.join_adj[start]:
            frontier.add((start, nb) if start < nb else (nb, start))
        while len(table_ids) < num_tables and frontier:
            t1, t2 = frontier.pop()
            if t1 in table_ids and t2 in table_ids:
                continue
            cur = t1 if t2 in table_ids else t2
            table_ids.append(cur)
            join_infos.append(
                self.rng.choice(enc.table_pair_to_join_infos[(t1, t2)]))
            for nxt in enc.join_adj[cur]:
                if nxt in table_ids:
                    continue
                frontier.add((cur, nxt) if cur < nxt else (nxt, cur))
        return sorted(table_ids), join_infos

    def sample_join_query(self, num_tables, data_centric=False, cat_size=10):
        enc = self.encoder
        if num_tables == 1:
            table_ids, join_infos = [self.rng.choice(range(self.num_tables))], []
        else:
            table_ids, join_infos = self.sample_tables_and_joins(num_tables)
        join_cols = {ji.col_name for ji in join_infos}
        all_pred_list, pred_str_list = [], []
        for t_id in table_ids:
            st = self.stats[t_id]
            # avoid predicates on any join-key column (`:473-475`)
            pool = [i for i, c in enumerate(st.columns)
                    if c.name not in join_cols
                    and c.name not in enc.all_join_col_names]
            d = self.rng.choice(range(len(pool) + 1))
            if d == 0:
                all_pred_list.append([])
                pred_str_list.append("")
                continue
            pred_list, pred_str = self.samplers[t_id].sample_query(
                d, data_centric, cat_size, col_pool=pool)
            all_pred_list.append(pred_list)
            pred_str_list.append(pred_str)
        join_str = "#".join(
            ",".join([enc.tid_to_table_name[ji.t1_id],
                      enc.tid_to_table_name[ji.t2_id], ji.col_name])
            for ji in join_infos)
        return table_ids, all_pred_list, join_infos, pred_str_list, join_str

    def query_true_card(self, table_ids, all_pred_list, join_infos) -> int:
        """COUNT(*) of the equi-join via successive pandas merges (replaces
        sqldf at `/root/reference/JoinQuerySampler.py:484-503`)."""
        raw: Dict[int, pd.DataFrame] = {}
        for t_id, preds in zip(table_ids, all_pred_list):
            mask = _mask_for_predicates(self.dfs[t_id], self.stats[t_id], preds)
            if not mask.any():
                return 0  # early stop (`:494-496`)
            raw[t_id] = self.dfs[t_id].loc[mask]
        if not join_infos:
            card = 1
            for t_id in table_ids:
                card *= len(raw[t_id].index)
            return card
        # tree-shaped edge sets (everything the frontier sampler emits)
        # count by message passing, never materializing the join
        count = tree_join_count(raw, join_infos)
        if count is not None:
            return count
        filtered = {t_id: df.rename(columns={c: f"{t_id}.{c}"
                                             for c in df.columns})
                    for t_id, df in raw.items()}
        # merge join_infos in connectivity order
        remaining = list(join_infos)
        acc = None
        included = set()
        while remaining:
            progressed = False
            for ji in list(remaining):
                t1, t2, col = ji.t1_id, ji.t2_id, ji.col_name
                if acc is None:
                    acc = filtered[t1].merge(
                        filtered[t2], left_on=f"{t1}.{col}",
                        right_on=f"{t2}.{col}", how="inner")
                    included |= {t1, t2}
                elif t1 in included and t2 in included:
                    acc = acc[acc[f"{t1}.{col}"] == acc[f"{t2}.{col}"]]
                elif t1 in included or t2 in included:
                    new = t2 if t1 in included else t1
                    old = t1 if t1 in included else t2
                    acc = acc.merge(filtered[new], left_on=f"{old}.{col}",
                                    right_on=f"{new}.{col}", how="inner")
                    included.add(new)
                else:
                    continue
                remaining.remove(ji)
                progressed = True
                if len(acc.index) == 0:
                    return 0
            if not progressed:
                raise ValueError("disconnected join graph in query")
        return len(acc.index)

    def sample_batch_query(self, save_path, num_tables, mini_batch,
                           data_centric=False, cat_size=10):
        """`tables@preds...@joins@card` lines
        (`/root/reference/JoinQuerySampler.py:567-594`)."""
        enc = self.encoder
        os.makedirs(save_path, exist_ok=True)
        lines, seen = [], set()
        while len(lines) < mini_batch:
            (table_ids, all_pred_list, join_infos,
             pred_str_list, join_str) = self.sample_join_query(
                num_tables, data_centric, cat_size)
            names = ",".join(enc.tid_to_table_name[t] for t in table_ids)
            query_str = names + "@" + "@".join(pred_str_list) + "@" + join_str
            if query_str in seen:
                continue
            seen.add(query_str)
            card = self.query_true_card(table_ids, all_pred_list, join_infos)
            if card < 1:
                continue
            lines.append(f"{query_str}@{card}")
        with open(os.path.join(save_path,
                               f"join_query_{num_tables}.txt"), "a") as f:
            f.write("\n".join(lines) + "\n")
        return lines

    def parallel_sampler(self, mini_batch, save_path="./queryset",
                         data_centric=False, cat_size=10):
        procs = []
        for num_tables in range(1, self.num_tables + 1):
            p = Process(target=self.sample_batch_query,
                        args=(save_path, num_tables, mini_batch,
                              data_centric, cat_size))
            p.start()
            procs.append(p)
        return procs


class BinaryJoinSampler:
    """Two-table join sampling with the full op set
    (`/root/reference/JoinQuerySampler.py:185-367`)."""

    def __init__(self, df1, stats1: TableStats, df2, stats2: TableStats,
                 seed: int = 1):
        from nngp_tpu.featurize.join import BinaryJoinEncoder
        self.df1, self.df2 = df1.fillna(-1), df2.fillna(-1)
        self.stats1, self.stats2 = stats1, stats2
        self.encoder = BinaryJoinEncoder(stats1, stats2)
        self.rng = random.Random(seed)
        self.s1 = SingleTableSampler(self.df1, stats1, seed=seed)
        self.s2 = SingleTableSampler(self.df2, stats2, seed=seed + 1)

    def sample_join_query(self, num_joins, data_centric=False, cat_size=10):
        enc = self.encoder
        assert 1 <= num_joins <= enc.total_num_joins, "Error number of joins!"
        idxs = self.rng.sample(range(enc.total_num_joins), k=num_joins)
        join_conditions = []
        for i in idxs:
            ops = (CATEGORICAL_JOIN_OPS if enc.join_col_types[i] == CATEGORICAL
                   else NUMERICAL_JOIN_OPS)
            join_conditions.append((enc.join_col_names[i], self.rng.choice(ops)))
        join_cols = {c for c, _ in join_conditions}

        def table_preds(sampler, stats):
            pool = [i for i, c in enumerate(stats.columns)
                    if c.name not in join_cols]
            d = self.rng.choice(range(len(pool) + 1))
            if d == 0:
                return [], ""
            return sampler.sample_query(d, data_centric, cat_size, col_pool=pool)

        t1_preds, t1_str = table_preds(self.s1, self.stats1)
        t2_preds, t2_str = table_preds(self.s2, self.stats2)
        join_str = "#".join(",".join(jc) for jc in join_conditions)
        return t1_preds, t2_preds, join_conditions, t1_str, t2_str, join_str

    def query_true_card(self, t1_preds, t2_preds, join_conditions) -> int:
        m1 = _mask_for_predicates(self.df1, self.stats1, t1_preds)
        m2 = _mask_for_predicates(self.df2, self.stats2, t2_preds)
        d1, d2 = self.df1.loc[m1], self.df2.loc[m2]
        if len(d1.index) == 0 or len(d2.index) == 0:
            return 0
        if len(join_conditions) == 1:
            col, op = join_conditions[0]
            return _count_pairs_op(d1[col].to_numpy(), d2[col].to_numpy(), op)
        # multiple conditions: merge on '=' subset, verify the rest blocked
        eq_cols = [c for c, op in join_conditions if op == "="]
        rest = [(c, op) for c, op in join_conditions if op != "="]
        if eq_cols:
            a = d1[[c for c, _ in join_conditions]].rename(
                columns=lambda c: f"l_{c}")
            b = d2[[c for c, _ in join_conditions]].rename(
                columns=lambda c: f"r_{c}")
            merged = a.merge(b, left_on=[f"l_{c}" for c in eq_cols],
                             right_on=[f"r_{c}" for c in eq_cols], how="inner")
            mask = np.ones(len(merged.index), dtype=bool)
            for c, op in rest:
                lv, rv = merged[f"l_{c}"].to_numpy(), merged[f"r_{c}"].to_numpy()
                mask &= _compare(lv, rv, op)
            return int(mask.sum())
        # no equality: blocked outer-product evaluation
        total = 0
        av = {c: d1[c].to_numpy() for c, _ in rest}
        bv = {c: d2[c].to_numpy() for c, _ in rest}
        n1 = len(d1.index)
        block = max(1, 10_000_000 // max(len(d2.index), 1))
        for s in range(0, n1, block):
            mask = None
            for c, op in rest:
                m = _compare(av[c][s:s + block, None], bv[c][None, :], op)
                mask = m if mask is None else (mask & m)
            total += int(mask.sum())
        return total

    def sample_batch_query(self, num_joins, mini_batch, cat_size=10,
                           save_path="./queryset", data_centric=True):
        os.makedirs(save_path, exist_ok=True)
        lines, seen = [], set()
        while len(lines) < mini_batch:
            (t1_preds, t2_preds, join_conditions,
             t1_str, t2_str, join_str) = self.sample_join_query(
                num_joins, data_centric, cat_size)
            query_str = f"{t1_str}@{t2_str}@{join_str}"
            if query_str in seen:
                continue
            seen.add(query_str)
            card = self.query_true_card(t1_preds, t2_preds, join_conditions)
            if card < 1:
                continue
            lines.append(f"{query_str}@{card}")
        with open(os.path.join(save_path,
                               f"join_query_{num_joins}.txt"), "a") as f:
            f.write("\n".join(lines) + "\n")
        return lines


def _compare(a, b, op):
    if op == "<":
        return a < b
    if op == ">":
        return a > b
    if op == "<=":
        return a <= b
    if op == ">=":
        return a >= b
    if op == "=":
        return a == b
    if op == "<>":
        return a != b
    raise ValueError(f"unsupported op {op!r}")


def query_true_card_by_clickhouse(query_str: str, host="localhost",
                                  port="9000", database="imdb") -> int:
    """ClickHouse ground truth (`/root/reference/JoinQuerySampler.py:505-565`).
    Optional: requires the clickhouse_driver package and a running server."""
    try:
        import clickhouse_driver
    except ImportError as e:
        raise RuntimeError(
            "clickhouse_driver is not installed in this environment") from e
    parts = query_str.split("@")
    table_names = parts[0].split(",")
    preds_list = [p.split("#") for p in parts[1:-1]]
    join_conditions = [j.split(",") for j in parts[-1].split("#")]
    conds = []
    for tname, preds in zip(table_names, preds_list):
        for pred in preds:
            f = pred.split(",")
            if len(f) != 3:
                continue
            conds.append(f"{tname}.{f[0]} <= {f[1]}")
            conds.append(f"{tname}.{f[0]} >= {f[2]}")
    for jc in join_conditions:
        if len(jc) != 3:
            continue
        conds.append(f"{jc[0]}.{jc[2]}={jc[1]}.{jc[2]}")
    sql = "SELECT COUNT(*) FROM " + ",".join(table_names)
    if conds:
        sql += " WHERE " + " AND ".join(conds)
    client = clickhouse_driver.Client(host=host, port=port, database=database)
    return client.execute(sql)[0][0]
