"""Offline sampler tests: ground-truth counting vs brute-force oracles."""

import numpy as np
import pandas as pd
import pytest

from nngp_tpu.data.sampler import (
    BinaryJoinSampler,
    MultiJoinSampler,
    SingleTableSampler,
    _count_pairs_op,
    true_card_single,
)
from nngp_tpu.featurize.parser import parse_single_table_line
from nngp_tpu.featurize.stats import TableStats


def _df(seed=0, n=500):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "a": rng.integers(0, 50, n),
        "b": rng.uniform(-1, 1, n),
        "c": rng.choice(["u", "v", "w"], n),
    })


def _stats(df, name="t"):
    return TableStats.from_dataframe(
        df, ["numerical", "numerical", "categorical"], name, chunk_size=4)


def test_true_card_single_matches_pandas_query():
    df = _df()
    st = _stats(df)
    preds = [(0, 30.0, 10.0), (1, 0.5, -0.5)]
    want = len(df.query("a <= 30 and a >= 10 and b <= 0.5 and b >= -0.5"))
    assert true_card_single(df, st, preds) == want
    # categorical IN-set
    codes = [st.columns[2].code_of("u"), st.columns[2].code_of("w")]
    preds = [(2, codes)]
    # encoded queries carry codes; df holds raw values — samplers operate on
    # code-recoded frames, so recode here:
    df2 = df.copy()
    df2["c"] = pd.Categorical(df2["c"]).codes
    want = int(df2["c"].isin(codes).sum())
    assert true_card_single(df2, st, preds) == want


@pytest.mark.parametrize("op", ["<", ">", "=", "<=", ">=", "<>"])
def test_count_pairs_op_matches_bruteforce(op):
    rng = np.random.default_rng(1)
    a = rng.integers(0, 20, 300).astype(float)
    b = rng.integers(0, 20, 200).astype(float)
    from nngp_tpu.data.sampler import _compare
    want = int(_compare(a[:, None], b[None, :], op).sum())
    assert _count_pairs_op(a, b, op) == want


def test_single_table_sampler_generates_parseable_lines(tmp_path):
    df = _df()
    df["c"] = pd.Categorical(df["c"]).codes  # recode as schema_cleaning does
    st = TableStats.from_dataframe(
        df, ["numerical", "numerical", "categorical"], "t", chunk_size=4)
    sampler = SingleTableSampler(df, st, seed=7)
    lines = sampler.sample_batch_query(d=2, mini_batch=10, cat_size=2,
                                       save_path=str(tmp_path))
    assert len(lines) == 10
    for line in lines:
        preds, card = parse_single_table_line(line, st)
        assert card >= 1
        assert true_card_single(df, st, preds) == card
    assert (tmp_path / "query_2.txt").exists()


def test_multi_join_sampler_ground_truth_matches_bruteforce(tmp_path):
    rng = np.random.default_rng(2)
    t1 = pd.DataFrame({"k": rng.integers(0, 10, 80),
                       "x": rng.uniform(0, 1, 80)})
    t2 = pd.DataFrame({"k": rng.integers(0, 10, 60),
                       "m": rng.integers(0, 5, 60)})
    t3 = pd.DataFrame({"m": rng.integers(0, 5, 40),
                       "z": rng.uniform(0, 1, 40)})
    sts = [TableStats.from_dataframe(t1, ["numerical"] * 2, "t1"),
           TableStats.from_dataframe(t2, ["numerical"] * 2, "t2"),
           TableStats.from_dataframe(t3, ["numerical"] * 2, "t3")]
    sampler = MultiJoinSampler([t1, t2, t3], sts, seed=5)

    lines = sampler.sample_batch_query(str(tmp_path), num_tables=3,
                                       mini_batch=5)
    assert len(lines) == 5
    for line in lines:
        tids, preds, joins, card = sampler.encoder.parse_line(line)
        # brute-force oracle via pandas three-way cross filter
        d1 = t1[(t1.x <= 2) & True]  # copies
        # apply predicates
        from nngp_tpu.data.sampler import _mask_for_predicates
        dfs = [t1, t2, t3]
        sel = {t: dfs[t].loc[_mask_for_predicates(dfs[t], sts[t],
                                                  preds[tids.index(t)])]
               for t in tids}
        cross = None
        import itertools
        count = 0
        # brute force: iterate rows of first table
        frames = [sel[t].reset_index(drop=True) for t in tids]
        idx = pd.MultiIndex.from_product([f.index for f in frames])
        # vectorized brute force over the product (small sizes)
        grids = np.meshgrid(*[f.index.to_numpy() for f in frames],
                            indexing="ij")
        mask = np.ones(grids[0].shape, dtype=bool)
        for ji in joins:
            p1, p2 = tids.index(ji.t1_id), tids.index(ji.t2_id)
            v1 = frames[p1][ji.col_name].to_numpy()[grids[p1]]
            v2 = frames[p2][ji.col_name].to_numpy()[grids[p2]]
            mask &= v1 == v2
        assert card == int(mask.sum())


def test_binary_join_sampler_lines_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    t1 = pd.DataFrame({"k": rng.integers(0, 15, 100),
                       "x": rng.uniform(0, 1, 100)})
    t2 = pd.DataFrame({"k": rng.integers(0, 15, 90),
                       "y": rng.uniform(0, 1, 90)})
    s1 = TableStats.from_dataframe(t1, ["numerical"] * 2, "t1")
    s2 = TableStats.from_dataframe(t2, ["numerical"] * 2, "t2")
    sampler = BinaryJoinSampler(t1, s1, t2, s2, seed=4)
    lines = sampler.sample_batch_query(num_joins=1, mini_batch=8,
                                       save_path=str(tmp_path))
    assert len(lines) == 8
    enc = sampler.encoder
    for line in lines:
        t1p, t2p, joins, card = enc.parse_line(line)
        assert card >= 1
        # oracle: brute force pair count
        from nngp_tpu.data.sampler import _compare, _mask_for_predicates
        d1 = t1.loc[_mask_for_predicates(t1, s1, t1p)]
        d2 = t2.loc[_mask_for_predicates(t2, s2, t2p)]
        col, op = joins[0]
        want = int(_compare(d1[col].to_numpy()[:, None],
                            d2[col].to_numpy()[None, :], op).sum())
        assert card == want


# --- tree_join_count: message-passing COUNT(*) vs merge/brute oracles ---

class _JI:
    def __init__(self, t1_id, t2_id, col_name):
        self.t1_id, self.t2_id, self.col_name = t1_id, t2_id, col_name


def _merge_count(filtered, join_infos):
    """Reference oracle: successive inner merges (the path tree_join_count
    replaces), on renamed frames like MultiJoinSampler.query_true_card."""
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
            elif t1 in included and t2 in included:
                acc = acc[acc[f"{t1}.{col}"] == acc[f"{t2}.{col}"]]
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


def test_tree_join_count_fuzz_matches_merge_oracle():
    from nngp_tpu.data.sampler import tree_join_count
    rng = np.random.default_rng(11)
    for trial in range(30):
        n_tables = int(rng.integers(2, 6))
        filtered, join_infos = {}, []
        # random tree: each table t>0 attaches to a random earlier table
        # on a fresh column name; skewed duplicate keys, int/float mixes
        cols = {}
        for t in range(n_tables):
            cols[t] = {}
        for t in range(1, n_tables):
            par = int(rng.integers(0, t))
            cname = f"j{t}"
            cols[par][cname] = True
            cols[t][cname] = True
            join_infos.append(_JI(par, t, cname))
        for t in range(n_tables):
            n = int(rng.integers(1, 40))
            data = {"payload": rng.uniform(0, 1, n)}
            for cname in cols[t]:
                vals = rng.integers(0, 6, n).astype(
                    float if rng.random() < 0.5 else np.int64)
                if rng.random() < 0.3 and np.issubdtype(vals.dtype,
                                                        np.floating):
                    vals[rng.integers(0, n)] = np.nan  # NaN never matches
                data[cname] = vals
            filtered[t] = pd.DataFrame(data)
        got = tree_join_count(filtered, join_infos)
        want = _merge_count(filtered, join_infos)
        assert got == want, (trial, got, want)


def test_tree_join_count_rejects_cycles_and_disconnects():
    from nngp_tpu.data.sampler import tree_join_count
    a = pd.DataFrame({"k": [0, 1], "m": [0, 0]})
    b = pd.DataFrame({"k": [0, 1], "m": [0, 1]})
    # two edges between the same pair -> the second closes a cycle
    assert tree_join_count({0: a, 1: b},
                           [_JI(0, 1, "k"), _JI(0, 1, "m")]) is None
    # disconnected: table 2 has no edge
    c = pd.DataFrame({"z": [1.0]})
    assert tree_join_count({0: a, 1: b, 2: c}, [_JI(0, 1, "k")]) is None


def test_tree_join_count_exact_beyond_float53():
    """Star on one shared key: count = n^4 = 2^56 > 2^53 exercises the
    arbitrary-precision recompute path; the result must be exact."""
    from nngp_tpu.data.sampler import tree_join_count
    n = 2 ** 14
    root = pd.DataFrame({"k": [7]})
    leaves = {t: pd.DataFrame({"k": np.full(n, 7)}) for t in (1, 2, 3, 4)}
    filtered = {0: root, **leaves}
    jis = [_JI(0, t, "k") for t in (1, 2, 3, 4)]
    assert tree_join_count(filtered, jis) == n ** 4


def test_query_true_card_tree_path_equals_merge_path(tmp_path):
    """MultiJoinSampler labels via the tree path now — re-derive every
    sampled card with the merge oracle."""
    rng = np.random.default_rng(6)
    t1 = pd.DataFrame({"k": rng.integers(0, 8, 70),
                       "x": rng.uniform(0, 1, 70)})
    t2 = pd.DataFrame({"k": rng.integers(0, 8, 50),
                       "m": rng.integers(0, 4, 50),
                       "y": rng.uniform(0, 1, 50)})
    t3 = pd.DataFrame({"m": rng.integers(0, 4, 60),
                       "z": rng.uniform(0, 1, 60)})
    sts = [TableStats.from_dataframe(t1, ["numerical"] * 2, "t1"),
           TableStats.from_dataframe(t2, ["numerical"] * 3, "t2"),
           TableStats.from_dataframe(t3, ["numerical"] * 2, "t3")]
    sampler = MultiJoinSampler([t1, t2, t3], sts, seed=9)
    from nngp_tpu.data.sampler import _mask_for_predicates
    lines = sampler.sample_batch_query(str(tmp_path), num_tables=3,
                                       mini_batch=8)
    for line in lines:
        tids, preds, joins, card = sampler.encoder.parse_line(line)
        filtered = {t: sampler.dfs[t].loc[_mask_for_predicates(
            sampler.dfs[t], sts[t], preds[tids.index(t)])] for t in tids}
        assert card == _merge_count(filtered, joins)
