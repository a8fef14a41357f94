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
