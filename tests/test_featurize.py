"""Encoder golden tests: the oracle is a literal per-query transcription of
the reference's encoding loop (`/root/reference/QuerySampler.py:200-235`),
checked against our vectorized batch encoder."""

import math

import numpy as np
import pytest

from nngp_tpu.featurize import (
    ColumnStats,
    SingleTableEncoder,
    TableStats,
    parse_single_table_line,
)
from nngp_tpu.featurize.parser import load_single_table_queries


def _stats():
    cols = (
        ColumnStats(name="A", kind="numerical", min=10.0, max=100.0),
        ColumnStats(name="B", kind="categorical",
                    categories=tuple(range(13))),   # 13 cats
        ColumnStats(name="C", kind="numerical", min=-5.0, max=5.0),
        ColumnStats(name="D", kind="categorical",
                    categories=tuple(range(4))),    # 4 cats
    )
    return TableStats(table_name="t", columns=cols, chunk_size=5)


def _oracle_encode(stats, pred_list):
    """Literal port of transform_to_1d_array + _factorized_encoding."""
    x = np.zeros(stats.feat_dim, dtype=np.float64)
    for ci in range(stats.num_cols):
        if stats.columns[ci].kind == "numerical":
            x[stats.addresses[ci].start + 1] = 1000
    for pred in pred_list:
        ci = pred[0]
        addr = stats.addresses[ci]
        col = stats.columns[ci]
        if col.kind == "categorical":
            dim = addr.end - addr.start
            bits = ["0"] * (dim * stats.chunk_size)
            for cat in pred[1]:
                bits[cat] = "1"
            s = "".join(bits)
            chunks = [s[i:i + stats.chunk_size] for i in range(0, len(s), stats.chunk_size)]
            vals = [int(c, 2) for c in chunks]
            x[addr.start:addr.end] = vals
        else:
            up = (pred[1] - col.min) / col.denominator * 1000
            lo = (pred[2] - col.min) / col.denominator * 1000
            x[addr.start] = up
            x[addr.start + 1] = lo
    return x


def test_addresses_and_dim():
    stats = _stats()
    # A: 2, B: ceil(13/5)=3, C: 2, D: ceil(4/5)=1 -> 8
    assert stats.feat_dim == 8
    assert [(a.start, a.end) for a in stats.addresses] == [(0, 2), (2, 5), (5, 7), (7, 8)]


def test_vectorized_encoder_matches_oracle():
    stats = _stats()
    enc = SingleTableEncoder(stats)
    rng = np.random.default_rng(0)
    batches = []
    for _ in range(50):
        preds = []
        if rng.random() < 0.8:
            preds.append((0, rng.uniform(10, 100), rng.uniform(10, 100)))
        if rng.random() < 0.8:
            cats = sorted(rng.choice(13, size=rng.integers(1, 6), replace=False).tolist())
            preds.append((1, cats))
        if rng.random() < 0.5:
            preds.append((2, rng.uniform(-5, 5), rng.uniform(-5, 5)))
        if rng.random() < 0.5:
            cats = sorted(rng.choice(4, size=rng.integers(1, 4), replace=False).tolist())
            preds.append((3, cats))
        batches.append(preds)

    got = enc.encode_batch(batches)
    want = np.stack([_oracle_encode(stats, p) for p in batches])
    np.testing.assert_array_equal(got, want)


def test_parse_line_grammar():
    stats = _stats()
    line = "A,55.5,20.25#B,0,7,12#C,4.0,-3.0@12345\n"
    preds, card = parse_single_table_line(line, stats)
    assert card == 12345
    assert preds[0] == (0, 55.5, 20.25)
    assert preds[1] == (1, [0, 7, 12])
    assert preds[2] == (2, 4.0, -3.0)


def test_unconstrained_default_is_0_1000():
    stats = _stats()
    enc = SingleTableEncoder(stats)
    x = enc.encode_one([])
    # numerical cols: upper slot 0, lower slot 1000; categorical all zero
    assert x[0] == 0 and x[1] == 1000
    assert x[5] == 0 and x[6] == 1000
    assert np.all(x[2:5] == 0) and x[7] == 0


def test_factorized_bit_values():
    stats = _stats()
    enc = SingleTableEncoder(stats)
    # cat code 0 -> first chunk leftmost bit = 2^(5-1) = 16
    x = enc.encode_one([(1, [0])])
    assert x[2] == 16 and x[3] == 0 and x[4] == 0
    # cat code 12 -> chunk 2, bit index 2 -> 2^(5-1-2) = 4
    x = enc.encode_one([(1, [12])])
    assert x[2] == 0 and x[3] == 0 and x[4] == 4
    # multiple codes in one chunk accumulate: {0,1} -> 16 + 8 = 24
    x = enc.encode_one([(1, [0, 1])])
    assert x[2] == 24


def test_load_queries_from_fixture_dir(tmp_path):
    stats = _stats()
    qdir = tmp_path / "qs"
    qdir.mkdir()
    (qdir / "query_1.txt").write_text("A,50,20@10\nC,1.0,0.0@7\n")
    (qdir / "query_2.txt").write_text("A,90,15#C,2,-2@99\n")
    queries, cards, infos = load_single_table_queries(str(qdir), stats)
    assert cards == [10, 7, 99]
    assert [i.num_predicates for i in infos] == [1, 1, 2]
    enc = SingleTableEncoder(stats)
    x, y = enc.transform_to_arrays(queries, cards)
    assert x.shape == (3, stats.feat_dim)
    np.testing.assert_allclose(y.ravel(), np.log2([10, 7, 99]))


def test_duplicate_category_codes_encode_idempotently():
    """A duplicate code in an IN-list must set its one-hot bit ONCE
    (`QuerySampler.py:229-231` sets encoding_str[cat]='1' idempotently) —
    += accumulation doubled the chunk value."""
    from nngp_tpu.featurize.encoder import SingleTableEncoder
    from nngp_tpu.featurize.stats import ColumnStats, TableStats
    st = TableStats("t", (ColumnStats("c", "categorical",
                                      categories=tuple(range(8))),),
                    chunk_size=4)
    enc = SingleTableEncoder(st)
    once = enc.encode_batch([[(0, [3])]])
    twice = enc.encode_batch([[(0, [3, 3])]])
    np.testing.assert_array_equal(once, twice)
    assert once[0][0] == float(int("0001", 2))


def test_pad_sets_all_empty_keeps_feature_width():
    """A batch of empty sets (join-less queries) must keep the declared
    feature width, not collapse it to 1."""
    from nngp_tpu.featurize.mscn import pad_sets
    out, mask = pad_sets([np.zeros((0, 9)), np.zeros((0, 9))], feat=9)
    assert out.shape == (2, 1, 9)
    assert not mask.any()
