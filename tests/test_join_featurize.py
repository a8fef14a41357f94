"""Multi-join featurization golden tests: synthetic 3-table schema, oracle is
a literal transcription of the reference's per-query encoding
(`/root/reference/JoinQuerySampler.py:604-622`)."""

import numpy as np
import pandas as pd
import pytest

from nngp_tpu.featurize.join import (
    JOIN_OPS_DICT,
    BinaryJoinEncoder,
    MultiJoinEncoder,
    detect_join_columns,
)
from nngp_tpu.featurize.schema import DBSchema
from nngp_tpu.featurize.stats import ColumnStats, TableStats


def _tables():
    a = TableStats("ta", (
        ColumnStats("id", "numerical", 0, 100),
        ColumnStats("x", "numerical", -10, 10),
    ), chunk_size=4)
    b = TableStats("tb", (
        ColumnStats("id", "numerical", 0, 100),
        ColumnStats("y", "numerical", 0, 1),
        ColumnStats("tag", "categorical", categories=tuple(range(6))),
    ), chunk_size=4)
    c = TableStats("tc", (
        ColumnStats("tag", "categorical", categories=tuple(range(6))),
        ColumnStats("z", "numerical", 5, 15),
    ), chunk_size=4)
    return a, b, c


def test_detect_join_columns():
    a, b, c = _tables()
    assert detect_join_columns(a, b) == [("id", "numerical")]
    assert detect_join_columns(b, c) == [("tag", "categorical")]
    assert detect_join_columns(a, c) == []


def test_multi_join_layout_and_graph():
    a, b, c = _tables()
    enc = MultiJoinEncoder([a, b, c])
    # triples: (0,1,id), (1,2,tag); join_feat_dim = 2*3 = 6
    assert enc.all_join_triples == [(0, 1, "id"), (1, 2, "tag")]
    assert enc.join_feat_dim == 6
    # feat dim: ta 4 + tb (2+2+ceil(6/4)=2) 6 + tc (2+2) 4 + join 6
    assert enc.feat_dim == a.feat_dim + b.feat_dim + c.feat_dim + 6
    assert enc.join_adj[1] == {0, 2}


def test_multi_join_parse_and_encode_matches_oracle():
    a, b, c = _tables()
    enc = MultiJoinEncoder([a, b, c])
    line = "ta,tb@x,5.0,-5.0@y,0.8,0.2#tag,1,3@ta,tb,id@4242\n"
    tids, preds, joins, card = enc.parse_line(line)
    assert tids == [0, 1] and card == 4242
    assert joins[0].col_name == "id" and joins[0].t1_id == 0

    x = enc.encode_batch([(tids, preds, joins)])[0]

    # oracle: per-table default rows + literal scatter
    def table_default(t):
        row = np.zeros(t.feat_dim)
        for col, addr in zip(t.columns, t.addresses):
            if col.kind == "numerical":
                row[addr.start + 1] = 1000
        return row

    oa, ob, oc = (table_default(t) for t in (a, b, c))
    # ta: x in [-10,10]: upper 5 -> (5+10)/20*1000 = 750; lower -5 -> 250
    oa[2], oa[3] = 750.0, 250.0
    # tb: y: upper .8 -> 800, lower .2 -> 200; tag {1,3} chunk4: code1 -> 2^(4-1-1)=4, code3 -> 2^0=1 -> slot0 = 5
    ob[2], ob[3] = 800.0, 200.0
    ob[4] = 5.0
    # tc absent -> defaults
    join = np.zeros(6)
    join[0 * 3 + JOIN_OPS_DICT["="]] = 1
    want = np.concatenate([oa, ob, oc, join])
    np.testing.assert_allclose(x, want)


def test_multi_join_cardless_parse():
    a, b, c = _tables()
    enc = MultiJoinEncoder([a, b, c])
    tids, preds, joins = enc.parse_line_without_card("tb,tc@@tag,2@tb,tc,tag")
    assert tids == [1, 2]
    assert preds[0] == [] and preds[1] == [(0, [2])]
    assert joins[0].col_name == "tag"


def test_aux_query_filtering(tmp_path):
    a, b, c = _tables()
    enc = MultiJoinEncoder([a, b, c])
    qdir = tmp_path / "q"
    qdir.mkdir()
    (qdir / "join_query_2.txt").write_text("ta,tb@@@ta,tb,id@100\n")
    (qdir / "join_query_aux.txt").write_text(
        "ta,tb@@@ta,tb,id@50@150.0@0.5\n"   # q_error >= 100 -> kept
        "ta,tb@@@ta,tb,id@60@10.0@0.2\n"    # both below -> dropped
        "ta,tb@@@ta,tb,id@70@10.0@2.0\n"    # coef_var >= 1 -> kept
    )
    queries, cards, infos = enc.load_queries(str(qdir), use_aux=True,
                                             q_error_threshold=100.0,
                                             coef_var_threshold=1.0)
    assert sorted(cards) == [50, 70, 100]
    q2, c2, _ = enc.load_queries(str(qdir), use_aux=False)
    assert c2 == [100]


def test_binary_join_encoder_multi_char_ops():
    a, b, _ = _tables()
    enc = BinaryJoinEncoder(a, b)
    assert enc.join_col_names == ["id"]
    line = "x,5.0,-5.0@@id,<=@77\n"
    t1p, t2p, joins, card = enc.parse_line(line)
    assert card == 77 and joins == [("id", "<=")]
    x = enc.encode_batch([(t1p, t2p, joins)])[0]
    join_x = x[a.feat_dim + b.feat_dim:]
    # '<=' sets chars '<' (slot 1) and '=' (slot 2)
    np.testing.assert_array_equal(join_x, [0, 1, 1])
    # '<>' sets '<' and '>'
    _, _, joins2, _ = enc.parse_line("@@id,<>@3")
    x2 = enc.encode_batch([([], [], joins2)])[0]
    np.testing.assert_array_equal(x2[a.feat_dim + b.feat_dim:], [1, 1, 0])


def test_dbschema_pk_fk_recoding():
    users = pd.DataFrame({"uid": ["u3", "u1", "u2"], "age": [30, 20, 25]})
    orders = pd.DataFrame({"uid": ["u1", "u1", "u3", "u9"],
                           "amount": [5.0, 6.0, 7.0, 8.0]})
    schema = DBSchema(
        [users, orders],
        [["categorical", "numerical"], ["categorical", "numerical"]],
        ["users", "orders"], ["uid", ""], chunk_size=4,
    )
    # users.uid recoded to categorical codes (sorted: u1->0, u2->1, u3->2)
    assert schema.pk_code_dicts[0] == {"u1": 0, "u2": 1, "u3": 2}
    # orders.uid reuses users' code dict (FK)
    assert schema.fk_code_dicts_list[1]["uid"] == schema.pk_code_dicts[0]
    ostats = schema.stats[1]
    assert ostats.columns[0].kind == "categorical"
    assert ostats.columns[0].num_cat == 3  # PK vocabulary, not orders' own
    # joinable on uid (categorical both sides)
    assert detect_join_columns(schema.stats[0], schema.stats[1]) == [
        ("uid", "categorical")
    ]


def test_dbschema_does_not_mutate_caller_frames():
    """PK recoding must happen on copies — the caller's frames are reused
    for sampling ground truth."""
    import pandas as pd
    from nngp_tpu.featurize.schema import DBSchema
    orders = pd.DataFrame({"order_key": [101, 102, 103], "v": [1.0, 2.0, 3.0]})
    raw = orders["order_key"].tolist()
    DBSchema([orders], [["categorical", "numerical"]], ["orders"],
             ["order_key"], chunk_size=4)
    assert orders["order_key"].tolist() == raw


def test_from_dataframe_mixed_type_categorical():
    """String categorical columns whose NaNs became int -1 (fillna) must
    not crash stats building (np.unique raises on mixed object arrays;
    the reference uses pd.Categorical, `JoinQuerySampler.py:49`)."""
    import pandas as pd
    from nngp_tpu.featurize.stats import TableStats
    df = pd.DataFrame({"uid": ["a", None, "b", "a"],
                       "score": [1.0, 2.0, 3.0, 4.0]})
    st = TableStats.from_dataframe(df, ["categorical", "numerical"], "t")
    assert st.columns[0].num_cat == 3          # -1, 'a', 'b'


def test_load_stats_dir_orders_by_schema(tmp_path):
    """Stats-dir loading must follow the schema's table order, not the
    sorted-filename order (which would silently permute the feature
    layout)."""
    from nngp_tpu.featurize.stats import ColumnStats, TableStats, load_stats_dir
    names = ["zeta", "alpha"]                  # schema order != sorted order
    for n in names:
        TableStats(n, (ColumnStats("x", "numerical", 0, 1),),
                   chunk_size=4).save(str(tmp_path / f"{n}.json"))
    (tmp_path / "notes.txt").write_text("ignore me")
    ordered = load_stats_dir(str(tmp_path), table_names=names)
    assert [t.table_name for t in ordered] == names
    plain = load_stats_dir(str(tmp_path))
    assert [t.table_name for t in plain] == ["alpha", "zeta"]
    with pytest.raises(FileNotFoundError):
        load_stats_dir(str(tmp_path), table_names=["zeta", "missing"])


def test_chunk_norm_rescales_only_chunk_slots():
    """chunk_norm multiplies exactly the factorized categorical slots by
    1000/2^chunk_size; numeric range slots and join one-hots are untouched,
    and chunk_norm=False stays bit-identical to the reference encoding."""
    a, b, c = _tables()
    raw = MultiJoinEncoder([a, b, c])
    nrm = MultiJoinEncoder([a, b, c], chunk_norm=True)

    line = "tb,tc@y,0.7,0.2#tag,0,2,5@tag,1,3@tb,tc,tag@40"
    tids, preds, joins, card = raw.parse_line(line)
    x_raw = raw.encode_batch([(tids, preds, joins)])
    x_nrm = nrm.encode_batch([(tids, preds, joins)])

    scale = raw.col_scale  # all ones
    assert np.all(scale == 1.0)
    scale_n = nrm.col_scale
    factor = 1000.0 / 2.0 ** 4  # chunk_size=4
    # chunk slots carry the factor, everything else is 1
    assert set(np.unique(scale_n)) == {1.0, factor}
    np.testing.assert_allclose(x_nrm, x_raw * scale_n)
    # the numeric slots (and join one-hot) really are untouched
    changed = x_nrm != x_raw
    assert changed.any()
    assert np.all(scale_n[np.where(changed.any(axis=0))[0]] == factor)
    # idempotent layout: feat dims identical
    assert raw.feat_dim == nrm.feat_dim == x_raw.shape[1]


def test_chunk_norm_bounds_features():
    """With chunk_norm on, every encoded feature lies in [0, 1000] — no
    fp32 prescale needed downstream."""
    a, b, c = _tables()
    nrm = MultiJoinEncoder([a, b, c], chunk_norm=True)
    line = "tb,tc@y,0.7,0.2#tag,0,1,2,3,4,5@tag,0,5@tb,tc,tag@40"
    tids, preds, joins, _ = nrm.parse_line(line)
    x = nrm.encode_batch([(tids, preds, joins)])
    assert x.min() >= 0.0 and x.max() <= 1000.0
