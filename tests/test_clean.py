"""schema_cleaning parity (`/root/reference/schemas.py:8-39`): PK->code,
FK mapped through the PK's codes, non-key categoricals coded, NaN->-1,
int cast, ';'-separated CSV rewrite."""

import numpy as np
import pandas as pd

from nngp_tpu.data.clean import clean_schema


def _dirty_schema():
    users = pd.DataFrame({
        "user_id": ["u3", "u1", "u2"],
        "country": ["DE", "FR", np.nan],
        "age": [33.0, np.nan, 19.0],
    })
    orders = pd.DataFrame({
        "order_id": [10, 11, 12, 13],
        "user_id": ["u2", "u1", "u1", np.nan],
        "amount": [5.0, 7.5, np.nan, 2.0],
    })
    col_types = [["categorical", "categorical", "numerical"],
                 ["categorical", "categorical", "numerical"]]
    names = ["users", "orders"]
    pks = ["user_id", "order_id"]
    return [users, orders], col_types, names, pks


def test_clean_schema_codes_and_fk_sharing():
    dfs, col_types, names, pks = _dirty_schema()
    users_orig = dfs[0].copy()
    cleaned = clean_schema(dfs, col_types, names, pks, cast_int=False)

    # inputs not mutated
    pd.testing.assert_frame_equal(dfs[0], users_orig)

    users, orders = cleaned
    # PK codes follow pd.Categorical category order (sorted: u1,u2,u3)
    assert users["user_id"].tolist() == [2, 0, 1]
    # FK user_id in orders mapped through the users PK dict; NaN -> -1
    assert orders["user_id"].tolist() == [1, 0, 0, -1]
    # non-key categorical coded per column, NaN -> -1
    assert users["country"].tolist() == [0, 1, -1]
    # numerical NaN -> -1 too (reference fillna(-1) is frame-wide)
    assert users["age"].tolist() == [33.0, -1.0, 19.0]


def test_clean_schema_int_cast_and_csv_roundtrip(tmp_path):
    dfs, col_types, names, pks = _dirty_schema()
    cleaned = clean_schema(dfs, col_types, names, pks,
                           out_dir=str(tmp_path), cast_int=True)
    for df in cleaned:
        assert all(np.issubdtype(dt, np.integer) for dt in df.dtypes)
    for name, df in zip(names, cleaned):
        back = pd.read_csv(tmp_path / f"{name}.csv", sep=";")
        pd.testing.assert_frame_equal(back, df)
