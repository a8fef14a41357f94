"""CSV loader lock-in tests against synthetic files: column subsets, type
tags and primary keys must keep matching `/root/reference/datasets.py`
(cited per loader) — the real CSVs are not in this image, so these tests
generate minimal files with the right shapes."""

import csv

import pytest

from nngp_tpu.data import loaders as L


def _write_semicolon(path, n_cols, rows=3, header=True):
    with open(path, "w", newline="") as f:
        w = csv.writer(f, delimiter=";")
        if header:
            w.writerow([f"h{i}" for i in range(n_cols)])
        for r in range(rows):
            w.writerow([r * n_cols + i for i in range(n_cols)])


def test_load_forest_columns(tmp_path):
    """`datasets.py:292-298`: first 10 Covertype columns A..J, no header."""
    with open(tmp_path / "forest.csv", "w", newline="") as f:
        w = csv.writer(f)
        for r in range(4):
            w.writerow(list(range(12)))    # extra cols are ignored
    df, types = L.load_forest(str(tmp_path))
    assert list(df.columns) == list("ABCDEFGHIJ")
    assert types == [L.NUM] * 10
    assert len(df) == 4


def test_load_higgs_column_offsets(tmp_path):
    """`datasets.py:284-290`: HIGGS columns 22..28 become A..G."""
    with open(tmp_path / "HIGGS.csv", "w", newline="") as f:
        w = csv.writer(f)
        for r in range(2):
            w.writerow(list(range(29)))
    df, types = L.load_higgs(str(tmp_path))
    assert list(df.columns) == list("ABCDEFG")
    assert df.iloc[0].tolist() == [22, 23, 24, 25, 26, 27, 28]
    assert types == [L.NUM] * 7


def test_load_sales_types(tmp_path):
    """`datasets.py:275-281`: usecols 2..5, cat/cat/num/cat."""
    with open(tmp_path / "train.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow([f"h{i}" for i in range(6)])
        w.writerow(list(range(6)))
    df, types = L.load_sales(str(tmp_path))
    assert list(df.columns) == ["store", "item", "sales", "promote"]
    assert types == [L.CAT, L.CAT, L.NUM, L.CAT]


@pytest.mark.parametrize("fn,filename,cols,pk", [
    (L.load_tpch_lineitem, "lineitem.csv",
     ["order_key", "part_key", "supp_key", "line_number", "quantity",
      "extended_price", "discount", "tax"], ""),
    (L.load_tpch_part, "part.csv", ["part_key", "size", "retail_price"],
     "part_key"),
    (L.load_imdb_title, "title.csv",
     ["movie_id", "kind_id", "product_year", "imdb_id"], "movie_id"),
    (L.load_imdb_cast_info, "cast_info.csv",
     ["person_id", "movie_id", "person_role_id"], ""),
])
def test_join_table_loaders(tmp_path, fn, filename, cols, pk):
    _write_semicolon(tmp_path / filename, len(cols))
    df, types, got_pk = fn(str(tmp_path))
    assert list(df.columns) == cols
    assert len(types) == len(cols)
    assert got_pk == pk


def test_schemas_registry_is_consistent():
    """Every SCHEMAS entry pairs one loader per table name, and every
    loader is a callable from this module."""
    for name, (fns, tables) in L.SCHEMAS.items():
        assert len(fns) == len(tables), name
        for fn in fns:
            assert callable(fn)
