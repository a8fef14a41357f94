"""Workload assembly: query files + stats -> (X, Y, query_infos).

Equivalent of `datasets.load_training_data`
(`/root/reference/datasets.py:301-346`) for the single-table path, with one
TPU-relevant improvement: when the raw CSV is unavailable (the reference repo
never ships it — `readme.md:37` tells users to download Covertype), column
stats are estimated from the query files themselves so the committed
`workloads/forest_data` fixtures are runnable out of the box.
"""

import os
from typing import Optional

import numpy as np

from nngp_tpu.data.loaders import load_table
from nngp_tpu.featurize.encoder import SingleTableEncoder
from nngp_tpu.featurize.parser import load_single_table_queries
from nngp_tpu.featurize.stats import TableStats


def single_table_stats(relation: str, name: str, query_path: str,
                       data_path: Optional[str] = None,
                       chunk_size: int = 64,
                       nrows: Optional[int] = None) -> TableStats:
    csv_ok = False
    if data_path:
        try:
            df, col_types = load_table(relation, data_path, nrows=nrows)
            csv_ok = True
        except (FileNotFoundError, ValueError):
            csv_ok = False
    if csv_ok:
        return TableStats.from_dataframe(df, col_types, name, chunk_size=chunk_size)
    # Stats JSON artifact next to the queries?
    stats_json = os.path.join(query_path, os.pardir, f"{name}_stats.json")
    if os.path.exists(stats_json):
        return TableStats.load(stats_json)
    # Fall back to scanning the query files (numerical-only workloads).
    col_names = _discover_columns(query_path)
    return TableStats.from_query_files(query_path, col_names, name,
                                       chunk_size=chunk_size)


def _discover_columns(query_path: str):
    names = set()
    for fname in sorted(os.listdir(query_path)):
        with open(os.path.join(query_path, fname)) as f:
            for line in f:
                body = line.strip().split("@")[0]
                if not body:
                    continue
                for pred in body.split("#"):
                    names.add(pred.split(",")[0].strip())
    return sorted(names)


def load_multi_join_workload(query_path: str, schema_name: str = None,
                             data_path: Optional[str] = None,
                             stats_list=None, chunk_size: int = 64,
                             dtype=np.float64, use_aux: bool = False,
                             q_error_threshold: float = 100.0,
                             coef_var_threshold: float = 1.0,
                             chunk_norm: bool = False):
    """Multi-join workload -> (X, Y, query_infos, encoder). Equivalent of
    `schemas.load_training_schema_data` (`/root/reference/schemas.py:83-134`).

    chunk_norm: rescale packed categorical chunk slots onto the [0, 1000]
    numeric scale (featurize.SingleTableEncoder docstring) — off = the
    reference's bit-exact raw-integer encoding.

    Table stats come from the raw CSVs (schema_name + data_path), or from a
    `<schema_name>_stats/` directory of TableStats JSONs next to the queries,
    or are passed directly (stats_list)."""
    from nngp_tpu.featurize.join import MultiJoinEncoder

    if stats_list is None:
        stats_json_dir = os.path.join(query_path, os.pardir,
                                      f"{schema_name}_stats")
        if data_path:
            from nngp_tpu.data.loaders import SCHEMAS
            from nngp_tpu.featurize.schema import DBSchema
            loaders, table_names = SCHEMAS[schema_name]
            dfs, col_types_list, pks = [], [], []
            for fn in loaders:
                df, col_types, pk = fn(data_path)
                dfs.append(df)
                col_types_list.append(col_types)
                pks.append(pk)
            schema = DBSchema(dfs, col_types_list, table_names, pks, chunk_size)
            stats_list = schema.stats
        elif os.path.isdir(stats_json_dir):
            from nngp_tpu.data.loaders import SCHEMAS
            from nngp_tpu.featurize.stats import load_stats_dir
            names = SCHEMAS[schema_name][1] if schema_name in SCHEMAS else None
            stats_list = load_stats_dir(stats_json_dir, table_names=names)
        else:
            raise FileNotFoundError(
                f"need --data_path or a stats dir {stats_json_dir}")
    encoder = MultiJoinEncoder(stats_list, chunk_norm=chunk_norm)
    queries, cards, infos = encoder.load_queries(
        query_path, use_aux=use_aux, q_error_threshold=q_error_threshold,
        coef_var_threshold=coef_var_threshold)
    x, y = encoder.transform_to_arrays(queries, cards, dtype=dtype)
    return x, y, infos, encoder


def load_binary_join_workload(query_path: str, relations=None, names=None,
                              data_path: Optional[str] = None,
                              stats_pair=None, chunk_size: int = 64,
                              dtype=np.float64, chunk_norm: bool = False):
    """Two-table join workload (`t1p@t2p@joins@card` grammar) ->
    (X, Y, query_infos, encoder). The `--relations a,b` path of the
    reference (`/root/reference/datasets.py:335-343`)."""
    from nngp_tpu.featurize.join import BinaryJoinEncoder

    if stats_pair is None:
        if not (relations and data_path):
            raise ValueError("need stats_pair or (relations + data_path)")
        rels = [r.strip() for r in relations.split(",")]
        nms = ([n.strip() for n in names.split(",")]
               if names else rels)
        stats_pair = []
        for rel, nm in zip(rels, nms):
            df, col_types = load_table(rel, data_path, nrows=100000)
            stats_pair.append(TableStats.from_dataframe(
                df, col_types, nm, chunk_size=chunk_size))
    encoder = BinaryJoinEncoder(stats_pair[0], stats_pair[1],
                                chunk_norm=chunk_norm)
    queries, cards, infos = encoder.load_queries(query_path)
    x, y = encoder.transform_to_arrays(queries, cards, dtype=dtype)
    return x, y, infos, encoder


def load_single_table_workload(query_path: str, stats: Optional[TableStats] = None,
                               relation: str = "forest", name: str = "forest",
                               data_path: Optional[str] = None,
                               chunk_size: int = 64, dtype=np.float64,
                               chunk_norm: bool = False):
    """Returns (X, Y, query_infos, encoder)."""
    if stats is None:
        stats = single_table_stats(relation, name, query_path, data_path,
                                   chunk_size=chunk_size)
    queries, cards, infos = load_single_table_queries(query_path, stats)
    encoder = SingleTableEncoder(stats, chunk_norm=chunk_norm)
    x, y = encoder.transform_to_arrays(queries, cards, dtype=dtype)
    return x, y, infos, encoder
