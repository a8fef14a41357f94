"""Offline schema-cleaning CLI (the `schema_cleaning` tool at
`/root/reference/schemas.py:8-39`): load a multi-table schema's raw CSVs,
recode PK/FK/categorical columns to shared integer codes, and rewrite
cleaned `;`-separated CSVs.

    python -m nngp_tpu.cli.clean_schema --schema_name imdb_simple \
        --data_path /data/imdb_raw --out_dir /data/imdb_clean
"""

import argparse
import sys


def build_parser():
    p = argparse.ArgumentParser(
        "nngp_tpu schema cleaner",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--schema_name", type=str, required=True,
                   help="schema from loaders.SCHEMAS (tpch/tpcds/imdb_simple/...)")
    p.add_argument("--data_path", type=str, required=True)
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--nrows", type=int, default=None)
    p.add_argument("--int_cast", action="store_true",
                   help="apply the reference's trailing astype(int) "
                        "(IMDB-specific: truncates float columns)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from nngp_tpu.data.clean import clean_schema
    from nngp_tpu.data.loaders import SCHEMAS

    loaders, table_names = SCHEMAS[args.schema_name]
    dfs, col_types_list, pks = [], [], []
    for fn in loaders:
        df, col_types, pk = fn(args.data_path, nrows=args.nrows)
        dfs.append(df)
        col_types_list.append(col_types)
        pks.append(pk)
    clean_schema(dfs, col_types_list, table_names, pks, out_dir=args.out_dir,
                 cast_int=args.int_cast)
    print(f"wrote {len(dfs)} cleaned tables to {args.out_dir}")


if __name__ == "__main__":
    main(sys.argv[1:])
