from nngp_tpu.data.clean import clean_schema
from nngp_tpu.data.loaders import (
    LOADERS,
    load_forest,
    load_higgs,
    load_sales,
    load_table,
)
from nngp_tpu.data.workload import load_single_table_workload

__all__ = [
    "LOADERS",
    "clean_schema",
    "load_forest",
    "load_higgs",
    "load_sales",
    "load_table",
    "load_single_table_workload",
]
