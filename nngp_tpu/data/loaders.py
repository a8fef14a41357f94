"""CSV table loaders (parity surface of `/root/reference/datasets.py`).

Each loader returns ``(df, col_types[, primary_key])`` with the same column
subsets and type tags as the reference (file:line cited per loader). These
are offline host-side tools — the framework's device path only ever sees the
`TableStats` + encoded feature matrices derived from them, so a missing CSV
degrades gracefully to stats-from-query-files (`TableStats.from_query_files`).
"""

import os
from typing import Optional

import pandas as pd

NUM = "numerical"
CAT = "categorical"


def _read(data_path, filename, col_names, nrows, header=0, delimiter=";",
          usecols=None):
    return pd.read_csv(
        os.path.join(data_path, filename), header=header, delimiter=delimiter,
        usecols=usecols, names=col_names, nrows=nrows,
    )


# --- single-table datasets (`datasets.py:275-298`) ---
def load_forest(data_path, filename="forest.csv", nrows=None):
    """`/root/reference/datasets.py:292-298` — first 10 Covertype columns A..J."""
    cols = list("ABCDEFGHIJ")
    df = pd.read_csv(os.path.join(data_path, filename), header=None,
                     usecols=list(range(10)), names=cols, nrows=nrows)
    return df, [NUM] * 10


def load_higgs(data_path, filename="HIGGS.csv", nrows=None):
    """`/root/reference/datasets.py:284-290` — HIGGS columns 22..28 as A..G."""
    cols = list("ABCDEFG")
    df = pd.read_csv(os.path.join(data_path, filename), header=None,
                     usecols=[22, 23, 24, 25, 26, 27, 28], names=cols, nrows=nrows)
    return df, [NUM] * 7


def load_sales(data_path, filename="train.csv", nrows=None):
    """`/root/reference/datasets.py:275-281`."""
    cols = ["store", "item", "sales", "promote"]
    df = pd.read_csv(os.path.join(data_path, filename), header=0,
                     usecols=[2, 3, 4, 5], names=cols, nrows=nrows)
    return df, [CAT, CAT, NUM, CAT]


def load_yelp_reviews(data_path, filename="review_tmp.csv", nrows=None):
    """`/root/reference/datasets.py:229-238`."""
    cols = ["review_id", "user_id", "business_id", "stars", "useful", "funny", "cool"]
    df = _read(data_path, filename, cols, nrows)
    return df, [CAT, CAT, CAT, NUM, NUM, NUM, NUM]


def load_yelp_users(data_path, filename="user_tmp.csv", nrows=None):
    """`/root/reference/datasets.py:240-272`."""
    cols = ["user_id", "review_count", "useful", "funny", "cool", "fans",
            "average_stars", "compliment_hot", "compliment_more",
            "compliment_profile", "compliment_cute", "compliment_list",
            "compliment_note", "compliment_plain", "compliment_cool",
            "compliment_funny", "compliment_writer", "compliment_photos"]
    df = _read(data_path, filename, cols, nrows)
    return df, [CAT] + [NUM] * 17


# --- multi-table schemas: (df, col_types, primary_key) ---
def load_tpch_lineitem(data_path, filename="lineitem.csv", nrows=None):
    cols = ["order_key", "part_key", "supp_key", "line_number", "quantity",
            "extended_price", "discount", "tax"]
    return _read(data_path, filename, cols, nrows), [NUM] * 8, ""


def load_tpch_part(data_path, filename="part.csv", nrows=None):
    cols = ["part_key", "size", "retail_price"]
    return _read(data_path, filename, cols, nrows), [NUM] * 3, "part_key"


def load_tpch_orders(data_path, filename="orders.csv", nrows=None):
    cols = ["order_key", "order_status", "total_price", "ship_priority"]
    return _read(data_path, filename, cols, nrows), [NUM] * 4, "order_key"


def load_tpch_supplier(data_path, filename="supplier.csv", nrows=None):
    cols = ["supp_key", "nationkey", "acctbal"]
    return _read(data_path, filename, cols, nrows), [NUM] * 3, "supp_key"


def load_tpcds_store_sales(data_path, filename="store_sales.csv", nrows=None):
    cols = ["item_sk", "customer_sk", "store_sk", "promo_sk", "quantity",
            "wholesale_cost", "list_price", "sales_price", "ext_discount_amt",
            "ext_sales_price", "ext_wholesale_cost", "ext_list_price",
            "ext_tax", "ext_coupon_amt", "net_paid", "net_paid_inc_tax",
            "net_profit"]
    return _read(data_path, filename, cols, nrows), [NUM] * 17, ""


def load_tpcds_store(data_path, filename="store.csv", nrows=None):
    cols = ["store_sk", "number_employees", "floor_space", "market_id",
            "devision_id", "company_id", "tax_percentage"]
    return _read(data_path, filename, cols, nrows), [NUM] * 7, "store_sk"


def load_tpcds_item(data_path, filename="item.csv", nrows=None):
    cols = ["item_sk", "current_price", "wholesale_cost", "brand_id",
            "class_id", "category_id", "manufact_id"]
    return _read(data_path, filename, cols, nrows), [NUM] * 7, "item_sk"


def load_tpcds_customer(data_path, filename="customer.csv", nrows=None):
    cols = ["customer_sk", "birth_day", "birth_month", "birth_year"]
    return _read(data_path, filename, cols, nrows), [NUM] * 4, "customer_sk"


def load_tpcds_promotion(data_path, filename="promotion.csv", nrows=None):
    # The reference declares 6 col_types for 4 names (`datasets.py:93-94`) —
    # a latent bug; 4 is correct and what pandas actually produces.
    cols = ["promo_sk", "item_sk", "cost", "response_target"]
    return _read(data_path, filename, cols, nrows), [NUM] * 4, "promo_sk"


def load_imdb_title(data_path, filename="title.csv", nrows=None):
    cols = ["movie_id", "kind_id", "product_year", "imdb_id"]
    return _read(data_path, filename, cols, nrows), [NUM] * 4, "movie_id"


def load_imdb_cast_info(data_path, filename="cast_info.csv", nrows=None):
    cols = ["person_id", "movie_id", "person_role_id"]
    return _read(data_path, filename, cols, nrows), [NUM] * 3, ""


def load_imdb_movie_info(data_path, filename="movie_info.csv", nrows=None):
    cols = ["movie_info_id", "movie_id", "info_type_id"]
    return _read(data_path, filename, cols, nrows), [NUM] * 3, "movie_info_id"


def load_imdb_movie_companies(data_path, filename="movie_companies.csv", nrows=None):
    cols = ["movie_id", "company_id", "company_type_id"]
    return _read(data_path, filename, cols, nrows), [NUM] * 3, ""


def load_imdb_movie_info_idx(data_path, filename="movie_info_idx.csv", nrows=None):
    cols = ["movie_info_idx_id", "movie_id", "info_type_id"]
    return _read(data_path, filename, cols, nrows), [NUM] * 3, "movie_info_idx_id"


def load_imdb_movie_info_idx2(data_path, filename="movie_info_idx.csv", nrows=None):
    """2-name read of movie_info_idx (`datasets.py:146-153`). Parity note:
    like the reference (its usecols=[0,1] is commented out there), reading
    a THREE-column movie_info_idx.csv with 2 names makes pandas treat
    column 0 as the index — the imdb_simple schema expects a 2-column
    file; use the full `imdb` schema for 3-column dumps."""
    cols = ["movie_info_idx_id", "movie_id"]
    return _read(data_path, filename, cols, nrows), [NUM] * 2, "movie_info_idx_id"


def load_imdb_movie_keyword(data_path, filename="movie_keyword.csv", nrows=None):
    cols = ["movie_id", "keyword_id"]
    return _read(data_path, filename, cols, nrows), [NUM] * 2, ""


def load_yelp_business_raw(data_path, filename="business.csv", nrows=None):
    cols = ["business_id", "latitude", "longitude", "business_stars",
            "business_review_count"]
    return _read(data_path, filename, cols, nrows), [NUM] * 5, "business_id"


def load_yelp_reviews_raw(data_path, filename="review.csv", nrows=None):
    cols = ["review_id", "user_id", "business_id", "review_stars",
            "review_useful", "review_funny", "review_cool"]
    return _read(data_path, filename, cols, nrows), [NUM] * 7, "review_id"


def load_yelp_users_raw(data_path, filename="user.csv", nrows=None):
    cols = ["user_id", "user_review_count", "user_useful", "user_funny",
            "user_cool", "fans", "average_stars", "compliment_hot",
            "compliment_more", "compliment_profile", "compliment_cute",
            "compliment_list", "compliment_note", "compliment_plain",
            "compliment_cool", "compliment_funny", "compliment_writer",
            "compliment_photos"]
    return _read(data_path, filename, cols, nrows), [NUM] * 18, "user_id"


LOADERS = {
    "forest": load_forest,
    "higgs": load_higgs,
    "sales": load_sales,
    "yelp-review": load_yelp_reviews,
    "yelp-user": load_yelp_users,
}

# schema_name -> (list of loader fns, table names) — parity with
# `/root/reference/schemas.py:91-114`.
SCHEMAS = {
    "yelp": (
        [load_yelp_business_raw, load_yelp_reviews_raw, load_yelp_users_raw],
        ["business", "review", "user"],
    ),
    "tpcds": (
        [load_tpcds_store_sales, load_tpcds_store, load_tpcds_item,
         load_tpcds_customer, load_tpcds_promotion],
        ["store_sales", "store", "item", "customer", "promotion"],
    ),
    "tpch": (
        [load_tpch_lineitem, load_tpch_part, load_tpch_orders, load_tpch_supplier],
        ["lineitem", "part", "orders", "supplier"],
    ),
    "imdb_simple": (
        [load_imdb_title, load_imdb_cast_info, load_imdb_movie_info,
         load_imdb_movie_companies, load_imdb_movie_info_idx2,
         load_imdb_movie_keyword],
        ["title", "cast_info", "movie_info", "movie_companies",
         "movie_info_idx", "movie_keyword"],
    ),
    "imdb": (
        [load_imdb_title, load_imdb_cast_info, load_imdb_movie_info,
         load_imdb_movie_companies, load_imdb_movie_info_idx,
         load_imdb_movie_keyword],
        ["title", "cast_info", "movie_info", "movie_companies",
         "movie_info_idx", "movie_keyword"],
    ),
}


def load_table(relation: str, data_path: str, nrows: Optional[int] = None):
    if relation not in LOADERS:
        raise ValueError(f"Unsupported dataset {relation!r}; have {list(LOADERS)}")
    return LOADERS[relation](data_path, nrows=nrows)
