"""Incremental mart maintenance: merge(partial states) ≡ full recompute.

The operator's contract is inductive — folding batches one at a time
into the state must land on exactly the aggregate a full scan would
produce, for any batch split.  (SURVEY.md §2.9's write path rebuilds
marts from full scans, ddl.py:559-570; this is the delta-bounded
replacement.)
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from imdb_metacritic_data_warehouse_spark.operators.incremental import (
    incremental_refresh,
    merge_state,
    partial_state,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

def _spec():
    # built lazily: Column construction needs an active SparkContext
    return {
        "n": ("sum", F.lit(1).cast("long")),
        "sum_price": ("sum", F.col("o_totalprice").cast("decimal(18,4)")),
        "min_price": ("min", F.col("o_totalprice")),
        "max_price": ("max", F.col("o_totalprice")),
    }


KEYS = ["o_orderpriority"]


def _rows(df):
    out = {}
    for r in df.collect():
        out[r["o_orderpriority"]] = (
            r["n"],
            float(r["sum_price"]),
            r["min_price"],
            r["max_price"],
        )
    return out


def test_three_batch_fold_equals_full_scan(spark):
    spec = _spec()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    # arbitrary 3-way split on the key's hash — batches are disjoint,
    # cover everything, and interleave every group
    b = [orders.filter(F.abs(F.hash("o_orderkey")) % 3 == i) for i in range(3)]

    state = None
    for batch in b:
        state = incremental_refresh(state, batch, KEYS, spec)

    full = partial_state(orders, KEYS, spec)
    assert _rows(state) == _rows(full)


def test_merge_is_order_insensitive(spark):
    spec = _spec()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    early = orders.filter(F.col("o_orderdate") < "1997-01-01")
    late = orders.filter(F.col("o_orderdate") >= "1997-01-01")
    s_early = partial_state(early, KEYS, spec)
    s_late = partial_state(late, KEYS, spec)
    ab = merge_state(s_early, s_late, KEYS, spec)
    ba = merge_state(s_late, s_early, KEYS, spec)
    assert _rows(ab) == _rows(ba)


def test_empty_delta_is_identity(spark):
    spec = _spec()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    state = partial_state(orders, KEYS, spec)
    refreshed = incremental_refresh(state, orders.filter(F.lit(False)), KEYS, spec)
    assert _rows(refreshed) == _rows(state)
