"""Scale smoke — operators at 10× the bench scale factor.

Replicates the sf0.1 fact table in-memory to ~6M rows and runs the
shapes whose scale behavior matters (partial-agg rollup, SCD2 merge,
two-phase global rank).  Verifies exact row/aggregate arithmetic at a
size where a wrong plan (single-partition funnel, no map-side combine)
would visibly degrade — correctness assertions double as the guard
that the plans still complete promptly at 10×.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"
COPIES = 10


@pytest.fixture(scope="module")
def big_lineitem(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_quantity"
    )
    # disjoint key ranges per copy so downstream keys stay unique
    copies = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * 10_000_000))
        for i in range(COPIES)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def test_aggregate_at_10x(spark, big_lineitem):
    base = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("s"))
    )
    big = big_lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("s"),
    )
    b = {r.l_returnflag: r for r in base.collect()}
    g = {r.l_returnflag: r for r in big.collect()}
    assert set(b) == set(g)
    for k in b:
        assert g[k].n == COPIES * b[k].n
        assert g[k].s == COPIES * b[k].s  # decimal: exact at any partitioning


def test_scd2_merge_at_10x(spark, big_lineitem):
    from imdb_metacritic_data_warehouse_spark.operators.scd2 import scd2_apply

    snap = big_lineitem.select(
        F.concat_ws("#", "l_orderkey", "l_linenumber").alias("pk"),
        F.col("l_returnflag").alias("x"),
    ).dropDuplicates(["pk"])
    n = snap.count()
    s1 = scd2_apply(None, snap, "pk", ["x"], "2024-01-01 00:00:00")
    changed = snap.withColumn(
        "x", F.when(F.substring("pk", 1, 1) == "1", F.lit("Z")).otherwise(F.col("x"))
    )
    s2 = scd2_apply(s1, changed, "pk", ["x"], "2024-02-01 00:00:00")
    open_rows = s2.filter(F.col("valid_to").cast("string").startswith("9999"))
    assert open_rows.count() == n  # exactly one open row per key survives


def test_global_rank_at_10x(spark, big_lineitem):
    from imdb_metacritic_data_warehouse_spark.operators.rank import global_row_number

    keys = big_lineitem.select("l_orderkey").distinct()
    n = keys.count()
    ranked = global_row_number(keys, [F.asc("l_orderkey")], out_col="rn")
    stats = ranked.agg(
        F.min("rn").alias("lo"), F.max("rn").alias("hi"), F.countDistinct("rn").alias("d")
    ).collect()[0]
    assert (stats.lo, stats.hi, stats.d) == (1, n, n)  # a true permutation of 1..n
