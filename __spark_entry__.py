"""Driver contract for the spark-graft builder (PySpark target).

``entry``    — flagship query smoke-check at sf0.001.
``queries``  — one entry per implemented operator from SURVEY.md §2,
               mapped onto the driver's TPC-H-ish tables.
``oracle_sql`` — matching DuckDB SQL for the correctness gate.

Implementation lives in ``imdb_metacritic_data_warehouse_spark``; this
module only binds operators to the driver's tables.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from imdb_metacritic_data_warehouse_spark.entry_queries import (  # noqa: E402
    ORACLES,
    QUERIES,
)


def _load(spark: SparkSession, sf_dir: str, *tables: str) -> dict[str, DataFrame]:
    from imdb_metacritic_data_warehouse_spark.session import ensure_engine_confs

    ensure_engine_confs(spark)  # driver-owned sessions may default ANSI on
    return {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in tables}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: revenue per nation —
    the reference's mart shape (dimension chain ⋈ facts, agg, rank)
    on the driver's star schema.  Broadcast dims, one shuffle."""
    t = _load(spark, "/root/testdata/sf0.001", "region", "nation", "customer",
              "orders", "lineitem")
    return (
        t["lineitem"]
        .join(t["orders"], t["lineitem"].l_orderkey == t["orders"].o_orderkey)
        .join(t["customer"], t["orders"].o_custkey == t["customer"].c_custkey)
        .join(F.broadcast(t["nation"]),
              t["customer"].c_nationkey == t["nation"].n_nationkey)
        .join(F.broadcast(t["region"]),
              t["nation"].n_regionkey == t["region"].r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .orderBy(F.desc("revenue"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
