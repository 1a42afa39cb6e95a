"""Data profiling — per-column statistics and histograms.

The warehouse-operations pass every ingest needs (drift detection,
bucket sizing, quality dashboards).  Scale shape:

- ``profile_numeric``: ONE scan computes every column's aggregates
  simultaneously (a union-per-column formulation would rescan the
  table N times — Catalyst has no cross-branch CSE, NOTES.md); the
  single wide result row is then unpivoted driver-cheaply with
  ``stack``.  Multiple count-distincts expand map-side (Spark's
  Expand), still one pass over the data.
- ``fixed_histogram``: min/max via a broadcast 1-row aggregate (the J9
  scalar-subquery pattern), then bucket = ``floor((x−lo)/step)`` —
  pure arithmetic, one groupBy(bucket) shuffle of at most ``bins``
  partial rows per task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_numeric(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-format numeric profile: one row per column with
    (n, n_nonnull, n_distinct, min, max, avg) — a single table scan."""
    aggs = []
    for c in cols:
        x = F.col(c).cast("double")
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.count(x).alias(f"__nn_{c}"),
            F.countDistinct(x).alias(f"__nd_{c}"),
            F.round(F.min(x), 6).alias(f"__mn_{c}"),
            F.round(F.max(x), 6).alias(f"__mx_{c}"),
            F.round(F.avg(x), 6).alias(f"__av_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n_{c}, __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}, __av_{c}"
        for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col, n, n_nonnull, n_distinct, min_v, max_v, avg_v)"
        )
    )


def fixed_histogram(df: DataFrame, col: str, bins: int = 10) -> DataFrame:
    """Equi-width histogram over ``col``: (bucket, n), bucket ∈ [0, bins).
    The max value folds into the last bucket."""
    x = F.col(col).cast("double")
    mm = df.agg(F.min(x).alias("lo"), F.max(x).alias("hi"))
    bucket = F.least(
        F.floor((x - F.col("lo")) / ((F.col("hi") - F.col("lo")) / bins)).cast("int"),
        F.lit(bins - 1),
    )
    return (
        df.select(x.alias(col))
        .crossJoin(F.broadcast(mm))
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
