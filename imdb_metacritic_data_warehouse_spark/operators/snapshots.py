"""Snapshot filters (P6–P8, SURVEY.md §2.2).

The marts select "current" rows via scalar subqueries —
``valid_to IN (SELECT max(valid_to) ...)`` (``mart/movie_data.sql:14``)
and latest / two-latest ``valid_from`` snapshots
(``mart/rating_slide.sql:10,23``).

Spark: a 1-row aggregate cross-joined (broadcast — it's one row) keeps
the whole thing declarative: no driver collect, no action, and Catalyst
executes the subquery once and broadcasts the scalar, exactly what PG
does with an uncorrelated scalar subquery.  ``filter_top_snapshots``
generalizes P8: the distinct snapshot values are one-per-batch (tiny),
ranked and semi-joined back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def filter_latest(df: DataFrame, col: str) -> DataFrame:
    """``WHERE col IN (SELECT max(col) FROM df)`` — P6/P7."""
    mx = df.agg(F.max(col).alias("__mx"))
    return df.join(F.broadcast(mx), F.col(col) == F.col("__mx"), "inner").drop("__mx")


def filter_top_snapshots(df: DataFrame, col: str, k: int = 2) -> DataFrame:
    """Keep rows whose ``col`` is among the ``k`` largest distinct
    values — P8 (``mart/rating_slide.sql:23`` uses k=2 via nested
    max-subqueries).  Distinct snapshot values (one per load batch) are
    ranked with a window over the *deduplicated* set, so the
    single-partition sort touches only #batches rows, then broadcast
    semi-joined back — scales regardless of table size."""
    snaps = (
        df.select(col)
        .distinct()
        .withColumn("__rk", F.dense_rank().over(Window.orderBy(F.desc(col))))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )
    return df.join(F.broadcast(snaps), on=col, how="left_semi")
