"""Count-min sketch — mergeable heavy-hitter counting for streams and
100 TB fact tables.

A CMS is a ``d × w`` grid of counters; each occurrence of a key
increments one counter per row (``bucket = h_seed(key) % w``); the
estimate for a key is the MIN over its ``d`` counters, which
overestimates by at most ``ε·N`` (``ε = e/w``) with probability
``1 − δ`` (``δ = e^{-d}``) — the classic Cormode-Muthukrishnan bound.

Spark-first shape: the grid is a (seed, bucket) → count aggregate.
The per-row ``d``-way expansion happens map-side and is immediately
collapsed by partial aggregation (hash-agg combine), so the shuffle
carries at most ``d·w`` rows PER TASK no matter how many fact rows the
task scanned — the same reason the sketch works as streaming state.
Counters are exact integers, so the sketch (and the min-estimate) is
bit-reproducible on any engine that shares the hash; we hash with
md5-derived 60-bit ints (the repo-wide engine-portable hash family,
``operators/dedup.py:299``), never ``xxhash64`` (Spark-private).

Reference parity: the reference has no sketches at all (it COUNT(*)s
postgres tables, e.g. ``mart/genre_metrics.sql``); this is part of the
100 TB extension surface, paired with an exact-count audit query so
the error contract is oracle-checkable rather than asserted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, seed: int, width: int) -> Column:
    """Engine-portable bucket hash: first 60 bits of md5(seed:key).

    DuckDB twin: ``CAST(CONCAT('0x', substr(md5(seed || ':' || key),
    1, 15)) AS BIGINT) % width``.
    """
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(seed)), key.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return (h % width).cast("int")


def count_min_sketch(
    df: DataFrame,
    key: Column,
    depth: int = 3,
    width: int = 64,
    weight: Column | None = None,
) -> DataFrame:
    """Build the sketch grid: one row per touched (seed, bucket) cell.

    ``explode`` fans each fact row into ``depth`` cell increments, but
    the immediately following groupBy collapses them map-side — the
    exchange after partial aggregation is ≤ depth·width rows per task.
    """
    w = weight if weight is not None else F.lit(1)
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        _bucket(key, s, width).alias("bucket"),
                    )
                    for s in range(depth)
                ]
            )
        ).alias("c"),
        w.cast("long").alias("__w"),
    )
    return (
        cells.groupBy(F.col("c.seed").alias("seed"), F.col("c.bucket").alias("bucket"))
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 64,
    out_col: str = "est",
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: est = MIN over
    the key's ``depth`` counters.  The sketch is grid-sized (≤ d·w
    rows) → broadcast; the probe never shuffles ``keys``.

    A key whose bucket cell is absent from the sketch (possible only
    when the key itself was never inserted) estimates 0 via coalesce.
    """
    probes = keys.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        _bucket(F.col(key_col), s, width).alias("bucket"),
                    )
                    for s in range(depth)
                ]
            )
        ).alias("p"),
    )
    joined = probes.join(
        F.broadcast(sketch),
        (F.col("p.seed") == F.col("seed")) & (F.col("p.bucket") == F.col("bucket")),
        "left",
    )
    group_cols = [c for c in keys.columns]
    return joined.groupBy(*group_cols).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out_col)
    )
