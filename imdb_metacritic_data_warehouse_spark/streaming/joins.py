"""Stream-stream joins — watermark-bounded state.

The reference has no streaming at all (SURVEY.md §2.11); this is the
Spark-native extension for correlating two live streams (clicks ⋈
purchases, impressions ⋈ conversions).  The interval condition plus
watermarks is what makes the join's state store BOUNDED: each side
keeps only rows younger than (watermark − interval), so state size is
O(rate × window), independent of stream lifetime — the property that
matters at production scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback_seconds: int,
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner join of two streams on ``key`` where ``right_ts`` falls in
    ``[left_ts − lookback, left_ts]`` — the streaming twin of
    ``operators/asof.range_join_bucketed``.

    Both sides MUST be watermarked (Spark refuses unbounded
    stream-stream state otherwise); the join condition's time bound is
    what lets the state store evict.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] <= lw[left_ts])
        & (rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {lookback_seconds} SECOND"))
    )
    return lw.join(rw, cond, "inner")
