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


def enrich_stream_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join — the streaming twin of the batch
    broadcast dimension chain (q5-style fact ⋈ dim).

    The static side is re-read per micro-batch by Structured Streaming
    (so a dim refreshed on disk is picked up without restarting the
    query) and explicitly broadcast: the stream side never shuffles,
    which is what keeps a 100 TB/day stream enrichable — state-free,
    unlike stream-stream joins, so no watermark is required.
    """
    return stream.join(F.broadcast(dim), on=key, how=how)
