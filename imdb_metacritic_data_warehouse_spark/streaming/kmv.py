"""Streaming KMV sketch maintenance — per-source k-minimum-values
distinct sketches kept incrementally under at-least-once delivery.

The KMV merge (k smallest of the union of k-sets) is IDEMPOTENT,
COMMUTATIVE and ASSOCIATIVE — re-delivered batches and arbitrary
re-bucketing cannot change the final sketch, so unlike the CMS/daily
ingest sinks no content keying is needed (the HLL-ingest argument:
min-merge is naturally exactly-once).  The committed table is
dimension-sized (one row per source, a k-long array), so each
micro-batch's rewrite is O(sources · k) regardless of history.

Batch twin: ``kmv_overlap_sources`` (entry_queries/q24) builds the
same sketches in one pass; tests/test_streaming.py pins the streamed
table to it, including under batch replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.table import VersionedParquetTable

KMV_K = 64


def content_hash60(text_col) -> "F.Column":
    """The 60-bit content hash the KMV/jaccard machinery shares: first
    15 hex digits of md5 over the casefolded, whitespace-collapsed
    text."""
    norm = F.trim(F.regexp_replace(F.lower(text_col), r"\s+", " "))
    return F.conv(F.substring(F.md5(norm), 1, 15), 16, 10).cast("long")


def merge_kmv_sketches(
    table: VersionedParquetTable,
    batch_df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    k: int = KMV_K,
) -> None:
    """Fold one micro-batch's per-source k-min sets into the committed
    sketch table (min-merge: replay-safe by algebra, no batch keys)."""
    part = (
        batch_df.select(
            F.col(source_col).alias("source"),
            content_hash60(F.col(text_col)).alias("h"),
        )
        .groupBy("source")
        .agg(F.slice(F.sort_array(F.collect_set("h")), 1, k).alias("l"))
    )
    if table.exists():
        part = (
            table.read()
            .unionByName(part)
            .groupBy("source")
            .agg(
                F.slice(
                    F.array_sort(
                        F.array_distinct(F.flatten(F.collect_list("l")))
                    ),
                    1,
                    k,
                ).alias("l")
            )
        )
    table.write(part)


def kmv_ingest_sink(
    stream: DataFrame,
    table: VersionedParquetTable,
    checkpoint: str,
    source_col: str = "source",
    text_col: str = "text",
    k: int = KMV_K,
):
    """readStream → foreachBatch KMV min-merge."""
    return stream.writeStream.foreachBatch(
        lambda df, _epoch: merge_kmv_sketches(
            table, df, source_col=source_col, text_col=text_col, k=k
        )
    ).option("checkpointLocation", checkpoint)
