"""Streaming corpus ingest with cross-batch exact dedup.

The streaming twin of the batch curation chain ``fingerprint →
dedup_exact`` (operators/text.fingerprint, operators/dedup.dedup_exact):
documents arrive as a stream, each micro-batch drops its own internal
duplicates AND everything already committed, and only novel documents
append to the versioned corpus.  This is the ingest shape of a
continuously-crawled training corpus — the dedup state is the
committed table itself, not an in-memory map, so a restart resumes
from the last committed version with no state to rebuild.

Per micro-batch:

1. fingerprint = md5 of the casefolded, whitespace-collapsed text
   (identical rule to the batch operator — a doc seen by EITHER path
   gets the same key),
2. within-batch canonicalization: min doc_id per fingerprint
   (deterministic — retried batches pick the same survivors),
3. LEFT ANTI join against the committed fingerprints,
4. commit survivors.

Scale notes: the anti-join broadcasts nothing — it hash-partitions on
the fingerprint, which is also how a 100 TB corpus would bucket its
fingerprint column (making step 3 Exchange-free on the committed
side).  ``VersionedParquetTable.write`` commits a full new version
(the engine's truncate-then-load contract); a 100 TB deployment swaps
that one call for a partition append — steps 1–3 are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.text import fingerprint
from ..sources.table import VersionedParquetTable


def dedup_ingest_batch(
    table: VersionedParquetTable,
    batch_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Ingest one micro-batch: within-batch + cross-batch exact dedup,
    then commit the novel documents."""
    fp = batch_df.withColumn("__fp", fingerprint(F.col(text_col)))
    canon = (
        fp.groupBy("__fp")
        .agg(
            F.min_by(F.struct(*batch_df.columns), F.col(id_col)).alias("__r")
        )
        .select("__fp", "__r.*")
    )
    if table.exists():
        committed = table.read()
        novel = canon.join(committed.select("__fp"), "__fp", "left_anti")
        table.write(committed.unionByName(novel))
    else:
        table.write(canon)


def corpus_ingest_sink(
    stream_df: DataFrame,
    table: VersionedParquetTable,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint: str | None = None,
):
    """Attach the dedup ingest as a ``foreachBatch`` sink."""

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        dedup_ingest_batch(table, batch_df, id_col, text_col)

    writer = stream_df.writeStream.foreachBatch(handle).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def merge_cms_batch(
    table: VersionedParquetTable,
    batch_df: DataFrame,
    key,
    depth: int = 3,
    width: int = 64,
) -> None:
    """Fold one micro-batch into a committed count-min sketch — the
    streaming face of ``operators/sketch.count_min_sketch``.  CMS cells
    are sums, so the merge is cell-wise addition: sketch the batch,
    FULL OUTER join the (≤ d·w-row) committed grid, add.  The grid is
    the ONLY state (bounded, engine-portable), so heavy-hitter queries
    over an unbounded stream never replay history, and a restart
    resumes from the committed table exactly like the dedup ingest.
    """
    from ..operators.sketch import count_min_sketch

    delta = count_min_sketch(batch_df, key, depth=depth, width=width)
    if table.exists():
        prev = table.read().withColumnRenamed("cnt", "__prev")
        merged = (
            delta.withColumnRenamed("cnt", "__new")
            .join(prev, ["seed", "bucket"], "full_outer")
            .select(
                "seed",
                "bucket",
                (
                    F.coalesce(F.col("__new"), F.lit(0))
                    + F.coalesce(F.col("__prev"), F.lit(0))
                ).alias("cnt"),
            )
        )
        table.write(merged)
    else:
        table.write(delta)


def cms_ingest_sink(
    stream_df: DataFrame,
    table: VersionedParquetTable,
    key_col: str,
    depth: int = 3,
    width: int = 64,
    checkpoint: str | None = None,
):
    """Attach the incremental sketch merge as a ``foreachBatch`` sink."""

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        merge_cms_batch(table, batch_df, F.col(key_col), depth, width)

    writer = stream_df.writeStream.foreachBatch(handle).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def merge_hll_batch(
    table: VersionedParquetTable,
    batch_df: DataFrame,
    group_cols: list[str],
    key_col: str,
    p: int = 8,
) -> None:
    """Fold one micro-batch into a committed HyperLogLog register table
    — the streaming face of ``operators/sketch.hll_register_maxes``.
    HLL registers are MAXes, so the merge is bucket-wise MAX (idempotent
    AND commutative — a replayed micro-batch cannot corrupt the sketch,
    unlike the CMS sum which relies on exactly-once foreachBatch).  The
    register table (≤ groups·2^p rows) is the only state, so "distinct
    keys to date" over an unbounded stream never replays history."""
    from ..operators.sketch import hll_merge_registers, hll_register_maxes

    delta = hll_register_maxes(batch_df, group_cols, key_col, p=p)
    if table.exists():
        table.write(hll_merge_registers(table.read(), delta, group_cols))
    else:
        table.write(delta)


def hll_ingest_sink(
    stream_df: DataFrame,
    table: VersionedParquetTable,
    group_cols: list[str],
    key_col: str,
    p: int = 8,
    checkpoint: str | None = None,
):
    """Attach the incremental HLL register merge as a ``foreachBatch``
    sink; query cardinality-to-date any time with
    ``operators/sketch.hll_estimate(table.read(), group_cols)``."""

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        merge_hll_batch(table, batch_df, group_cols, key_col, p=p)

    writer = stream_df.writeStream.foreachBatch(handle).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer
