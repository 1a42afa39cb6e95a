"""Sequence packing — turning a document corpus into fixed-token-budget
training sequences (the "concatenate everything, cut every B tokens"
layout LLM pretraining uses).

The prefix-dependent part — where does each document start in the
global token stream? — is a global cumulative sum.  A bare
``sum() over (order by ...)`` window pulls every row through ONE task
(the same straggler as the reference's un-partitioned row_number,
``mart/rating_slide.sql:7``); ``global_cumsum`` is the two-phase
version (range partition → local cumsum → broadcast per-partition
offsets), the prefix-sum twin of ``operators/rank.global_row_number``.

Given each document's [start, end) token span, its sequence assignments
are pure arithmetic: it lands in sequences ``floor(start/B)`` through
``floor((end-1)/B)``, contributing ``min(end,(s+1)B) − max(start,sB)``
tokens to sequence ``s`` — one ``sequence()`` explode, no shuffle
beyond the cumsum's.  Long documents straddle a boundary and split,
exactly like the training layout they feed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_cumsum(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    out_col: str = "cumsum",
    two_phase: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach the inclusive prefix sum of ``value_col`` under a total
    order (``order_cols`` must be deterministic and unique-prefixed,
    like global_row_number's)."""
    if not two_phase:
        return df.withColumn(
            out_col,
            F.sum(value_col).over(
                Window.orderBy(*order_cols).rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # persist() pins ONE execution of the range exchange for both the
    # local-cumsum branch and the offsets branch — repartitionByRange's
    # sampled bounds differ between re-executions (RDD-id-seeded), which
    # double/drops rows near partition bounds (found as an off-by-one in
    # ks_drift_orders' ECDF; same hazard as rank.global_row_number).
    parted = df.repartitionByRange(n, *order_cols).persist()
    pid = F.spark_partition_id()
    local = parted.withColumn("__pid", pid).withColumn(
        "__local_sum",
        F.sum(value_col).over(
            Window.partitionBy(pid)
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    offsets = (
        local.groupBy("__pid")
        .agg(F.sum(value_col).alias("__total"))
        .withColumn(
            "__offset",
            F.sum("__total").over(
                Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .select("__pid", F.coalesce("__offset", F.lit(0)).alias("__offset"))
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__local_sum") + F.col("__offset")).cast("long"))
        .drop("__pid", "__local_sum", "__offset")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    order_cols: list[Column] | None = None,
) -> DataFrame:
    """Assign each document its training-sequence span under the
    concat-and-cut layout.

    Output: one row per (document, sequence) pair —
    ``(id_col, seq_id, tokens_in_seq, starts_here)`` where
    ``starts_here`` marks the sequence holding the document's first
    token.  Rows with a non-positive token count are dropped (nothing
    to pack).
    """
    order_cols = order_cols or [F.col(id_col)]
    spanned = (
        global_cumsum(
            df.filter(F.col(token_col) > 0), order_cols, token_col, out_col="__end"
        )
        .withColumn("__start", F.col("__end") - F.col(token_col))
    )
    b = F.lit(budget).cast("long")
    first_seq = F.floor(F.col("__start") / b)
    last_seq = F.floor((F.col("__end") - 1) / b)
    seqs = spanned.select(
        id_col,
        "__start",
        "__end",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    return seqs.select(
        id_col,
        "seq_id",
        (
            F.least(F.col("__end"), (F.col("seq_id") + 1) * b)
            - F.greatest(F.col("__start"), F.col("seq_id") * b)
        ).alias("tokens_in_seq"),
        (F.col("seq_id") == F.floor(F.col("__start") / b)).alias("starts_here"),
    )


def plan_compaction(
    df: DataFrame,
    id_col: str,
    size_col: str,
    target_bytes: int,
    order_cols: list[Column] | None = None,
) -> DataFrame:
    """Small-file compaction planning — the table-maintenance step that
    keeps a 100 TB parquet layout healthy (thousands of tiny files per
    partition kill scan throughput and driver planning time).

    Given a file inventory (id, size), assign every file to a merge
    group of ~``target_bytes``: files are laid out in a deterministic
    total order, each gets its global byte offset via the two-phase
    ``global_cumsum`` (no single-task window), and its group is plain
    arithmetic ``floor(start / target)`` — files are never split
    (unlike ``pack_sequences``), so a group can overshoot by at most
    one file.  Output: (id, size, bin_id, bin_start_offset) — the
    driver of an actual rewrite job reads this plan and merges each
    bin in one task.
    """
    order_cols = order_cols or [F.col(id_col)]
    spanned = global_cumsum(
        df.filter(F.col(size_col) > 0), order_cols, size_col, out_col="__end"
    ).withColumn("__start", F.col("__end") - F.col(size_col))
    t = F.lit(target_bytes).cast("long")
    return spanned.select(
        id_col,
        size_col,
        F.floor(F.col("__start") / t).cast("long").alias("bin_id"),
        F.col("__start").alias("bin_start_offset"),
    )


def deterministic_shuffle(
    df: DataFrame, id_col: str, salt: str, out_col: str = "pos"
) -> DataFrame:
    """Deterministic global permutation for training-order shuffling:
    position = rank under ``md5(id || salt)`` (uniform, engine-portable,
    reshuffled by changing ``salt`` — no ``rand()``, so reruns and
    retried tasks agree).  Two-phase ranking via global_row_number."""
    from .rank import global_row_number

    keyed = df.withColumn(
        "__shuf", F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    )
    return global_row_number(
        keyed, [F.col("__shuf"), F.col(id_col)], out_col=out_col
    ).drop("__shuf")
