"""Streaming drift monitor — cross-batch daily statistics with a
Page-Hinkley readout.

The batch twin is ``page_hinkley_daily`` (entry_queries): a
calendar-bounded fold over per-day revenue deviations from the running
mean.  Streaming needs the DAY AGGREGATES maintained incrementally;
the fold itself stays a cheap batch computation over the committed
(calendar-bounded) day table, recomputed on demand — the right split,
because the detector state is dimension-sized while the input is not.

Idempotence design: plain per-day SUM merges double-count when a batch
is re-delivered (the CMS failure mode; the HLL ingest is naturally
idempotent because its merge is MAX).  Here each micro-batch commits
CONTENT-KEYED partial aggregates — (day, batch content key, n, sum) —
where the key is derived from the batch's rows for that day.  Two key
formats exist (ADVICE r8/r9 hardening history):

* **v2** (new tables, marked by a ``kf`` column): the row count, the
  exact integer unit-sum, and an order-free crc32 sum over
  ``id ':' unit_value`` pairs — every id is BOUND to its value, so two
  batches whose values are permuted between the same ids key
  differently (ADVICE r9: the v1 order-free id-sum + value-sum key
  collided exactly there, wrongly dropping the second delivery as a
  replay).  NULL values bind as the literal ``'null'``, subsuming v1's
  conditional null-count term.
* **v1** (tables committed before the v2 format, detected by the
  ABSENCE of ``kf``): count + unit-sum + crc32 sum over ids alone,
  plus a null-count term appended only when nonzero.  Existing v1
  tables KEEP producing v1 keys — a format switch would let a replay
  of a pre-switch batch slip the anti-join and double-count — at the
  documented residual cost that an id↔value permutation of a prior
  batch still collides.  New tables always start at v2.

Replayed identical content maps to the SAME key and is anti-joined
away, so at-least-once RE-DELIVERY of a batch cannot inflate the
stats, regardless of checkpoint identity; a batch with the same ids
but different values keys differently and is (correctly) merged as new
content.  (The guarantee is per batch CONTENT: if a recovery
re-buckets old rows into differently-shaped batches, day partials key
differently — exactly-once under arbitrary re-bucketing needs
event-level dedup, which the corpus ingest sink provides for its
domain.)  Reading collapses partials with one dimension-sized groupBy.

Growth bound (ADVICE r7): the partials table gains one row per
(day, batch), so an unbounded stream would make the per-batch rewrite
O(total history).  ``merge_daily_partials`` therefore compacts: days
older than ``lateness_days`` behind the committed frontier collapse to
ONE compacted row per day (key = md5 over the sorted set of folded
batch keys), and incoming partials at-or-before the compaction
watermark are discarded — the standard watermark contract (too-late
re-deliveries are ignored).  Steady-state table size is
O(#days + partials inside the lateness window), so per-batch I/O is
bounded by the calendar, not the batch count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.table import VersionedParquetTable


def merge_daily_partials(
    table: VersionedParquetTable,
    batch_df: DataFrame,
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "value",
    lateness_days: int = 2,
    compact_after: int = 8,
) -> None:
    """Commit one micro-batch's per-day partial aggregates, keyed by
    the day's content (ids + values) so replays are no-ops.

    Compaction: once more than ``compact_after`` uncompacted partial
    rows sit at days ≤ (frontier − ``lateness_days``), each such day
    collapses to a single ``compacted`` row; the max compacted day is
    the watermark below which incoming partials are dropped."""
    unit_val = (F.col(val_col).cast("decimal(18,4)") * F.lit(10000)).cast("long")
    unit_sum = F.sum(unit_val)
    # v1 only: rows whose value is NULL (or overflows the decimal cast
    # to NULL) are skipped by the sum above, so without a separate term
    # two batches differing only in null/overflowing values would
    # collide to the same key (ADVICE r8).  Appended ONLY when nonzero
    # so the common all-non-null path keys byte-identically to the r8
    # format — no key migration for live v1 tables.
    null_vals = F.sum(
        F.when(F.col(val_col).cast("decimal(18,4)").isNull(), 1).otherwise(0)
    )
    key_v1 = F.md5(
        F.concat(
            F.count(F.lit(1)).cast("string"),
            F.lit("_"),
            F.coalesce(unit_sum.cast("string"), F.lit("null")),
            F.lit("_"),
            F.sum(F.crc32(F.col(id_col).cast("string"))).cast("string"),
            F.when(
                null_vals > 0,
                F.concat(F.lit("_x"), null_vals.cast("string")),
            ).otherwise(F.lit("")),
        )
    )
    # v2: the crc term binds each id to ITS value (ADVICE r9 — the v1
    # order-free id-sum + value-sum collides when values are permuted
    # between ids); NULL values bind as the 'null' sentinel, covering
    # the v1 null-count term's job too.
    key_v2 = F.md5(
        F.concat(
            F.count(F.lit(1)).cast("string"),
            F.lit("_"),
            F.coalesce(unit_sum.cast("string"), F.lit("null")),
            F.lit("_"),
            F.sum(
                F.crc32(
                    F.concat(
                        F.col(id_col).cast("string"),
                        F.lit(":"),
                        F.coalesce(unit_val.cast("string"), F.lit("null")),
                    )
                )
            ).cast("string"),
            F.lit("_v2"),
        )
    )

    def _partials(key: "F.Column", kf: int | None) -> DataFrame:
        p = (
            batch_df.groupBy(F.to_date(F.col(ts_col)).alias("d"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                unit_sum.cast("long").alias("su"),
                key.alias("batch_key"),
            )
            .withColumn("compacted", F.lit(False))
        )
        return p if kf is None else p.withColumn("kf", F.lit(kf).cast("int"))

    if not table.exists():
        table.write(_partials(key_v2, kf=2))
        return
    committed = table.read()
    legacy_upgrade = "compacted" not in committed.columns
    if legacy_upgrade:
        # Pre-r8 table (id-only batch keys, no compaction column).
        # Old-format keys can never match current keys, so a
        # re-delivery of a pre-upgrade batch would slip past the
        # anti-join and double-count its day (ADVICE r8).  Fold the
        # CLOSED legacy days — d ≤ legacy frontier − lateness_days —
        # behind the compaction watermark, so re-deliveries there are
        # dropped by the standard too-late rule.  The OPEN-window tail
        # (the last ``lateness_days`` legacy days) must stay live:
        # marking it compacted would raise the watermark to the legacy
        # frontier and silently drop genuinely NEW events for the
        # in-progress days, not just re-deliveries (ADVICE r9, the
        # data-loss direction).  Accepted bounded risk: a pre-upgrade
        # batch re-delivered INTO that open window double-counts once
        # (its old-format key can't match), a strictly better failure
        # mode than losing fresh data on a live sink.
        legacy_frontier = committed.agg(F.max("d")).first()[0]
        closed = (
            F.lit(False)
            if legacy_frontier is None
            else F.col("d") <= F.date_sub(F.lit(legacy_frontier), lateness_days)
        )
        committed = committed.withColumn("compacted", closed)
    # Key-format detection: tables created at v2 carry a ``kf`` column;
    # anything else (r8/r9 v1 tables, just-upgraded legacy tables —
    # whose remaining open-window keys are id-only) stays on v1 so
    # replays of its own committed batches still dedup exactly.
    v2 = "kf" in committed.columns
    part = _partials(key_v2 if v2 else key_v1, kf=2 if v2 else None)
    if v2:
        part = part.select(*committed.columns)
    # 1-row scalar: the compaction watermark (max compacted day).
    wm = committed.agg(F.max(F.when(F.col("compacted"), F.col("d")))).first()[0]
    incoming = part if wm is None else part.where(F.col("d") > F.lit(wm))
    novel = incoming.join(
        committed.select("d", "batch_key"), ["d", "batch_key"], "left_anti"
    )
    merged = committed.unionByName(novel)
    # 1-row scalar: the frontier INCLUDING this batch, so a new max day
    # immediately ages the days behind it into compaction range.
    frontier = merged.agg(F.max("d")).first()[0]
    if frontier is not None:
        cutoff = F.date_sub(F.lit(frontier), lateness_days)
        stale = (F.col("d") <= cutoff) & ~F.col("compacted")
        # 1-row scalar: is the stale partial population worth a rewrite?
        if merged.where(stale).count() > compact_after:
            aggs = [
                F.sum("n").cast("long").alias("n"),
                F.sum("su").cast("long").alias("su"),
                F.md5(
                    F.array_join(F.sort_array(F.collect_list("batch_key")), "|")
                ).alias("batch_key"),
                F.lit(True).alias("compacted"),
            ]
            if v2:
                aggs.append(F.max("kf").alias("kf"))
            collapsed = merged.where(stale).groupBy("d").agg(*aggs)
            merged = merged.where(~stale).unionByName(
                collapsed.select(*merged.columns)
            )
    table.write(merged)


def drift_ingest_sink(
    stream: DataFrame,
    table: VersionedParquetTable,
    checkpoint: str,
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "value",
):
    """readStream → foreachBatch content-keyed daily-partial merge."""
    return stream.writeStream.foreachBatch(
        lambda df, _epoch: merge_daily_partials(
            table, df, ts_col=ts_col, id_col=id_col, val_col=val_col
        )
    ).option("checkpointLocation", checkpoint)


def daily_stats(table: VersionedParquetTable) -> DataFrame:
    """Collapse the committed partials to one row per day."""
    return (
        table.read()
        .groupBy("d")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("su").cast("long").alias("su"),
        )
    )


def page_hinkley_curve(
    daily: DataFrame, delta: float = 100.0, lam: float = 5000.0
) -> DataFrame:
    """Page-Hinkley statistic over a (d, su)-shaped day frame — the
    identical calendar-bounded array fold as the batch query
    ``page_hinkley_daily`` (deviations from the running mean folded as
    raw doubles; alarm compares unrounded values)."""
    from pyspark.sql import Window

    wday = Window.orderBy("d")
    wcum = wday.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seq = daily.select(
        "d",
        F.col("su").alias("xu"),
        F.row_number().over(wday).alias("t"),
        F.sum("su").over(wcum).alias("cum"),
    )
    devs = seq.select(
        "d", "t",
        (
            (F.col("xu") * F.col("t") - F.col("cum")).cast("double")
            / F.col("t").cast("double")
            / F.lit(10000.0)
            - F.lit(delta)
        ).alias("dev"),
    )
    one = devs.agg(
        F.sort_array(F.collect_list(F.struct("d", "t", "dev"))).alias("a")
    )
    m = one.select(
        F.explode(
            F.expr(
                "transform(a, (x, i) -> struct(x.d AS d, x.t AS t,"
                " aggregate(slice(a, 1, i + 1), CAST(0.0 AS DOUBLE),"
                " (acc, y) -> acc + y.dev) AS m_val))"
            )
        ).alias("r")
    ).select("r.d", "r.t", "r.m_val")
    ph = m.select(
        "d", "t", "m_val", F.max("m_val").over(wcum).alias("mx")
    )
    return ph.select(
        "d",
        "m_val",
        (F.col("mx") - F.col("m_val")).alias("ph_val"),
        (F.col("mx") - F.col("m_val") > F.lit(lam)).alias("is_alarm"),
    )
