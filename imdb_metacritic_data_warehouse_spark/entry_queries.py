"""Operator → driver-table query surface (the correctness gate).

Each entry maps one operator family from SURVEY.md §2 onto the driver's
TPC-H-ish tables, with a DuckDB-equivalent oracle SQL string.  Naming
and typing rules (driver compares row-count + schema + value-hash):

- every computed column aliased identically on both sides;
- monetary aggregates computed in DECIMAL (exact, order-insensitive)
  then rounded and cast to DOUBLE so both engines emit bit-identical
  doubles regardless of summation order;
- deterministic total orders everywhere a rank/argmax breaks ties.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.keys import hash_key
from .operators.argmax import arg_max
from .operators.rank import global_row_number
from .operators.scd2 import insert_only_merge, scd2_apply
from .operators.snapshots import filter_latest, filter_top_snapshots

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _dec(col):
    """Exact money arithmetic: decimal in, decimal out."""
    return F.col(col).cast("decimal(18,4)")


# ---------------------------------------------------------------------------
# A1-A4/P1/O1 — TPC-H Q1-shaped pricing summary (the reference's
# "aggregate a fact table by low-cardinality keys" mart shape).
@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_disc_price,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(_dec("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(_dec("l_extendedprice")), 2).cast("double").alias("sum_base_price"),
            F.round(
                F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))), 2
            ).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# J1/J4/A1/O1 — dimension-chain join + agg (mart/genre_metrics.sql shape).
@query(
    "q5_revenue_per_nation",
    """
    SELECT r_name AS region, n_name AS nation,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue,
           COUNT(DISTINCT o_orderkey) AS n_orders
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def q5_revenue_per_nation(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))), 2)
            .cast("double")
            .alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


# F1/F2/P2 — md5 hash-key generation with PG-`||` NULL propagation.
@query(
    "hash_key_generation",
    """
    SELECT c_custkey,
           md5(c_name || CAST(c_nationkey AS VARCHAR)) AS cust_hash
    FROM customer
    WHERE md5(c_name || CAST(c_nationkey AS VARCHAR)) IS NOT NULL
    """,
)
def hash_key_generation(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    k = hash_key("c_name", "c_nationkey")
    return c.select("c_custkey", k.alias("cust_hash")).filter(k.isNotNull())


# U1 — UNION with dedup (core/movie_hub.sql:6 shape).
@query(
    "union_distinct",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    UNION
    SELECT o_custkey FROM orders WHERE o_totalprice > 200000
    """,
)
def union_distinct(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 200000).select("o_custkey")
    return a.unionByName(b).distinct()


# P3/P4 — NOT-IN filter + column-rotation repair (etl_layer_transfer.py:10-20),
# mapped onto lineitem flags: pretend only ('A','N') are canonical, rotate 'R'
# rows (flag↔status), then "delete" still-bad rows.
@query(
    "rotation_repair",
    """
    WITH keep AS (
      SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus
      FROM lineitem WHERE l_returnflag IN ('A','N') OR l_returnflag IS NULL
    ),
    rotated AS (
      SELECT l_orderkey, l_linenumber, l_linestatus AS l_returnflag,
             l_returnflag AS l_linestatus
      FROM lineitem
      WHERE l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A','N')
    ),
    rotated_kept AS (
      SELECT * FROM rotated WHERE l_returnflag IN ('A','N') OR l_returnflag IS NULL
    )
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM (SELECT * FROM keep UNION ALL SELECT * FROM rotated_kept)
    GROUP BY l_returnflag, l_linestatus
    """,
)
def rotation_repair(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus"
    )
    canonical = ["A", "N"]
    bad = F.col("l_returnflag").isNotNull() & ~F.col("l_returnflag").isin(canonical)
    keep = li.filter(~bad)
    rotated = li.filter(bad).select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_linestatus").alias("l_returnflag"),
        F.col("l_returnflag").alias("l_linestatus"),
    )
    rotated_kept = rotated.filter(
        F.col("l_returnflag").isNull() | F.col("l_returnflag").isin(canonical)
    )
    return (
        keep.unionByName(rotated_kept)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# P6 — "current records" scalar-subquery filter (mart/movie_data.sql:14).
@query(
    "latest_snapshot_filter",
    """
    SELECT l_orderkey, l_linenumber, l_shipdate
    FROM lineitem
    WHERE l_shipdate IN (SELECT MAX(l_shipdate) FROM lineitem)
    """,
)
def latest_snapshot_filter(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return filter_latest(li, "l_shipdate").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )


# P8 — two-latest-snapshots membership (mart/rating_slide.sql:23).
@query(
    "top2_snapshots_filter",
    """
    SELECT o_orderkey, o_orderdate
    FROM orders
    WHERE o_orderdate IN (
      SELECT DISTINCT o_orderdate FROM orders ORDER BY o_orderdate DESC LIMIT 2
    )
    """,
)
def top2_snapshots_filter(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return filter_top_snapshots(o, "o_orderdate", k=2).select(
        "o_orderkey", "o_orderdate"
    )


# P9/J7 — anti-join (insert-only "new keys" detection, ddl.py:552).
@query(
    "anti_join_new_keys",
    """
    SELECT c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join_new_keys(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


# J5/F7 — FULL OUTER snapshot comparison + coalesced key
# (mart/rating_slide.sql:27-34), halves split by orderkey parity.
@query(
    "full_outer_snapshots",
    """
    WITH cur AS (
      SELECT o_custkey, CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS cur_total
      FROM orders WHERE o_orderkey % 2 = 0 GROUP BY o_custkey
    ),
    prev AS (
      SELECT o_custkey, CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS prev_total
      FROM orders WHERE o_orderkey % 2 = 1 GROUP BY o_custkey
    )
    SELECT COALESCE(cur.o_custkey, prev.o_custkey) AS o_custkey,
           cur.cur_total, prev.prev_total
    FROM cur FULL JOIN prev ON cur.o_custkey = prev.o_custkey
    """,
)
def full_outer_snapshots(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")

    def half(parity, out):
        return (
            o.filter(F.col("o_orderkey") % 2 == parity)
            .groupBy("o_custkey")
            .agg(F.round(F.sum(_dec("o_totalprice")), 2).cast("double").alias(out))
        )

    cur, prev = half(0, "cur_total").alias("cur"), half(1, "prev_total").alias("prev")
    return cur.join(
        prev, F.col("cur.o_custkey") == F.col("prev.o_custkey"), "full_outer"
    ).select(
        F.coalesce(F.col("cur.o_custkey"), F.col("prev.o_custkey")).alias("o_custkey"),
        "cur_total",
        "prev_total",
    )


# J8/A7 — argmax per group via one-pass max_by (genre_metrics rewrite).
@query(
    "argmax_per_group",
    """
    SELECT n_name AS nation,
           (SELECT c.c_name FROM customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c.c_acctbal DESC, c.c_name DESC LIMIT 1) AS richest_customer
    FROM nation n
    WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey)
    """,
)
def argmax_per_group(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    per_nation = c.groupBy("c_nationkey").agg(
        arg_max(F.col("c_name"), F.struct(F.col("c_acctbal"), F.col("c_name"))).alias(
            "richest_customer"
        )
    )
    return per_nation.join(F.broadcast(n), per_nation.c_nationkey == n.n_nationkey).select(
        F.col("n_name").alias("nation"), "richest_customer"
    )


# W1 — global leaderboard rank, two-phase scalable implementation
# (mart/rating_slide.sql:7 rewrite).
@query(
    "global_rank_leaderboard",
    """
    SELECT s_suppkey, s_name,
           ROW_NUMBER() OVER (ORDER BY s_acctbal DESC, s_suppkey ASC) AS place
    FROM supplier
    """,
)
def global_rank_leaderboard(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    ranked = global_row_number(
        s, [F.desc("s_acctbal"), F.asc("s_suppkey")], out_col="place"
    )
    return ranked.select("s_suppkey", "s_name", "place")


# J9 — uncorrelated scalar subquery as a value.
@query(
    "scalar_subquery_filter",
    """
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_acctbal > (SELECT AVG(CAST(c_acctbal AS DECIMAL(18,4))) FROM customer)
    """,
)
def scalar_subquery_filter(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    avg_bal = c.agg(F.avg(_dec("c_acctbal")).alias("__avg"))
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .select("c_custkey", "c_acctbal")
    )


# F4/F5 — stringified-list explode → hub build (core/genre_hub.sql shape):
# p_type words play the genre list role.
@query(
    "explode_tokens_hub",
    """
    SELECT md5(word) AS token_id, word AS token
    FROM (
      SELECT DISTINCT unnest(string_split(p_type, ' ')) AS word FROM part
    ) WHERE word <> ''
    """,
)
def explode_tokens_hub(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    words = (
        p.select(F.explode(F.split(F.col("p_type"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )
    return words.select(F.md5("word").alias("token_id"), F.col("word").alias("token"))


# §2.9 — the SCD2 merge itself, specified declaratively in the oracle.
# Batch 1 = orders with orderkey%3!=0; batch 2 = all orders with priority
# rewritten for orderkey%5==0 (changed rows). Vanished/new/changed/unchanged
# all occur.
_SCD2_T0, _SCD2_T1 = "2024-01-01 00:00:00", "2024-02-01 00:00:00"

@query(
    "scd2_merge_orders",
    f"""
    WITH b1 AS (
      SELECT o_orderkey AS pk, o_orderpriority AS prio, o_orderstatus AS status
      FROM orders WHERE o_orderkey % 3 <> 0
    ),
    b2 AS (
      SELECT o_orderkey AS pk,
             CASE WHEN o_orderkey % 5 = 0 THEN 'X-CHANGED' ELSE o_orderpriority END AS prio,
             o_orderstatus AS status
      FROM orders
    ),
    state1 AS (
      SELECT pk, prio, status,
             TIMESTAMP '{_SCD2_T0}' AS valid_from,
             TIMESTAMP '9999-12-31 00:00:00' AS valid_to
      FROM b1
    ),
    closed AS (
      SELECT s.pk, s.prio, s.status, s.valid_from, TIMESTAMP '{_SCD2_T1}' AS valid_to
      FROM state1 s LEFT JOIN b2 ON s.pk = b2.pk
      WHERE b2.pk IS NULL
         OR (s.prio IS DISTINCT FROM b2.prio OR s.status IS DISTINCT FROM b2.status)
    ),
    kept AS (
      SELECT s.* FROM state1 s JOIN b2 ON s.pk = b2.pk
      WHERE NOT (s.prio IS DISTINCT FROM b2.prio OR s.status IS DISTINCT FROM b2.status)
    ),
    inserted AS (
      SELECT b2.pk, b2.prio, b2.status,
             TIMESTAMP '{_SCD2_T1}' AS valid_from,
             TIMESTAMP '9999-12-31 00:00:00' AS valid_to
      FROM b2 LEFT JOIN state1 s ON b2.pk = s.pk
      WHERE s.pk IS NULL
         OR (s.prio IS DISTINCT FROM b2.prio OR s.status IS DISTINCT FROM b2.status)
    )
    SELECT pk, prio, status,
           CAST(valid_from AS VARCHAR) AS valid_from,
           CAST(valid_to AS VARCHAR) AS valid_to
    FROM (SELECT * FROM closed UNION ALL SELECT * FROM kept UNION ALL SELECT * FROM inserted)
    """,
)
def scd2_merge_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    b1 = o.filter(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_orderkey").alias("pk"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderstatus").alias("status"),
    )
    b2 = o.select(
        F.col("o_orderkey").alias("pk"),
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("X-CHANGED"))
        .otherwise(F.col("o_orderpriority"))
        .alias("prio"),
        F.col("o_orderstatus").alias("status"),
    )
    state1 = scd2_apply(None, b1, "pk", ["prio", "status"], _SCD2_T0)
    merged = scd2_apply(state1, b2, "pk", ["prio", "status"], _SCD2_T1)
    # stringify validity bounds: the 9999-12-31 open sentinel overflows
    # pandas ns timestamps on the comparison side
    return merged.select(
        "pk",
        "prio",
        "status",
        F.col("valid_from").cast("string").alias("valid_from"),
        F.col("valid_to").cast("string").alias("valid_to"),
    )


# ddl.py:551-556 — insert-only merge (hub/mart path).
@query(
    "insert_only_merge_customers",
    """
    WITH b1 AS (
      SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 2 = 0
    ),
    b2 AS (
      SELECT c_custkey, 'RENAMED-' || c_name AS c_name, c_acctbal + 1 AS c_acctbal
      FROM customer
    )
    SELECT * FROM b1
    UNION ALL
    SELECT b2.* FROM b2 LEFT JOIN b1 ON b2.c_custkey = b1.c_custkey
    WHERE b1.c_custkey IS NULL
    """,
)
def insert_only_merge_customers(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    b1 = c.filter(F.col("c_custkey") % 2 == 0).select("c_custkey", "c_name", "c_acctbal")
    b2 = c.select(
        "c_custkey",
        F.concat(F.lit("RENAMED-"), F.col("c_name")).alias("c_name"),
        (F.col("c_acctbal") + 1).alias("c_acctbal"),
    )
    s1 = insert_only_merge(None, b1, "c_custkey", ["c_custkey", "c_name", "c_acctbal"])
    return insert_only_merge(s1, b2, "c_custkey", ["c_custkey", "c_name", "c_acctbal"])
