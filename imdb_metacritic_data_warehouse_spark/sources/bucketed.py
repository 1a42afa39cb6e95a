"""Bucketed tables — co-located joins and shuffle-free aggregation.

The versioned-parquet layer (``table.py``) owns the SCD2 write path;
this module is the complementary layout for the BIG fact tables: write
once bucketed (+sorted) by the join/grouping key, and every subsequent
equi-join between co-bucketed tables and every groupBy on the bucket
key runs WITHOUT a shuffle — at 100 TB that turns the recurring
lineitem⋈orders shuffle (the single largest network cost in the TPC-H
shapes) into a map-side zip of pre-sorted buckets.

Rules that make it work (asserted in tests/test_plan_quality.py's
bucketed tests):
- both sides bucketed by the SAME key into the SAME bucket count;
- bucket count chosen for target-SF task sizing (buckets ≈ cluster
  cores × small multiple; each bucket ≲ a few hundred MB);
- ``sortBy`` the bucket key so sort-merge join skips its sort.

Bucketing metadata lives in the session catalog (``saveAsTable``) —
plain ``.parquet()`` files cannot carry it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    num_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_key)
    if sort:
        w = w.sortBy(bucket_key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Equi-join of two co-bucketed tables — plans with zero Exchange
    on either side when bucket specs match."""
    return spark.table(left_table).join(spark.table(right_table), key)
