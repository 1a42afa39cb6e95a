"""Source/sink connectors beyond parquet (reference S8/S9 surface).

The reference ingests via row-at-a-time psycopg2 INSERTs (S8,
``imdb parser.py:229-252``) and a CSV side-channel (S9,
``imdb parser.py:220-225``).  Engine equivalents:

- CSV/JSON: declared-schema readers (never ``inferSchema`` — one extra
  full pass at 100 TB) and batch writers.
- JDBC: ``spark.read/write.format('jdbc')`` wrapper.  No JDBC driver
  jars ship in this environment, so the wrapper raises a clear error
  at call time; the option plumbing (partitionColumn bounds for
  parallel reads, batchsize for writes) is the part worth keeping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    return spark.read.schema(schema).option("header", header).csv(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", True).csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """ORC scan — same vectorized/pushdown treatment as parquet in
    Spark; schema optional because ORC files self-describe (no extra
    inference pass)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """Parallel JDBC scan: with ``partition_column`` + bounds each
    executor reads one key range (the replacement for the reference's
    single-connection reads).  Raises if no driver jar is present."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound if lower_bound is not None else 0)
            .option("upperBound", upper_bound if upper_bound is not None else 1)
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame, url: str, table: str, mode: str = "append", batchsize: int = 10000
) -> None:
    """Batched JDBC sink — one INSERT per ``batchsize`` rows per
    partition, replacing the reference's per-row INSERT+commit
    (``imdb parser.py:240-242``)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", batchsize)
        .mode(mode)
        .save()
    )


def export_jsonl_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str,
    salt: str = "",
    mode: str = "overwrite",
) -> None:
    """Training-data export: deterministic sharded JSONL.

    Each row lands in shard ``crc32(md5(id||salt)) % n_shards`` —
    content-addressed, so re-exports and retried tasks produce
    IDENTICAL shard assignments (no ``rand()``, no partition-index
    dependence), and downstream loaders can reproduce the mapping from
    the id alone.  ``repartition(n_shards, shard)`` makes each output
    file one shard; the salted md5 is uniform so shards are balanced
    regardless of id distribution.  Written as ``part-*`` JSON-lines
    files partitioned by the ``shard`` column for path-level pruning.
    """
    from pyspark.sql import functions as F

    shard = (
        F.crc32(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))))
        % n_shards
    ).cast("int")
    (
        df.withColumn("shard", shard)
        .repartition(n_shards, "shard")
        .write.mode(mode)
        .partitionBy("shard")
        .json(path)
    )
