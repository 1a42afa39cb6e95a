"""Raw-layer column-rotation repair (P4, ``etl_layer_transfer.py:10-20``).

The scrapers sometimes emit actor rows with fields shifted one position.
The reference repairs by INSERTing a rotated copy of every row whose
``role`` is non-canonical — ``(raw_role→name, role→raw_role,
name→role)`` — then DELETEing all rows with non-canonical role.

Exact consequences we preserve:
- A rotated row whose *new* role is still non-canonical is deleted too
  (the DELETE runs after the INSERT).
- NULL-role rows survive untouched: PG ``role NOT IN (...)`` is NULL
  for NULL role → neither inserted nor deleted.

Spark: one declarative pass — filter+select+union, no mutation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CANONICAL_ROLES = ["director", "producer", "writer", "actor"]


def repair_role_rotation(df: DataFrame) -> DataFrame:
    """Repair an ``actor_raw_*`` DataFrame (cols: movie_name,
    movie_duration, name, raw_role, role)."""
    is_bad = F.col("role").isNotNull() & ~F.col("role").isin(CANONICAL_ROLES)
    keep = df.filter(~is_bad)  # canonical or NULL role
    rotated = df.filter(is_bad).select(
        F.col("movie_name"),
        F.col("movie_duration"),
        F.col("raw_role").alias("name"),
        F.col("role").alias("raw_role"),
        F.col("name").alias("role"),
    )
    # post-rotation rows are subject to the same DELETE predicate
    rotated_kept = rotated.filter(
        F.col("role").isNull() | F.col("role").isin(CANONICAL_ROLES)
    )
    return keep.unionByName(rotated_kept)
