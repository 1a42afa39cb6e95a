"""Per-group argmax (J8/A7) — the ``max_by`` rewrite.

The reference computes "best movie per genre" with three correlated
``ORDER BY metric DESC LIMIT 1`` subqueries (``mart/genre_metrics.sql:
53-61``) — O(groups × table) unless the planner decorrelates, and Spark
rejects that shape outright.  The Spark-first form is a one-pass
aggregate: ``max_by(label, struct(metric, label))``.

Tie-breaking: PG's pick is arbitrary; we make it deterministic by
maximizing ``struct(metric, label)`` (struct comparison is
lexicographic), i.e. greatest label among metric-ties.  Rows with NULL
metric are ignored (PG ``DESC`` would sort NULLs first — a reference
quirk we deliberately do not copy; documented divergence).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def arg_max(label: Column, metric: Column) -> Column:
    """Aggregate: the ``label`` of the row with the greatest ``metric``
    (ties → greatest label; NULL metrics ignored)."""
    pair = F.when(metric.isNotNull(), F.struct(metric.alias("m"), label.alias("l")))
    return F.max(pair)["l"]
