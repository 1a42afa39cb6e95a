"""Custom Python data source (Spark ≥4.0 DataSource API).

The reference's only "sources" are scrapers feeding row-at-a-time
INSERTs (SURVEY.md §2.1 S1-S8).  The engine-native equivalent of a
programmatic source is a first-class ``spark.read.format(...)``
implementation: this module registers ``synthetic_events``, a
deterministic event generator used for load tests and streaming-shape
rehearsals without touching real data.

Scale design: the source declares ``n_partitions`` input partitions;
each executor task generates only its slice (no driver materialization,
no shuffle).  Generation is pure hash arithmetic on (seed, row id) —
re-reads and retries produce identical rows, which task retry semantics
at 1000 executors require of any source.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EVENT_TYPES = ["click", "view", "purchase", "scroll"]
_BASE_TS = datetime(2024, 1, 1, 0, 0, 0)


def _h(seed: int, i: int, field: str) -> int:
    """Deterministic 60-bit hash for row ``i``, independent per field."""
    return int(
        hashlib.md5(f"{seed}:{i}:{field}".encode()).hexdigest()[:15], 16
    )


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.n_users = int(options.get("n_users", 100))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        return [InputPartition(p) for p in range(self.n_partitions)]

    def read(self, partition):
        p = partition.value
        # contiguous row-id slice per partition: last partition absorbs
        # the remainder
        per = self.n_rows // self.n_partitions
        start = p * per
        end = self.n_rows if p == self.n_partitions - 1 else start + per
        for i in range(start, end):
            yield (
                i,
                self._user(i),
                EVENT_TYPES[_h(self.seed, i, "type") % len(EVENT_TYPES)],
                round((_h(self.seed, i, "value") % 10_000) / 100.0, 2),
                _BASE_TS + timedelta(seconds=_h(self.seed, i, "ts") % 86_400),
            )

    def _user(self, i: int) -> int:
        return _h(self.seed, i, "user") % self.n_users


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("n_rows", ...)``"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id bigint, user_id bigint, event_type string, "
            "value double, ts timestamp"
        )

    def reader(self, schema) -> DataSourceReader:
        return SyntheticEventsReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)
