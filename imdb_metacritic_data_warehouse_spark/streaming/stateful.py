"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no streaming at all (SURVEY.md §2.11) — its "state"
is the SCD2 history rebuilt per batch run.  This module is the
Spark-native extension for genuinely streaming state: per-key running
aggregates that survive across micro-batches, the building block a
training-data pipeline needs for e.g. per-source document counters,
per-user sessionization beyond ``session_window``, or rate limiting.

Scale notes: state is partitioned by the grouping key (one shuffle per
micro-batch), held in the state store per executor, and the per-group
function sees Arrow record batches — no row-at-a-time Python overhead.
State size is O(#distinct keys), independent of stream length.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    pass

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _update_running_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, sum(value)) per user across micro-batches."""
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) over a stream of events.

    Emits one updated row per user per micro-batch that touched it —
    ``outputMode("update")`` downstream.  Input needs ``user_id`` and
    ``value`` columns.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark ≥4.0) — the successor API: named
# state variables on a handle instead of one opaque tuple, usable for
# quota/rate-limit operators a crawl-ingest pipeline runs per source.

QUOTA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("seq", T.LongType()),
    ]
)


def quota_filter(events: DataFrame, quota: int = 2) -> DataFrame:
    """Admit at most ``quota`` events per key across the whole stream,
    tagging each admitted event with its per-key sequence number.

    The streaming form of "cap documents per source/domain" in a
    training-data ingest.  State is one counter per key (ValueState),
    partitioned by the grouping key; per-batch input arrives as Arrow
    batches, sorted here by event_id for deterministic admission.

    Environment gate: transformWithStateInPandas speaks protobuf to the
    JVM state server; containers without the ``protobuf`` wheel crash
    the streaming Python runner at query start (the operator itself
    constructs fine).  The test suite skips accordingly;
    ``applyInPandasWithState`` (``running_user_totals`` above) is the
    dependency-free fallback with equivalent semantics.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class QuotaProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState("n_admitted", "n BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            got = self._n.get()
            n = got[0] if got is not None else 0
            batch = pd.concat(list(rows), ignore_index=True)
            batch = batch.sort_values("event_id")
            take = batch.head(max(quota - n, 0))
            if len(take):
                yield pd.DataFrame(
                    {
                        "user_id": take["user_id"],
                        "event_id": take["event_id"],
                        "seq": range(n + 1, n + 1 + len(take)),
                    }
                )
            self._n.update((n + len(take),))

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=QuotaProcessor(),
        outputStructType=QUOTA_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
