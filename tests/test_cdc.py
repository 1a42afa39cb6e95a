"""Generic multi-clause CDC apply (operators/cdc.py) — MERGE semantics:
matched-delete, matched-update, not-matched-insert, plus the integrity
contract in both strict and lenient modes."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from imdb_metacritic_data_warehouse_spark.operators.cdc import apply_cdc_batch


@pytest.fixture(scope="module")
def base(spark):
    return spark.createDataFrame(
        [Row(k=1, s="A", v=10.0), Row(k=2, s="B", v=20.0), Row(k=3, s="C", v=30.0)]
    )


def _rows(df):
    return {r.k: (r.s, r.v) for r in df.collect()}


def test_apply_all_three_clauses(spark, base):
    changes = spark.createDataFrame(
        [
            Row(k=1, op="D", s=None, v=None),
            Row(k=2, op="U", s="B2", v=22.0),
            Row(k=4, op="I", s="D", v=40.0),
        ],
        "k bigint, op string, s string, v double",
    )
    out = _rows(apply_cdc_batch(base, changes, "k"))
    assert out == {2: ("B2", 22.0), 3: ("C", 30.0), 4: ("D", 40.0)}


def test_lenient_orphans_and_insert_conflicts(spark, base):
    changes = spark.createDataFrame(
        [
            Row(k=9, op="D", s=None, v=None),   # orphan delete: no-op
            Row(k=8, op="U", s="X", v=0.0),     # orphan update: no-op
            Row(k=1, op="I", s="A9", v=99.0),   # insert on existing: base wins
        ],
        "k bigint, op string, s string, v double",
    )
    out = _rows(apply_cdc_batch(base, changes, "k", strict=False))
    assert out == {1: ("A", 10.0), 2: ("B", 20.0), 3: ("C", 30.0)}


@pytest.mark.parametrize(
    "row",
    [
        Row(k=9, op="D", s=None, v=None),
        Row(k=9, op="U", s="X", v=0.0),
        Row(k=1, op="I", s="A9", v=99.0),
    ],
)
def test_strict_raises_on_integrity_violation(spark, base, row):
    changes = spark.createDataFrame([row], "k bigint, op string, s string, v double")
    with pytest.raises(ValueError, match="CDC integrity"):
        apply_cdc_batch(base, changes, "k", strict=True)


def test_strict_accepts_clean_batch(spark, base):
    changes = spark.createDataFrame(
        [Row(k=3, op="D", s=None, v=None), Row(k=5, op="I", s="E", v=50.0)],
        "k bigint, op string, s string, v double",
    )
    out = _rows(apply_cdc_batch(base, changes, "k", strict=True))
    assert out == {1: ("A", 10.0), 2: ("B", 20.0), 5: ("E", 50.0)}


def test_update_payload_nulls_are_applied_verbatim(spark, base):
    # an explicit NULL in a 'U' payload column overwrites (CDC images
    # are full rows, not sparse patches) — pin the contract.
    changes = spark.createDataFrame(
        [Row(k=2, op="U", s=None, v=2.5)], "k bigint, op string, s string, v double"
    )
    out = _rows(apply_cdc_batch(base, changes, "k"))
    assert out[2] == (None, 2.5)
