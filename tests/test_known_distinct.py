"""plans/core.known_distinct — the declared-uniqueness DISTINCT-elision
mechanism (round 7).

Contract: hints are CALLER guarantees.  With no hints the builders
dedup exactly as before (reference semantics); with a TRUE hint the
output SET is identical and the plan drops the corresponding
exchanges; a FALSE hint is the caller's bug (dupes survive) — pinned
here so the trust model is explicit, not accidental.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from imdb_metacritic_data_warehouse_spark.plans import core as _core
from imdb_metacritic_data_warehouse_spark.plans import marts as _marts


class _TinyWh:
    def __init__(self, spark, actor_rows, hints=None):
        self.spark = spark
        self._actors = spark.createDataFrame(
            actor_rows,
            "movie_name string, movie_duration int, name string, raw_role string, role string",
        )
        self._movies = spark.createDataFrame(
            [(m, d, m, "g") for (m, d) in {(r[0], r[1]) for r in actor_rows}],
            "movie_name string, min_duration int, original_name string, genres string",
        )
        if hints is not None:
            self.distinct_hints = hints
        self._stg = {}

    def bronze(self, table):
        if table.startswith("actor"):
            return (
                self._actors
                if table.endswith("imdb")
                else self._actors.filter(F.lit(False))
            )
        return (
            self._movies
            if table.endswith("imdb")
            else self._movies.filter(F.lit(False))
        )

    def read(self, schema, name):
        if name in self._stg:
            return self._stg[name]
        built = getattr(_core, f"build_{name}")(self)
        self._stg[name] = built
        return built


ROWS = [
    ("m1", 10, "alice", "(as alice)", "actor"),
    ("m1", 10, "bob", "(as bob)", "writer"),
    ("m2", 20, "alice", "(as alice)", "actor"),
]

HINTS_TRUE = {
    ("bronze", "actor_union"): {
        frozenset({"movie_name", "movie_duration", "name", "raw_role", "role"}),
        frozenset({"movie_name", "movie_duration", "name"}),
    },
    ("stg", "employee_hub"): {frozenset({"emp_id"})},
    ("stg", "movie_hub"): {frozenset({"movie_id"})},
}


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"\bExchange\b", plan))


def test_true_hints_preserve_set_and_drop_exchanges(spark):
    plain = _TinyWh(spark, ROWS)
    hinted = _TinyWh(spark, ROWS, hints=HINTS_TRUE)
    a = _core.build_movie_emp_link(plain)
    b = _core.build_movie_emp_link(hinted)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # the hinted plan must be strictly cheaper: union-dedup + output
    # dedup exchanges gone
    assert _exchanges(b) < _exchanges(a)

    sa = _core.build_emp_movie_l_sat(plain)
    sb = _core.build_emp_movie_l_sat(hinted)
    assert sorted(map(tuple, sa.collect())) == sorted(map(tuple, sb.collect()))
    assert _exchanges(sb) < _exchanges(sa)


def test_no_hints_is_reference_behavior_on_dup_bronze(spark):
    # Duplicate bronze rows (the real-world raw shape) are deduped by
    # the builders when no hint is declared.
    wh = _TinyWh(spark, ROWS + ROWS)  # every row twice
    link = _core.build_movie_emp_link(wh).collect()
    assert len(link) == len({(r.movie_id, r.emp_id) for r in link}) == 3


def test_false_hint_is_callers_bug(spark):
    # A FALSE hint (declared distinct, input actually duplicated) lets
    # duplicates through: the mechanism trusts the caller by design.
    wh = _TinyWh(spark, ROWS + ROWS, hints=HINTS_TRUE)
    link = _core.build_movie_emp_link(wh).collect()
    assert len(link) == 6  # dupes survive — the hint was a lie


def test_mart_output_dedup_elision(spark):
    from imdb_metacritic_data_warehouse_spark.operators.scd2 import scd2_apply

    def rekey(df):
        # fresh attribute ids per table (the _materialize alias trick)
        # so the hub/link/sat joins aren't ambiguous self-joins of the
        # shared tiny-bronze lineage
        ck = df.localCheckpoint(eager=True)
        return ck.select(*[F.col(c).alias(c) for c in ck.columns])

    def mk(hints):
        wh = _TinyWh(spark, ROWS, hints=hints)
        mel = scd2_apply(
            None,
            wh.read("stg", "movie_emp_link"),
            "movie_emp_link_id",
            ["movie_id", "emp_id"],
            "2024-01-01 00:00:00",
        )
        mel = rekey(mel)
        wh._stg["movie_emp_link"] = mel
        sat = scd2_apply(
            None,
            wh.read("stg", "emp_movie_l_sat"),
            "movie_emp_role_id",
            ["movie_emp_link_id", "description", "role"],
            "2024-01-01 00:00:00",
        )
        wh._stg["emp_movie_l_sat"] = rekey(sat)
        wh._stg["employee_hub"] = rekey(wh.read("stg", "employee_hub"))
        if hints is not None:
            wh.distinct_hints[("stg", "movie_emp_link")] = {
                frozenset({"movie_emp_link_id"})
            }
            wh.distinct_hints[("stg", "emp_movie_l_sat")] = {
                frozenset({"movie_emp_role_id"})
            }
        return _marts.build_employee_data(wh)

    plain = mk(None)
    hinted = mk(dict(HINTS_TRUE))
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, hinted.collect())
    )
    assert _exchanges(hinted) < _exchanges(plain)
