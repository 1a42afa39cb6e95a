"""Clean-JVM A/B harness for pipeline_employee_data wirings (round 6).

Usage: python tools/emp_variants.py <variant> [sf_dir]
Runs warm-up + best-of-2 of one variant and prints a single line.
Run each variant in its own process — checkpoint blocks and GC pressure
pollute in-process comparisons (NOTES.md round-5 JVM-poisoning pattern).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from imdb_metacritic_data_warehouse_spark import entry_queries as eq  # noqa: E402
from imdb_metacritic_data_warehouse_spark.plans import core as _core  # noqa: E402
from imdb_metacritic_data_warehouse_spark.plans import marts as _marts  # noqa: E402
from imdb_metacritic_data_warehouse_spark.session import get_spark  # noqa: E402


def synth_actor_dedup(spark, sf_dir):
    """Wide-distinct actor projection in ONE shuffle: the synth's inner
    (l_partkey, l_suppkey) distinct is redundant under the outer 5-col
    distinct (same pair → same projected row), so skip it."""
    li = eq._t(spark, sf_dir, "lineitem")
    p = eq._t(spark, sf_dir, "part")
    s = eq._t(spark, sf_dir, "supplier")
    j = (
        li.select("l_partkey", "l_suppkey")
        .join(p.select("p_partkey", "p_name", "p_size"), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s.select("s_suppkey", "s_name")), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    role = F.element_at(
        F.array(F.lit("director"), F.lit("producer"), F.lit("writer"), F.lit("actor")),
        (F.col("s_suppkey") % 4 + 1).cast("int"),
    )
    return j.select(
        F.col("p_name").alias("movie_name"),
        F.col("p_size").cast("int").alias("movie_duration"),
        F.col("s_name").alias("name"),
        F.concat(F.lit("(as "), F.col("s_name"), F.lit(")")).alias("raw_role"),
        role.alias("role"),
    ).distinct()


def wh_dd(spark, sf_dir):
    """r7: route through _actor_wh so variants inherit the declared
    distinct_hints (bronze actor_union) like production does."""
    return eq._actor_wh(spark, sf_dir, dedup_actor=True)


def v_current(spark, sf_dir):
    return eq.pipeline_employee_data(spark, sf_dir)


def _mel_hint(wh):
    wh.distinct_hints[("stg", "movie_emp_link")] = {
        frozenset({"movie_emp_link_id"})
    }


def _finish(wh):
    mel = eq._materialize(
        eq.scd2_apply(None, wh.read("stg", "movie_emp_link"), "movie_emp_link_id",
                      ["movie_id", "emp_id"], eq._SCD2_T0)
    )
    wh._stg["movie_emp_link"] = mel
    _mel_hint(wh)
    sat = eq._materialize(
        eq.scd2_apply(None, wh.read("stg", "emp_movie_l_sat"), "movie_emp_role_id",
                      ["movie_emp_link_id", "description", "role"], eq._SCD2_T0)
    )
    wh._stg["emp_movie_l_sat"] = sat
    return _marts.build_employee_data(wh)


def v_dd(spark, sf_dir):
    """Shared wide-distinct actor frame + empty metacritic side."""
    wh = wh_dd(spark, sf_dir)
    wh._stg["employee_hub"] = eq._materialize(_core.build_employee_hub(wh))
    return _finish(wh)


def v_dd_bcast(spark, sf_dir):
    """v_dd + explicit broadcast hints on both hubs."""
    wh = wh_dd(spark, sf_dir)
    wh._stg["movie_hub"] = F.broadcast(eq._materialize(_core.build_movie_hub(wh)))
    wh._stg["employee_hub"] = F.broadcast(eq._materialize(_core.build_employee_hub(wh)))
    return _finish(wh)


def v_dd_nosatmat(spark, sf_dir):
    """v_dd but sat NOT materialized (filter_latest re-executes its
    chain once for the max agg — trade a checkpoint write for a
    re-execution over materialized inputs)."""
    wh = wh_dd(spark, sf_dir)
    wh._stg["employee_hub"] = eq._materialize(_core.build_employee_hub(wh))
    mel = eq._materialize(
        eq.scd2_apply(None, wh.read("stg", "movie_emp_link"), "movie_emp_link_id",
                      ["movie_id", "emp_id"], eq._SCD2_T0)
    )
    wh._stg["movie_emp_link"] = mel
    _mel_hint(wh)
    wh._stg["emp_movie_l_sat"] = eq.scd2_apply(
        None, wh.read("stg", "emp_movie_l_sat"), "movie_emp_role_id",
        ["movie_emp_link_id", "description", "role"], eq._SCD2_T0
    )
    return _marts.build_employee_data(wh)


def v_dd_satlazy(spark, sf_dir):
    """nosatmat but the sat is LAZILY localCheckpointed: filter_latest's
    broadcast max-agg job computes the chain once and persists the
    blocks as a side effect; the rows branch then reads the blocks —
    one chain execution, write amortized into the agg job."""
    wh = wh_dd(spark, sf_dir)
    wh._stg["employee_hub"] = eq._materialize(_core.build_employee_hub(wh))
    mel = eq._materialize(
        eq.scd2_apply(None, wh.read("stg", "movie_emp_link"), "movie_emp_link_id",
                      ["movie_id", "emp_id"], eq._SCD2_T0)
    )
    wh._stg["movie_emp_link"] = mel
    _mel_hint(wh)
    sat = eq.scd2_apply(
        None, wh.read("stg", "emp_movie_l_sat"), "movie_emp_role_id",
        ["movie_emp_link_id", "description", "role"], eq._SCD2_T0
    )
    ck = sat.localCheckpoint(eager=False)
    wh._stg["emp_movie_l_sat"] = ck.select(
        *[F.col(c).alias(c) for c in ck.columns]
    )
    return _marts.build_employee_data(wh)


def v_dd_noemphub(spark, sf_dir):
    """dd_nosatmat + employee_hub NOT materialized (1k-row distinct over
    the checkpointed dd — rebuild per consumer may beat the ckpt)."""
    wh = wh_dd(spark, sf_dir)
    mel = eq._materialize(
        eq.scd2_apply(None, wh.read("stg", "movie_emp_link"), "movie_emp_link_id",
                      ["movie_id", "emp_id"], eq._SCD2_T0)
    )
    wh._stg["movie_emp_link"] = mel
    wh._stg["emp_movie_l_sat"] = eq.scd2_apply(
        None, wh.read("stg", "emp_movie_l_sat"), "movie_emp_role_id",
        ["movie_emp_link_id", "description", "role"], eq._SCD2_T0
    )
    return _marts.build_employee_data(wh)


def v_dd_nomelmat(spark, sf_dir):
    """dd + NOTHING materialized except dd itself: how much do the
    mel/sat re-executions over the checkpointed dd actually cost?"""
    wh = wh_dd(spark, sf_dir)
    wh._stg["movie_emp_link"] = eq.scd2_apply(
        None, wh.read("stg", "movie_emp_link"), "movie_emp_link_id",
        ["movie_id", "emp_id"], eq._SCD2_T0
    )
    wh._stg["emp_movie_l_sat"] = eq.scd2_apply(
        None, wh.read("stg", "emp_movie_l_sat"), "movie_emp_role_id",
        ["movie_emp_link_id", "description", "role"], eq._SCD2_T0
    )
    return _marts.build_employee_data(wh)


def v_dd_bucketed(spark, sf_dir):
    """verdict r7 task #6 — the untried r6 lever: persist the link and
    sat as CO-BUCKETED catalog tables on movie_emp_link_id (the link⋈sat
    join key), so the mart's big join plans with zero Exchange on both
    sides; trades two saveAsTable disk writes per invocation for the
    removed shuffles (sources/bucketed.py proves the zero-Exchange plan
    shape in tests/test_plan_quality.py)."""
    from imdb_metacritic_data_warehouse_spark.sources.bucketed import write_bucketed

    wh = wh_dd(spark, sf_dir)
    wh._stg["employee_hub"] = eq._materialize(_core.build_employee_hub(wh))
    mel = eq.scd2_apply(
        None, wh.read("stg", "movie_emp_link"), "movie_emp_link_id",
        ["movie_id", "emp_id"], eq._SCD2_T0
    )
    write_bucketed(mel, "empvar_mel", "movie_emp_link_id", num_buckets=32)
    wh._stg["movie_emp_link"] = spark.table("empvar_mel")
    _mel_hint(wh)
    sat = eq.scd2_apply(
        None, wh.read("stg", "emp_movie_l_sat"), "movie_emp_role_id",
        ["movie_emp_link_id", "description", "role"], eq._SCD2_T0
    )
    write_bucketed(sat, "empvar_sat", "movie_emp_link_id", num_buckets=32)
    wh._stg["emp_movie_l_sat"] = spark.table("empvar_sat")
    wh.distinct_hints[("stg", "emp_movie_l_sat")] = {
        frozenset({"movie_emp_role_id"})
    }
    return _marts.build_employee_data(wh)


VARIANTS = {
    "current": v_current,
    "dd": v_dd,
    "dd_bcast": v_dd_bcast,
    "dd_nosatmat": v_dd_nosatmat,
    "dd_satlazy": v_dd_satlazy,
    "dd_noemphub": v_dd_noemphub,
    "dd_nomelmat": v_dd_nomelmat,
    "dd_bucketed": v_dd_bucketed,
}


def main():
    variant = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    fn = VARIANTS[variant]
    spark = get_spark("empvar")
    # small warm-up (JIT, parquet footers) on an unrelated cheap query
    eq.pipeline_movie_hub(spark, sf_dir).write.format("noop").mode("overwrite").save()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 2))
    print(f"RESULT {variant} best={min(times)} runs={times}")


if __name__ == "__main__":
    main()
