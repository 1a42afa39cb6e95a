"""Semantic invariants for the wave-24 operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# km_survival_users


@pytest.fixture(scope="module")
def km_rows(spark):
    from imdb_metacritic_data_warehouse_spark.entry_queries import QUERIES

    return sorted(
        QUERIES["km_survival_users"](spark, SF).collect(), key=lambda r: r.day
    )


def test_km_survival_monotone_from_one(km_rows):
    surv = [r.survival for r in km_rows]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert surv == sorted(surv, reverse=True)
    # nobody churns on day one of a lifespan-bounded spine ⇒ S starts
    # at 1−h(1); with hazard ≥ 0 the curve can only fall
    assert surv[0] <= 1.0


def test_km_survival_is_product_of_hazards(km_rows):
    """S(t) must equal the running product of (1 − d/n) recomputed from
    the integer at_risk/churned columns."""
    s = 1.0
    for r in km_rows:
        s *= 1.0 - r.churned / r.at_risk
        assert abs(r.survival - round(s, 6)) < 2e-6, r.day


def test_km_final_survival_zero(km_rows):
    """Every user's LAST event day is their churn day, so by the end of
    the spine everyone has churned: S(end) = 0."""
    assert km_rows[-1].survival == 0.0


# --------------------------------------------------------------------------
# page_hinkley_daily


def test_page_hinkley_stat_properties(spark):
    from imdb_metacritic_data_warehouse_spark.entry_queries import QUERIES

    rows = sorted(
        QUERIES["page_hinkley_daily"](spark, SF).collect(), key=lambda r: r.day
    )
    assert len(rows) > 300
    mx = float("-inf")
    for r in rows:
        assert r.ph_stat_mm >= -1e-9  # PH = running max − m ≥ 0
        mx = max(mx, r.m_stat_mm)
        assert r.m_stat_mm <= mx + 1e-9
        assert abs((mx - r.m_stat_mm) - r.ph_stat_mm) < 2e-6
        assert r.is_alarm in (0, 1)
        assert r.running_mean_cents > 0


# --------------------------------------------------------------------------
# linear_interp_user_hours


def test_linear_interp_model_check(spark):
    """Interpolated values on a hand-planted gap: hours 0,3 observed at
    10.0 and 40.0 → hours 1,2 must read 20.0 and 30.0; report counts
    reflect the gap."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(1, 0, 1, 100000), (1, 3, 1, 400000)],
        ["user_id", "hi", "n", "su"],  # su in 1e-4 units: 10.0 and 40.0
    )
    # replay the interpolation expression on a 4-hour spine
    spine = spark.createDataFrame([(1, h) for h in range(4)], ["user_id", "hi"])
    j = spine.join(df, ["user_id", "hi"], "left")
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("hi")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wnext = (
        Window.partitionBy("user_id")
        .orderBy("hi")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs = F.when(F.col("n").isNotNull(), F.struct("hi", "su", "n"))
    c = j.select(
        "hi", "n", "su",
        F.last(obs, ignorenulls=True).over(wprev).alias("prev"),
        F.first(obs, ignorenulls=True).over(wnext).alias("nxt"),
    )
    pv = F.col("prev.su").cast("double") / F.col("prev.n").cast("double")
    nv = F.col("nxt.su").cast("double") / F.col("nxt.n").cast("double")
    frac = (F.col("hi") - F.col("prev.hi")).cast("double") / (
        F.col("nxt.hi") - F.col("prev.hi")
    ).cast("double")
    got = {
        r.hi: r.v
        for r in c.select(
            "hi",
            F.round(
                F.when(
                    F.col("n").isNotNull(),
                    F.col("su").cast("double") / F.col("n").cast("double") / 10000.0,
                ).otherwise((pv + (nv - pv) * frac) / 10000.0),
                6,
            ).alias("v"),
        ).collect()
    }
    assert got == {0: 10.0, 1: 20.0, 2: 30.0, 3: 40.0}
    # the production query aggregates each gap ANALYTICALLY
    # (arithmetic series): its per-user mean must equal the mean of
    # these per-row values — sv = 10+40, gap term = (10+40)·(3−1)/2
    assert (sum(got.values()) / 4) == (50.0 + 50.0) / 4


def test_linear_interp_query_counts(spark):
    from imdb_metacritic_data_warehouse_spark.entry_queries import QUERIES

    rows = QUERIES["linear_interp_user_hours"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_hours == r.n_observed + r.n_interpolated
        assert r.n_observed >= 1


# --------------------------------------------------------------------------
# quantile_normalize_embeddings


def test_quantile_normalize_property(spark):
    """After quantile normalization every dimension has the IDENTICAL
    distribution — mean_normalized must be the same value for all 64
    dims; raw means differ (that is what the transform removes)."""
    from imdb_metacritic_data_warehouse_spark.entry_queries import QUERIES

    rows = QUERIES["quantile_normalize_embeddings"](spark, SF).collect()
    assert len(rows) == 64
    norm_means = {r.mean_normalized for r in rows}
    assert len(norm_means) == 1
    assert all(r.mean_abs_shift >= 0.0 for r in rows)
    # each dim holds the full corpus
    ns = {r.n for r in rows}
    assert len(ns) == 1
