"""Semantic invariants for the wave-22 operators — the guarantees the
value-hash oracles can't express (the oracle proves engine parity;
these prove the SEMANTICS are the intended ones), plus the regression
test for the multi-window partition-id bug global_prefix shipped with.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# rank.global_prefix — the fused N-ary two-phase prefix primitive


def test_global_prefix_matches_serial_model(spark):
    """rn and every cum_ column must equal the serial prefix over the
    total order.  Regression: the first version passed a raw
    spark_partition_id() EXPRESSION into each window spec — with two
    WindowExec nodes in one chain the second re-evaluated it after the
    first window's exchange, grouping local sums by post-shuffle
    partition ids (cum_c1 came back ~2x; caught by the
    wasserstein_drift oracle).  __pid must be stamped once as a column."""
    from imdb_metacritic_data_warehouse_spark.operators.rank import global_prefix

    df = spark.range(10000).select(
        (F.col("id") % 7).cast("string").alias("grp"),
        F.col("id").alias("v"),
        F.lit(1).alias("c1"),
        (F.col("id") % 3).alias("c2"),
    )
    got = {
        (r.grp, r.v): (r.rn, r.cum_c1, r.cum_c2)
        for r in global_prefix(
            df, [F.col("grp"), F.col("v")], ["c1", "c2"], rn_col="rn"
        ).collect()
    }
    rows = sorted((r.grp, r.v, r.c1, r.c2) for r in df.collect())
    e1 = e2 = 0
    for i, (g, v, c1, c2) in enumerate(rows, 1):
        e1 += c1
        e2 += c2
        assert got[(g, v)] == (i, e1, e2), (g, v)


def test_global_prefix_agrees_with_single_primitives(spark):
    """The fused pass must be value-identical to global_row_number +
    global_cumsum run separately under the same order."""
    from imdb_metacritic_data_warehouse_spark.operators.packing import global_cumsum
    from imdb_metacritic_data_warehouse_spark.operators.rank import (
        global_prefix,
        global_row_number,
    )

    df = spark.range(5000).select(
        F.col("id").alias("k"), (F.col("id") % 11 + 1).alias("w")
    )
    fused = {
        r.k: (r.rn, r.cum_w)
        for r in global_prefix(df, [F.col("k")], ["w"], rn_col="rn").collect()
    }
    rn = {
        r.k: r.rn
        for r in global_row_number(df, [F.col("k")], out_col="rn").collect()
    }
    cs = {
        r.k: r.cumsum
        for r in global_cumsum(df, [F.col("k")], "w", out_col="cumsum").collect()
    }
    for k, (r, c) in fused.items():
        assert r == rn[k] and c == cs[k]


# --------------------------------------------------------------------------
# wasserstein_drift_orders — W1 metric properties


@pytest.fixture(scope="module")
def w1_rows(spark):
    from imdb_metacritic_data_warehouse_spark.entry_queries import QUERIES

    return QUERIES["wasserstein_drift_orders"](spark, SF).collect()


def test_w1_dominates_mean_shift(w1_rows):
    """W1(P,Q) >= |E[P] - E[Q]| (Jensen on the coupling) — per group,
    with slack for the two round-6 display roundings."""
    for r in w1_rows:
        assert r.w1_price >= abs(r.mean_base - r.mean_curr) - 1e-5, r.grp


def test_w1_nonnegative_and_counts(w1_rows):
    assert len(w1_rows) == 6  # 5 priorities + ALL
    tot_base = tot_curr = 0
    for r in w1_rows:
        assert r.w1_price >= 0.0
        if r.grp != "ALL":
            tot_base += r.n_base
            tot_curr += r.n_curr
    all_row = next(r for r in w1_rows if r.grp == "ALL")
    assert (all_row.n_base, all_row.n_curr) == (tot_base, tot_curr)


def test_w1_identical_distributions_is_zero(spark):
    """Feeding the SAME period as base and current must yield W1 = 0 —
    pinned through the real operator composition on a synthetic frame."""
    from imdb_metacritic_data_warehouse_spark.operators.rank import global_prefix

    vl = spark.range(200).select(
        F.lit("g").alias("grp"),
        (F.col("id") * 37 % 1000).alias("v"),
        F.lit(1).alias("c1"),
        F.lit(1).alias("c2"),
    ).groupBy("grp", "v").agg(
        F.sum("c1").cast("long").alias("c1"), F.sum("c2").cast("long").alias("c2")
    )
    gp = global_prefix(vl, [F.col("grp"), F.col("v")], ["c1", "c2"], rn_col="rn")
    nxt = gp.select((F.col("rn") - 1).alias("rn"), F.col("v").alias("v_next"))
    num = (
        gp.join(nxt, "rn")
        .select(
            (
                F.abs(F.col("cum_c1") - F.col("cum_c2"))
                * (F.col("v_next") - F.col("v"))
            ).alias("t")
        )
        .agg(F.sum("t").alias("s"))
        .collect()[0]
        .s
    )
    assert num == 0


# --------------------------------------------------------------------------
# hill_tail_index_orders


def test_hill_alpha_positive_and_thresholds_decreasing(spark):
    from imdb_metacritic_data_warehouse_spark.entry_queries import QUERIES

    rows = sorted(
        QUERIES["hill_tail_index_orders"](spark, SF).collect(), key=lambda r: r.k
    )
    assert [r.k for r in rows] == [200, 500, 1000]
    prev = None
    for r in rows:
        assert r.n_terms == r.k
        assert r.alpha_hill > 0
        assert r.mean_log_excess > 0
        # deeper cutoff => smaller order-statistic threshold
        if prev is not None:
            assert r.x_threshold <= prev
        prev = r.x_threshold


# --------------------------------------------------------------------------
# mrr_retrieval_audit


def test_mrr_panel_ranges_and_consistency(spark):
    from imdb_metacritic_data_warehouse_spark.entry_queries import QUERIES

    rows = QUERIES["mrr_retrieval_audit"](spark, SF).collect()
    assert {r.query_id for r in rows} == {5, 42, 99}
    for r in rows:
        assert 0 <= r.n_rel_10 <= 10
        assert r.n_rel_10 <= r.n_rel_corpus
        assert 0.0 <= r.precision_at_10 <= 1.0
        assert 0.0 <= r.recall_at_10 <= 1.0
        if r.first_rel_rank is None:
            assert r.reciprocal_rank == 0.0 and r.n_rel_10 == 0
        else:
            assert 1 <= r.first_rel_rank <= 10
            assert abs(r.reciprocal_rank - round(1.0 / r.first_rel_rank, 6)) < 1e-12


# --------------------------------------------------------------------------
# shapley_source_valuation_docs — the Shapley axioms


def test_shapley_efficiency_axiom(spark):
    """Sum of Shapley values = grand-coalition value (exact, in the
    x120 integer scale), and every solo coverage / marginal is within
    [0, grand]."""
    from imdb_metacritic_data_warehouse_spark.entry_queries import QUERIES

    rows = QUERIES["shapley_source_valuation_docs"](spark, SF).collect()
    assert len(rows) == 5
    # recover grand coverage from any row: shapley_share = shap/(120*grand)
    r0 = max(rows, key=lambda r: abs(r.shap_u120))
    grand = round(r0.shap_u120 / (120.0 * r0.shapley_share))
    assert sum(r.shap_u120 for r in rows) == 120 * grand
    for r in rows:
        assert 0 <= r.solo_coverage <= grand
        assert 0 <= r.marginal_to_grand <= r.solo_coverage
        # monotone submodular game => nonnegative Shapley values
        assert r.shap_u120 >= 0
        # marginal-to-grand is the MINIMUM marginal of a submodular
        # game; solo coverage the maximum: Shapley lies between them
        assert 120 * r.marginal_to_grand <= r.shap_u120 <= 120 * r.solo_coverage


def test_shapley_symmetric_toy_masks(spark):
    """Two identical sources get identical Shapley values (symmetry
    axiom) — replayed through the mask→coalition algebra the query
    uses, with a hand mask table: shingles {a: sources 0+1, b: 0, c: 1}
    — sources 0 and 1 are symmetric by construction."""
    from imdb_metacritic_data_warehouse_spark.entry_queries import QUERIES  # noqa: F401

    # masks: a=0b00011 (both), b=0b00001, c=0b00010
    masks = {0b00011: 1, 0b00001: 1, 0b00010: 1}

    def cov(S):
        return sum(c for m, c in masks.items() if m & S)

    fact = [1, 1, 2, 6, 24]
    k = 5

    def shap(c):
        tot = 0
        for S in range(32):
            if S & (1 << c):
                continue
            w = fact[bin(S).count("1")] * fact[k - 1 - bin(S).count("1")]
            tot += w * (cov(S | (1 << c)) - cov(S))
        return tot

    assert shap(0) == shap(1)
    assert shap(2) == shap(3) == shap(4)  # null players
    assert shap(2) == 0  # dummy axiom: no coverage -> zero value
    assert sum(shap(c) for c in range(5)) == 120 * cov(31)
