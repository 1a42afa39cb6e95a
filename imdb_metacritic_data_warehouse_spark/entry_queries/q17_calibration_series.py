"""Round-8 wave 33 — forecast-verification and paired-test statistics:
the Murphy decomposition of the Brier score (reliability / resolution /
uncertainty), the autocorrelation function with the Ljung–Box portmanteau
test over daily revenue, and McNemar's paired test between two quality
rules."""

from __future__ import annotations

from ._registry import F, _events, _t, _units4, query


# Murphy decomposition of the Brier score — the audit that says WHY a
# probabilistic quality score is good or bad: BS measures total error,
# REL (reliability) punishes miscalibrated bins, RES (resolution)
# rewards bins that separate outcomes, UNC is the outcome base-rate
# entropy term; for bin-constant forecasts BS = REL − RES + UNC holds
# as an identity (the residual column pins it to rounding error).  The
# forecast here is the deterministic length-based probability
# p = min(1, chars/(2·mean_chars)) snapped to a 1e-4 grid (integer
# units — every p is an exact rational, so bin means are single
# divisions of exact int sums), the outcome is "doc length above the
# corpus mean" (the bh_fdr indicator).  Forecasts are binned BY THEIR
# EXACT p-units (bin-constant by construction, so the identity is
# exact up to the final roundings).  One corpus pass + a bin-bounded
# tail.
@query(
    "brier_decomposition_docs",
    """
    WITH g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nn,
             CAST(SUM(n_chars) AS BIGINT) AS sc
      FROM documents
    ),
    d AS (
      SELECT doc_id,
             LEAST(10000, (n_chars * 5000) // (sc // nn)) AS pu,
             CASE WHEN n_chars * nn > sc THEN 1 ELSE 0 END AS o
      FROM documents, g
    ),
    bins AS (
      SELECT pu, CAST(COUNT(*) AS BIGINT) AS nk,
             CAST(SUM(o) AS BIGINT) AS ok
      FROM d GROUP BY pu
    ),
    tot AS (
      SELECT CAST(SUM(nk) AS BIGINT) AS n, CAST(SUM(ok) AS BIGINT) AS so
      FROM bins
    ),
    terms AS (
      SELECT n, so,
             list_reduce(list_prepend(CAST(0 AS DOUBLE), list(
               nk * (pu / 10000.0 - CAST(ok AS DOUBLE) / nk)
                  * (pu / 10000.0 - CAST(ok AS DOUBLE) / nk) ORDER BY pu)),
               (p, q) -> p + q) AS rel_sum,
             list_reduce(list_prepend(CAST(0 AS DOUBLE), list(
               nk * (CAST(ok AS DOUBLE) / nk - CAST(so AS DOUBLE) / n)
                  * (CAST(ok AS DOUBLE) / nk - CAST(so AS DOUBLE) / n)
               ORDER BY pu)), (p, q) -> p + q) AS res_sum,
             list_reduce(list_prepend(CAST(0 AS DOUBLE), list(
               (ok * (10000 - pu) * (10000 - pu)
                + (nk - ok) * pu * pu) / 100000000.0 ORDER BY pu)),
               (p, q) -> p + q) AS bs_sum
      FROM bins, tot GROUP BY n, so
    )
    SELECT n AS n_docs,
           round(bs_sum / n, 6) AS brier,
           round(rel_sum / n, 6) AS reliability,
           round(res_sum / n, 6) AS resolution,
           round((CAST(so AS DOUBLE) / n) * (1.0 - CAST(so AS DOUBLE) / n), 6)
             AS uncertainty,
           round(bs_sum / n
                 - (rel_sum / n
                    - res_sum / n
                    + (CAST(so AS DOUBLE) / n)
                      * (1.0 - CAST(so AS DOUBLE) / n)), 9) + 0.0
             AS identity_residual
    FROM terms
    """,
)
def brier_decomposition_docs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    g = docs.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum("n_chars").cast("long").alias("sc"),
    )
    d = docs.crossJoin(F.broadcast(g)).select(
        F.least(
            F.lit(10000), F.expr("(n_chars * 5000) div (sc div nn)")
        ).alias("pu"),
        F.when(F.col("n_chars") * F.col("nn") > F.col("sc"), 1)
        .otherwise(0)
        .alias("o"),
    )
    bins = d.groupBy("pu").agg(
        F.count(F.lit(1)).cast("long").alias("nk"),
        F.sum("o").cast("long").alias("ok"),
    )
    tot = bins.agg(
        F.sum("nk").cast("long").alias("n"), F.sum("ok").cast("long").alias("so")
    )
    terms = (
        bins.crossJoin(F.broadcast(tot))
        .groupBy("n", "so")
        .agg(
            F.expr(
                "aggregate(transform(array_sort(collect_list(struct(pu,"
                " nk * (pu / 10000.0 - CAST(ok AS DOUBLE) / nk)"
                "    * (pu / 10000.0 - CAST(ok AS DOUBLE) / nk) AS v))),"
                " s -> s.v), CAST(0.0 AS DOUBLE), (p, q) -> p + q)"
            ).alias("rel_sum"),
            F.expr(
                "aggregate(transform(array_sort(collect_list(struct(pu,"
                " nk * (CAST(ok AS DOUBLE) / nk - CAST(so AS DOUBLE) / n)"
                "    * (CAST(ok AS DOUBLE) / nk - CAST(so AS DOUBLE) / n) AS v))),"
                " s -> s.v), CAST(0.0 AS DOUBLE), (p, q) -> p + q)"
            ).alias("res_sum"),
            F.expr(
                "aggregate(transform(array_sort(collect_list(struct(pu,"
                " (ok * (10000 - pu) * (10000 - pu)"
                "  + (nk - ok) * pu * pu) / 100000000.0 AS v))),"
                " s -> s.v), CAST(0.0 AS DOUBLE), (p, q) -> p + q)"
            ).alias("bs_sum"),
        )
    )
    unc = (F.col("so").cast("double") / F.col("n")) * (
        F.lit(1.0) - F.col("so").cast("double") / F.col("n")
    )
    return terms.select(
        F.col("n").alias("n_docs"),
        F.round(F.col("bs_sum") / F.col("n"), 6).alias("brier"),
        F.round(F.col("rel_sum") / F.col("n"), 6).alias("reliability"),
        F.round(F.col("res_sum") / F.col("n"), 6).alias("resolution"),
        F.round(unc, 6).alias("uncertainty"),
        # + 0.0 canonicalizes a rounded -0.0 (DuckDB) vs 0.0 (Spark) —
        # the covariance_matrix signed-zero class.
        (
            F.round(
                F.col("bs_sum") / F.col("n")
                - (
                    F.col("rel_sum") / F.col("n")
                    - F.col("res_sum") / F.col("n")
                    + unc
                ),
                9,
            )
            + F.lit(0.0)
        ).alias("identity_residual"),
    )


# Autocorrelation function + Ljung–Box portmanteau — "is the daily
# series white noise" (residual diagnostics for the OLS/Holt-Winters
# forecasters, seasonality discovery for the weekly ops).  r_k at lags
# 1..7 from the calendar-bounded daily array: numerators/denominator
# fold raw identical doubles in day order on both engines (the
# page_hinkley discipline; ȳ is ONE division of exact int sums), and
# Q = n(n+2)·Σ r_k²/(n−k) folds over the 7-lag array; the alarm
# compares Q to the χ²₇ 5% literal.  Everything after the one day
# aggregate is calendar-bounded.
@query(
    "acf_ljungbox_daily",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT))
                  AS BIGINT) AS yu
      FROM events GROUP BY 1
    ),
    arr AS (
      SELECT list(CAST(yu AS DOUBLE) ORDER BY d) AS a,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(yu) AS BIGINT) AS s
      FROM daily
    ),
    cent AS (
      SELECT n,
             list_transform(a, x -> x - CAST(s AS DOUBLE) / n) AS c
      FROM arr
    ),
    den AS (
      SELECT n, c,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(c, x -> x * x)), (p, q) -> p + q) AS d0
      FROM cent
    ),
    lags AS (
      SELECT n, CAST(k AS BIGINT) AS lag,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(range(1, CAST(n - k AS BIGINT) + 1),
                 i -> c[CAST(i AS INTEGER)] * c[CAST(i + k AS INTEGER)])),
               (p, q) -> p + q) / d0 AS r
      FROM den, unnest(range(1, 8)) AS t(k)
    ),
    q_ AS (
      SELECT n,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(r * r / (n - lag) ORDER BY lag)), (p, q) -> p + q)
             * n * (n + 2) AS q
      FROM lags GROUP BY n
    )
    SELECT l.lag, round(l.r, 6) AS acf,
           round(q_.q, 6) AS ljung_box_q,
           q_.q > 14.067140449340169 AS reject_white_noise
    FROM lags l, q_ ORDER BY l.lag
    """,
)
def acf_ljungbox_daily(spark, sf_dir):
    e = _events(spark, sf_dir)
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(_units4("value")).cast("long").alias("yu")
    )
    arr = daily.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(d, CAST(yu AS DOUBLE)))),"
            " s -> s.col2)"
        ).alias("a"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("yu").cast("long").alias("s"),
    )
    cent = arr.select(
        "n",
        F.expr("transform(a, x -> x - CAST(s AS DOUBLE) / n)").alias("c"),
    )
    den = cent.select(
        "n",
        "c",
        F.expr(
            "aggregate(transform(c, x -> x * x), CAST(0.0 AS DOUBLE),"
            " (p, q) -> p + q)"
        ).alias("d0"),
    )
    lags = den.select(
        "n",
        F.explode(F.sequence(F.lit(1), F.lit(7))).alias("lag"),
        "c",
        "d0",
    ).select(
        "n",
        F.col("lag").cast("long").alias("lag"),
        (
            F.expr(
                "aggregate(transform(sequence(1, CAST(n - lag AS INT)),"
                " i -> c[i - 1] * c[i - 1 + CAST(lag AS INT)]),"
                " CAST(0.0 AS DOUBLE), (p, q) -> p + q)"
            )
            / F.col("d0")
        ).alias("r"),
    )
    q_ = lags.groupBy("n").agg(
        (
            F.expr(
                "aggregate(transform(array_sort(collect_list(struct(lag,"
                " r * r / (n - lag) AS v))), s -> s.v),"
                " CAST(0.0 AS DOUBLE), (p, q) -> p + q)"
            )
            * F.col("n")
            * (F.col("n") + 2)
        ).alias("q")
    )
    return (
        lags.crossJoin(F.broadcast(q_.select("q")))
        .select(
            "lag",
            F.round(F.col("r"), 6).alias("acf"),
            F.round(F.col("q"), 6).alias("ljung_box_q"),
            (F.col("q") > F.lit(14.067140449340169)).alias(
                "reject_white_noise"
            ),
        )
        .orderBy("lag")
    )


# McNemar's paired test between two quality RULES on the same corpus —
# kappa_quality_labelers measures AGREEMENT; McNemar asks the sharper
# question "does rule B flag documents rule A misses (and vice versa)
# at different rates", using only the discordant cells: chi² =
# (b−c)²/(b+c) with continuity correction (|b−c|−1)²/(b+c).  Rules:
# A = "above-mean length" and B = "above-mean whitespace token count" —
# both exact integer indicators (the bh_fdr discipline).  All cells
# are one conditional aggregate; the statistic is integers + one
# division.
@query(
    "mcnemar_rules_docs",
    """
    WITH g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nn,
             CAST(SUM(n_chars) AS BIGINT) AS sc,
             CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT) AS st
      FROM documents
    ),
    d AS (
      SELECT CASE WHEN n_chars * nn > sc THEN 1 ELSE 0 END AS ra,
             CASE WHEN CAST(len(string_split(lower(text), ' ')) AS BIGINT) * nn
                       > st THEN 1 ELSE 0 END AS rb
      FROM documents, g
    ),
    cells AS (
      SELECT CAST(SUM(CASE WHEN ra = 1 AND rb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN ra = 1 AND rb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(SUM(CASE WHEN ra = 0 AND rb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(SUM(CASE WHEN ra = 0 AND rb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS dd
      FROM d
    )
    SELECT a AS both_flag, b AS only_a, c AS only_b, dd AS neither,
           CASE WHEN b + c > 0 THEN
             round(CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE)
                   / (b + c), 6)
           ELSE NULL END AS mcnemar_chi2,
           CASE WHEN b + c > 0 THEN
             CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE) / (b + c)
               > 3.841458820694124
           ELSE NULL END AS rules_differ
    FROM cells
    """,
)
def mcnemar_rules_docs(spark, sf_dir):
    from ..operators.text import token_count_ws

    docs = _t(spark, sf_dir, "documents").select(
        "n_chars", token_count_ws(F.col("text")).cast("long").alias("tok")
    )
    g = docs.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum("n_chars").cast("long").alias("sc"),
        F.sum("tok").cast("long").alias("st"),
    )
    d = docs.crossJoin(F.broadcast(g)).select(
        F.when(F.col("n_chars") * F.col("nn") > F.col("sc"), 1)
        .otherwise(0)
        .alias("ra"),
        F.when(F.col("tok") * F.col("nn") > F.col("st"), 1)
        .otherwise(0)
        .alias("rb"),
    )
    cells = d.agg(
        F.sum(F.when((F.col("ra") == 1) & (F.col("rb") == 1), 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when((F.col("ra") == 1) & (F.col("rb") == 0), 1).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when((F.col("ra") == 0) & (F.col("rb") == 1), 1).otherwise(0))
        .cast("long")
        .alias("c"),
        F.sum(F.when((F.col("ra") == 0) & (F.col("rb") == 0), 1).otherwise(0))
        .cast("long")
        .alias("dd"),
    )
    chi2 = (
        (F.abs(F.col("b") - F.col("c")) - 1)
        * (F.abs(F.col("b") - F.col("c")) - 1)
    ).cast("double") / (F.col("b") + F.col("c"))
    return cells.select(
        F.col("a").alias("both_flag"),
        F.col("b").alias("only_a"),
        F.col("c").alias("only_b"),
        F.col("dd").alias("neither"),
        F.when(F.col("b") + F.col("c") > 0, F.round(chi2, 6)).alias(
            "mcnemar_chi2"
        ),
        F.when(
            F.col("b") + F.col("c") > 0, chi2 > F.lit(3.841458820694124)
        ).alias("rules_differ"),
    )
