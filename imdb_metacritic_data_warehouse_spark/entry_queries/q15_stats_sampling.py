"""Round-8 wave 31 — survey-sampling and multiple-testing
infrastructure: Horvitz–Thompson estimation over a deterministic PPS
sample, Benjamini–Hochberg FDR control across per-source tests, and
the Mann–Kendall trend test (the significance companion of the
theil_sen slope)."""

from __future__ import annotations

from pyspark.sql import Window

from ._registry import F, _events, _t, _units4, query

# DuckDB twin of operators/sampling.hash_bucket (the established
# logrank/ab_test split idiom).
_HB = "CAST(CONCAT('0x', substr(md5(CAST({c} AS VARCHAR)), 1, 8)) AS BIGINT) % 10000"


# Horvitz–Thompson total estimation over a deterministic
# probability-proportional-to-size Poisson sample — the estimator that
# makes SAMPLED corpus audits honest: inclusion probability
# pi_i ∝ doc size (exact 1e-4 rationals t_i/10000 from integer
# arithmetic), membership via the md5 hash bucket (reproducible — no
# RNG), and T_hat = sum tok_i/pi_i over the sample, which is unbiased
# for the true token total.  The per-doc contributions are single
# correctly-rounded divisions of exact integers, folded in doc_id
# order inside one sample-bounded array (identical on both engines);
# the full-scan truth is an exact integer.  One corpus pass + a
# sample-sized fold; at 100 TB the sample IS the point — the estimate
# costs |sample| token counts, the audit compares it to truth once.
@query(
    "horvitz_thompson_docs",
    f"""
    WITH d AS (
      SELECT doc_id, n_chars,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS tok
      FROM documents
    ),
    tot AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS tc,
                   CAST(SUM(tok) AS BIGINT) AS true_tok,
                   CAST(COUNT(*) AS BIGINT) AS n FROM d),
    probs AS (
      SELECT doc_id, tok,
             LEAST(10000, GREATEST(1,
               (100 * 10000 * n_chars) // tc)) AS t
      FROM d, tot
    ),
    samp AS (
      SELECT doc_id, tok, t FROM probs
      WHERE {_HB.format(c="doc_id")} < t
    ),
    folded AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_sampled,
             list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                 list(CAST(tok * 10000 AS DOUBLE) / t ORDER BY doc_id)),
               (p, q) -> p + q) AS est
      FROM samp
    )
    SELECT n, n_sampled, true_tok AS true_tokens,
           round(est, 4) AS ht_estimate,
           round((est - true_tok) / true_tok, 6) AS rel_error
    FROM folded, tot
    """,
)
def horvitz_thompson_docs(spark, sf_dir):
    from ..operators.sampling import hash_bucket
    from ..operators.text import token_count_ws

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        token_count_ws(F.col("text")).cast("long").alias("tok"),
    )
    tot = d.agg(
        F.sum("n_chars").cast("long").alias("tc"),
        F.sum("tok").cast("long").alias("true_tok"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    probs = d.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "tok",
        F.least(
            F.lit(10000),
            F.greatest(
                F.lit(1),
                F.expr("(100 * 10000 * n_chars) div tc"),
            ),
        ).alias("t"),
        "tc",
        "true_tok",
        "n",
    )
    samp = probs.filter(hash_bucket(F.col("doc_id")) < F.col("t"))
    folded = samp.agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        F.expr(
            "aggregate(transform(array_sort(collect_list("
            "  struct(doc_id, CAST(tok * 10000 AS DOUBLE) / t))),"
            "  s -> s.col2), CAST(0.0 AS DOUBLE), (p, q) -> p + q)"
        ).alias("est"),
    )
    return folded.crossJoin(F.broadcast(tot)).select(
        "n",
        "n_sampled",
        F.col("true_tok").alias("true_tokens"),
        F.round(F.col("est"), 4).alias("ht_estimate"),
        F.round(
            (F.col("est") - F.col("true_tok")) / F.col("true_tok"), 6
        ).alias("rel_error"),
    )


# Benjamini–Hochberg FDR step-up over per-source tests — the
# multiple-comparisons layer every per-domain drift dashboard needs
# (20 sources tested at alpha=0.05 yield ~1 false alarm per run
# uncorrected).  Per-source statistic: the two-sided z for "this
# source's share of longer-than-average docs differs from the corpus
# rate" — numerator and variance assembled from EXACT integer counts
# (n_d·X, n_d·X·(N−X) stay far under 2^63), one division, one sqrt
# (correctly rounded).  The p-value is the Chernoff tail BOUND
# min(1, 2·exp(−z²/2)) — deterministic and monotone in |z|, which is
# all BH's ORDERING needs — rounded to 9 before the step-up compare on
# both engines (the exp discipline).  BH: sort p ascending, k* = max
# {k: p_(k) ≤ k·alpha/m}, reject ranks ≤ k*.  Everything after the one
# corpus aggregate is m-bounded (m = #sources).
@query(
    "bh_fdr_sources",
    """
    WITH d AS (
      SELECT source, n_chars FROM documents
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nn,
             CAST(SUM(n_chars) AS BIGINT) AS sc
      FROM d
    ),
    per AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS nd,
             CAST(SUM(CASE WHEN n_chars * nn > sc THEN 1 ELSE 0 END)
                  AS BIGINT) AS xd
      FROM d, g GROUP BY source, nn, sc
    ),
    gx AS (SELECT CAST(SUM(xd) AS BIGINT) AS xx FROM per),
    z AS (
      SELECT source, nd, xd,
             (CAST(xd AS DOUBLE) - CAST(nd * xx AS DOUBLE) / nn)
             / sqrt(CAST(nd * xx * (nn - xx) AS DOUBLE)
                    / (CAST(nn AS DOUBLE) * nn)) AS zstat
      FROM per, gx, g
    ),
    p AS (
      SELECT source, round(zstat, 6) AS z_stat,
             round(LEAST(1.0, 2.0 * exp(-(zstat * zstat) / 2.0)), 9) AS p_value
      FROM z
    ),
    ranked AS (
      SELECT source, z_stat, p_value,
             row_number() OVER (ORDER BY p_value, source) AS k,
             COUNT(*) OVER () AS m
      FROM p
    ),
    kstar AS (
      SELECT COALESCE(MAX(CASE WHEN p_value <= CAST(k AS DOUBLE) * 0.05 / m
                                THEN k END), 0) AS ks
      FROM ranked
    )
    SELECT source, z_stat, p_value, CAST(k AS BIGINT) AS p_rank,
           round(CAST(k AS DOUBLE) * 0.05 / m, 9) AS bh_threshold,
           k <= ks AS rejected
    FROM ranked, kstar ORDER BY p_rank
    """,
)
def bh_fdr_sources(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("source", "n_chars")
    g = d.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum("n_chars").cast("long").alias("sc"),
    )
    per = (
        d.crossJoin(F.broadcast(g))
        .groupBy("source", "nn", "sc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("nd"),
            F.sum(
                F.when(F.col("n_chars") * F.col("nn") > F.col("sc"), 1).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("xd"),
        )
    )
    gx = per.agg(F.sum("xd").cast("long").alias("xx"))
    z = per.crossJoin(F.broadcast(gx)).select(
        "source",
        (
            (
                F.col("xd").cast("double")
                - (F.col("nd") * F.col("xx")).cast("double") / F.col("nn")
            )
            / F.sqrt(
                (F.col("nd") * F.col("xx") * (F.col("nn") - F.col("xx"))).cast(
                    "double"
                )
                / (F.col("nn").cast("double") * F.col("nn"))
            )
        ).alias("zstat"),
    )
    p = z.select(
        "source",
        F.round(F.col("zstat"), 6).alias("z_stat"),
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(2.0) * F.exp(-(F.col("zstat") * F.col("zstat")) / 2.0),
            ),
            9,
        ).alias("p_value"),
    )
    w = Window.orderBy("p_value", "source")
    ranked = p.select(
        "source",
        "z_stat",
        "p_value",
        F.row_number().over(w).alias("k"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("m"),
    )
    kstar = ranked.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("p_value")
                    <= F.col("k").cast("double") * 0.05 / F.col("m"),
                    F.col("k"),
                )
            ),
            F.lit(0),
        ).alias("ks")
    )
    return (
        ranked.crossJoin(F.broadcast(kstar))
        .select(
            "source",
            "z_stat",
            "p_value",
            F.col("k").cast("bigint").alias("p_rank"),
            F.round(F.col("k").cast("double") * 0.05 / F.col("m"), 9).alias(
                "bh_threshold"
            ),
            (F.col("k") <= F.col("ks")).alias("rejected"),
        )
        .orderBy("p_rank")
    )


# Mann–Kendall trend test over daily event revenue — the
# distribution-free "is there a monotone trend" significance test that
# completes theil_sen (the slope) and daily_revenue_trend (the OLS
# line): S = sum over day pairs of sign(y_j − y_i), tie-corrected
# variance, z with the ±1 continuity correction.  The daily series is
# calendar-bounded, so the pair space is a dimension×dimension
# self-join (30 days → 435 pairs) — relational on both engines, no
# O(n²) array fold, no data-sized shuffle; S and 18·Var(S) are exact
# integers, z is one division + one sqrt (both correctly rounded).
@query(
    "mann_kendall_daily",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT))
                  AS BIGINT) AS yu
      FROM events GROUP BY 1
    ),
    n_ AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
    s_ AS (
      SELECT CAST(SUM(CASE WHEN b.yu > a.yu THEN 1
                           WHEN b.yu < a.yu THEN -1 ELSE 0 END) AS BIGINT) AS s
      FROM daily a JOIN daily b ON a.d < b.d
    ),
    ties AS (
      SELECT COALESCE(CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT), 0) AS tt
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY yu)
      WHERE t > 1
    ),
    v AS (
      SELECT s, n,
             CAST(n * (n - 1) * (2 * n + 5) - tt AS DOUBLE) / 18.0 AS var_s
      FROM s_, n_, ties
    )
    SELECT n AS n_days, s AS s_stat, round(var_s, 6) AS var_s,
           round(CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
                      WHEN s < 0 THEN (s + 1) / sqrt(var_s)
                      ELSE 0.0 END, 6) AS z_stat,
           CASE WHEN CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
                          WHEN s < 0 THEN (s + 1) / sqrt(var_s)
                          ELSE 0.0 END > 1.96 THEN 'increasing'
                WHEN CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
                          WHEN s < 0 THEN (s + 1) / sqrt(var_s)
                          ELSE 0.0 END < -1.96 THEN 'decreasing'
                ELSE 'no trend' END AS trend
    FROM v
    """,
)
def mann_kendall_daily(spark, sf_dir):
    e = _events(spark, sf_dir)
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(_units4("value")).cast("long").alias("yu")
    )
    daily = F.broadcast(daily)
    a = daily.alias("a")
    b = daily.alias("b")
    s_ = (
        a.join(b, F.col("a.d") < F.col("b.d"))
        .agg(
            F.sum(
                F.when(F.col("b.yu") > F.col("a.yu"), 1)
                .when(F.col("b.yu") < F.col("a.yu"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s")
        )
    )
    n_ = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ties = (
        daily.groupBy("yu")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ).cast("long"),
                F.lit(0),
            ).alias("tt")
        )
    )
    v = (
        s_.crossJoin(F.broadcast(n_))
        .crossJoin(F.broadcast(ties))
        .select(
            "s",
            "n",
            (
                (
                    F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                    - F.col("tt")
                ).cast("double")
                / F.lit(18.0)
            ).alias("var_s"),
        )
    )
    zexpr = (
        F.when(F.col("s") > 0, (F.col("s") - 1) / F.sqrt(F.col("var_s")))
        .when(F.col("s") < 0, (F.col("s") + 1) / F.sqrt(F.col("var_s")))
        .otherwise(F.lit(0.0))
    )
    return v.select(
        F.col("n").alias("n_days"),
        F.col("s").alias("s_stat"),
        F.round(F.col("var_s"), 6).alias("var_s"),
        F.round(zexpr, 6).alias("z_stat"),
        F.when(zexpr > 1.96, F.lit("increasing"))
        .when(zexpr < -1.96, F.lit("decreasing"))
        .otherwise(F.lit("no trend"))
        .alias("trend"),
    )
