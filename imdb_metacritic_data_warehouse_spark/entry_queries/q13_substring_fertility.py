"""Round-8 wave 29 — exact substring-level dedup spans (the
deterministic character-level complement to the word-shingle MinHash /
SimHash paths), a precision-recall-of-distributions divergence frontier
over embedding populations, and a tokenizer fertility-drift audit
across vocabulary versions (verdict r7 task #7)."""

from __future__ import annotations

from pyspark.sql import Window

from ._registry import F, _t, query
from .q02_pipeline_parity import _bpe_round_sql


# Exact repeated-substring spans — the suffix-array-style dedup signal
# of "Deduplicating Training Data Makes Language Models Better" (Lee
# et al. 2022), re-expressed Spark-first: instead of a monolithic
# suffix array (one global sort of every suffix — a single-machine
# structure), index every character K-gram, keep positions whose gram
# occurs more than once in the corpus, and merge runs of consecutive
# duplicated positions into MAXIMAL duplicated spans per document
# (gaps-and-islands).  A position p starts a duplicated span of length
# >= K iff its K-gram repeats, and consecutive duplicated positions
# extend the same span, so island [p_min, p_max] covers exactly the
# maximal duplicated substring [p_min, p_max + K - 1] — the same spans
# a suffix array would report at threshold K, found with ONE hash
# shuffle on the gram (uniform md5-like key distribution: natural-text
# 16-grams don't skew) plus ONE per-doc window.  No pair emission, no
# quadratic blow-up: cost is O(total chars) rows.  At 100 TB: stride
# the position grid (p % s == 0 finds spans >= K + s - 1) or raise K;
# the plan shape is unchanged.  All-integer/string ops -> exact parity.
@query(
    "substring_dup_spans_docs",
    """
    WITH t AS (
      SELECT doc_id, lower(text) AS t, length(lower(text)) AS tl
      FROM documents WHERE length(text) >= 16
    ),
    pos AS (
      SELECT doc_id, tl, CAST(g.i AS BIGINT) AS p,
             substr(t, CAST(g.i AS INTEGER), 16) AS g
      FROM t, LATERAL (
        SELECT unnest(generate_series(1, CAST(tl - 15 AS BIGINT))) AS i
      ) g
    ),
    dup AS (
      SELECT doc_id, tl, p FROM (
        SELECT doc_id, tl, p, COUNT(*) OVER (PARTITION BY g) AS c FROM pos
      ) WHERE c > 1
    ),
    isl AS (
      -- interval merge, not unit-step islands: two duplicated starts
      -- p1 < p2 with p2 <= p1 + 16 produce overlapping/adjacent
      -- 16-char spans that must fuse into ONE region, else dup_chars
      -- double-counts the overlap (caught by the planted-duplicate
      -- test).  New region iff p exceeds the running max span end + 1.
      SELECT doc_id, tl, p,
             CAST(SUM(CASE WHEN prev_e IS NULL OR p > prev_e + 1
                           THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id ORDER BY p) AS BIGINT) AS grp
      FROM (
        SELECT doc_id, tl, p,
               MAX(p + 15) OVER (PARTITION BY doc_id ORDER BY p
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_e
        FROM dup
      )
    ),
    spans AS (
      SELECT doc_id, tl, MIN(p) AS s, MAX(p) + 15 AS e
      FROM isl GROUP BY doc_id, tl, grp
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(e - s + 1) AS BIGINT) AS dup_chars,
           round(CAST(SUM(e - s + 1) AS DOUBLE) / tl, 6) AS dup_ratio
    FROM spans GROUP BY doc_id, tl ORDER BY doc_id
    """,
)
def substring_dup_spans_docs(spark, sf_dir):
    K = 16
    t = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.lower(F.col("text")).alias("t"))
        .filter(F.length("t") >= K)
        .withColumn("tl", F.length("t").cast("long"))
    )
    pos = t.select(
        "doc_id",
        "tl",
        F.explode(F.sequence(F.lit(1), (F.col("tl") - (K - 1)).cast("int"))).alias(
            "pi"
        ),
        F.col("t"),
    ).select(
        "doc_id",
        "tl",
        F.col("pi").cast("long").alias("p"),
        F.col("t").substr(F.col("pi"), F.lit(K)).alias("g"),
    )
    dup = pos.withColumn(
        "c", F.count(F.lit(1)).over(Window.partitionBy("g"))
    ).filter(F.col("c") > 1)
    # interval merge (see oracle comment): fuse overlapping/adjacent
    # K-char spans via the running max of span ends.
    wdoc = Window.partitionBy("doc_id").orderBy("p")
    isl = dup.withColumn(
        "prev_e",
        F.max(F.col("p") + (K - 1)).over(
            wdoc.rowsBetween(Window.unboundedPreceding, -1)
        ),
    ).withColumn(
        "grp",
        F.sum(
            F.when(
                F.col("prev_e").isNull() | (F.col("p") > F.col("prev_e") + 1),
                1,
            ).otherwise(0)
        )
        .over(wdoc)
        .cast("bigint"),
    )
    spans = isl.groupBy("doc_id", "tl", "grp").agg(
        F.min("p").alias("s"), (F.max("p") + (K - 1)).alias("e")
    )
    return (
        spans.groupBy("doc_id", "tl")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_spans"),
            F.sum(F.col("e") - F.col("s") + 1).cast("bigint").alias("dup_chars"),
        )
        .select(
            "doc_id",
            "n_spans",
            "dup_chars",
            F.round(
                F.col("dup_chars").cast("double") / F.col("tl").cast("double"), 6
            ).alias("dup_ratio"),
        )
        .orderBy("doc_id")
    )


# Precision-recall of distributions (Sajjadi et al. 2018) — the
# two-number generalization of a single divergence score (js_divergence
# reports ONE number; PRD reports the whole precision/recall frontier
# between a model distribution and a reference distribution).  Here the
# two embedding populations are the even/odd vec_id halves, discretized
# onto 16 cells by the sign pattern of the first 4 coordinates (a
# deterministic, SQL-expressible quantizer; the IVF sampled quantizer
# is the production path for finer cells).  alpha(l) = sum_i
# min(l*p_i, q_i), beta(l) = sum_i min(p_i, q_i/l) over a DYADIC
# lambda grid {1/8..8} — exact powers of two, so every min() compares
# and every sum accumulates INTEGERS when multiplied through by
# n_p*n_q (the rule-#6 discipline: parity math in integer space; one
# correctly-rounded division at the end).  Cost: one pass over the
# embeddings (conditional aggregate per cell) + a 16x7 literal
# cross join — nothing data-sized shuffles twice at any scale.
@query(
    "prd_divergence_embeddings",
    """
    WITH cells AS (
      SELECT
        (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
        + 2 * (CASE WHEN embedding[2] > 0 THEN 1 ELSE 0 END)
        + 4 * (CASE WHEN embedding[3] > 0 THEN 1 ELSE 0 END)
        + 8 * (CASE WHEN embedding[4] > 0 THEN 1 ELSE 0 END) AS cell,
        CAST(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_p
      FROM embeddings
    ),
    hist AS (
      SELECT cell, CAST(SUM(is_p) AS BIGINT) AS cp,
             CAST(SUM(1 - is_p) AS BIGINT) AS cq
      FROM cells GROUP BY cell
    ),
    tot AS (
      SELECT CAST(SUM(cp) AS BIGINT) AS np, CAST(SUM(cq) AS BIGINT) AS nq
      FROM hist
    ),
    lam AS (
      SELECT unnest([CAST(1 AS BIGINT), 1, 1, 1, 2, 4, 8]) AS num,
             unnest([CAST(8 AS BIGINT), 4, 2, 1, 1, 1, 1]) AS den
    ),
    terms AS (
      -- alpha(l)*den*np*nq as an exact int64; recall needs no second
      -- sum: beta(l) = sum_i min(p_i, q_i/l) = alpha(l)/l, so it is
      -- the SAME integer divided by num*np*nq instead of den*np*nq.
      SELECT l.num, l.den,
             CAST(SUM(LEAST(l.num * h.cp * t.nq, l.den * h.cq * t.np))
                  AS BIGINT) AS a_int
      FROM hist h CROSS JOIN tot t CROSS JOIN lam l
      GROUP BY l.num, l.den
    )
    SELECT CAST(num AS DOUBLE) / den AS lam,
           round(CAST(a_int AS DOUBLE) / (CAST(den AS DOUBLE)
                 * (SELECT np FROM tot) * (SELECT nq FROM tot)), 6)
             AS precision_a,
           round(CAST(a_int AS DOUBLE) / (CAST(num AS DOUBLE)
                 * (SELECT np FROM tot) * (SELECT nq FROM tot)), 6)
             AS recall_b
    FROM terms ORDER BY lam
    """,
)
def prd_divergence_embeddings(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    cell = (
        F.when(v[0] > 0, 1).otherwise(0)
        + 2 * F.when(v[1] > 0, 1).otherwise(0)
        + 4 * F.when(v[2] > 0, 1).otherwise(0)
        + 8 * F.when(v[3] > 0, 1).otherwise(0)
    )
    cells = e.select(
        cell.alias("cell"),
        F.when(F.col("vec_id") % 2 == 0, 1).otherwise(0).cast("long").alias(
            "is_p"
        ),
    )
    hist = cells.groupBy("cell").agg(
        F.sum("is_p").cast("long").alias("cp"),
        F.sum(F.lit(1) - F.col("is_p")).cast("long").alias("cq"),
    )
    tot = hist.agg(
        F.sum("cp").cast("long").alias("np"), F.sum("cq").cast("long").alias("nq")
    )
    # dyadic lambda grid as (num, den) integer pairs: 1/8 .. 8
    lam = spark.createDataFrame(
        [(1, 8), (1, 4), (1, 2), (1, 1), (2, 1), (4, 1), (8, 1)],
        "num long, den long",
    )
    terms = (
        hist.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(lam))
        .groupBy("num", "den")
        .agg(
            F.sum(
                F.least(
                    F.col("num") * F.col("cp") * F.col("nq"),
                    F.col("den") * F.col("cq") * F.col("np"),
                )
            )
            .cast("long")
            .alias("a_int")
        )
    )
    # beta(l) = alpha(l)/l: same exact integer, denominator num instead
    # of den (see the oracle's terms comment).
    nn = F.col("np").cast("double") * F.col("nq").cast("double")
    return (
        terms.crossJoin(F.broadcast(tot))
        .select(
            (F.col("num").cast("double") / F.col("den")).alias("lam"),
            F.round(
                F.col("a_int").cast("double") / (F.col("den").cast("double") * nn),
                6,
            ).alias("precision_a"),
            F.round(
                F.col("a_int").cast("double") / (F.col("num").cast("double") * nn),
                6,
            ).alias("recall_b"),
        )
        .orderBy("lam")
    )


# Tokenizer fertility drift across vocabulary versions — the
# train-side audit a tokenizer upgrade needs: encode the SAME corpus
# under vocab v1 (1 BPE merge) and vocab v2 (2 merges; the
# bpe_train_merges_docs trainer) and report per-source fertility
# (tokens per word) under each, plus the drop v1->v2.  A fertility
# drift concentrated in one source means the new merges specialize to
# that source's vocabulary — the practical signal for re-balancing
# the merge-training mixture.  All counts stay integers (token counts
# are symbol counts); only the final per-source ratios divide and
# round.  Scale: both encodes are vocabulary-sized broadcast joins
# onto ONE corpus word-count pass, like bpe_encode_docs.
@query(
    "tokenizer_fertility_drift",
    f"""
    WITH words AS (
      SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
    ),
    wc AS (SELECT w, COUNT(*) AS c FROM words GROUP BY w),
    s0 AS (
      SELECT w, c, CAST(g.i AS INTEGER) AS pos,
             substr(w, CAST(g.i AS INTEGER), 1) AS sym
      FROM wc, LATERAL (
        SELECT unnest(generate_series(1, CAST(len(w) AS BIGINT))) AS i
      ) g
      WHERE len(w) >= 1
    ),
    {_bpe_round_sql(1, "s0")},
    {_bpe_round_sql(2, "s1")},
    wtok1 AS (SELECT w, COUNT(*) AS n1 FROM s1 GROUP BY w),
    wtok2 AS (SELECT w, COUNT(*) AS n2 FROM s2 GROUP BY w),
    docw AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS w
      FROM documents
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n1) AS BIGINT) AS tokens_v1,
           CAST(SUM(n2) AS BIGINT) AS tokens_v2,
           round(CAST(SUM(n1) AS DOUBLE) / COUNT(*), 6) AS fertility_v1,
           round(CAST(SUM(n2) AS DOUBLE) / COUNT(*), 6) AS fertility_v2,
           round(CAST(SUM(n1) - SUM(n2) AS DOUBLE) / COUNT(*), 6)
             AS fertility_drop
    FROM docw JOIN wtok1 USING (w) JOIN wtok2 USING (w)
    GROUP BY source ORDER BY source
    """,
)
def tokenizer_fertility_drift(spark, sf_dir):
    from ..operators.text import bpe_word_token_counts, tokens

    d = _t(spark, sf_dir, "documents")
    w1 = bpe_word_token_counts(d, merges=1).withColumnRenamed("n_sym", "n1")
    w2 = bpe_word_token_counts(d, merges=2).withColumnRenamed("n_sym", "n2")
    docw = d.select("source", F.explode(tokens(F.col("text"))).alias("w"))
    return (
        docw.join(F.broadcast(w1), "w")
        .join(F.broadcast(w2), "w")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n1").cast("bigint").alias("tokens_v1"),
            F.sum("n2").cast("bigint").alias("tokens_v2"),
        )
        .select(
            "source",
            "n_words",
            "tokens_v1",
            "tokens_v2",
            F.round(
                F.col("tokens_v1").cast("double") / F.col("n_words"), 6
            ).alias("fertility_v1"),
            F.round(
                F.col("tokens_v2").cast("double") / F.col("n_words"), 6
            ).alias("fertility_v2"),
            F.round(
                (F.col("tokens_v1") - F.col("tokens_v2")).cast("double")
                / F.col("n_words"),
                6,
            ).alias("fertility_drop"),
        )
        .orderBy("source")
    )
