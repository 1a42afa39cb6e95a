"""Round-8 wave 32 — corpus-statistics quality signals: per-document
character entropy (the gibberish/boilerplate detector of the C4/Gopher
family), and a sequence-length bucketing
audit for padded-batch serving efficiency."""

from __future__ import annotations

from ._registry import F, _t, query


# Per-document character-level Shannon entropy — low-entropy documents
# are repeated-character runs, template spam, or binary-ish noise; the
# classic cheap filter beside the Gopher rule battery.  H =
# −Σ (c/L)·log2(c/L) over the doc's character histogram.  Parity: each
# c/L is ONE correctly-rounded division of exact ints (identical
# doubles), and the ln calls — not correctly rounded in either engine —
# are applied to those identical inputs and folded in CHARACTER order
# inside one per-doc array (the bigram_logprob discipline), with the
# final value under round-6.  Plan: explode chars → (doc, char) counts
# (map-side combine collapses runs before the shuffle) → per-doc fold;
# one data-sized shuffle keyed on (doc_id, char).
@query(
    "char_entropy_docs",
    """
    WITH ch AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '')) AS c
      FROM documents WHERE length(text) >= 1
    ),
    cnt AS (
      SELECT doc_id, c, CAST(COUNT(*) AS BIGINT) AS n
      FROM ch WHERE c <> '' GROUP BY doc_id, c
    ),
    tot AS (
      SELECT doc_id, CAST(SUM(n) AS BIGINT) AS l,
             list(CAST(n AS DOUBLE) ORDER BY c) AS ns
      FROM cnt GROUP BY doc_id
    )
    SELECT doc_id, l AS n_chars_counted,
           round(
             -list_reduce(
                list_prepend(CAST(0 AS DOUBLE),
                  list_transform(ns, x -> (x / l) * ln(x / l))),
                (p, q) -> p + q) / ln(2.0), 6) AS entropy_bits,
           -list_reduce(
              list_prepend(CAST(0 AS DOUBLE),
                list_transform(ns, x -> (x / l) * ln(x / l))),
              (p, q) -> p + q) / ln(2.0) < 2.0 AS low_entropy
    FROM tot ORDER BY doc_id
    """,
)
def char_entropy_docs(spark, sf_dir):
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.length("text") >= 1)
        .select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), "")).alias("c"),
        )
        .filter(F.col("c") != "")
    )
    cnt = d.groupBy("doc_id", "c").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = cnt.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("l"),
        F.expr(
            "transform(array_sort(collect_list(struct(c, CAST(n AS DOUBLE)))),"
            " s -> s.col2)"
        ).alias("ns"),
    )
    h = F.expr(
        "-aggregate(transform(ns, x -> (x / l) * ln(x / l)),"
        " CAST(0.0 AS DOUBLE), (p, q) -> p + q) / ln(2.0)"
    )
    return tot.select(
        "doc_id",
        F.col("l").alias("n_chars_counted"),
        F.round(h, 6).alias("entropy_bits"),
        (h < 2.0).alias("low_entropy"),
    ).orderBy("doc_id")


# Sequence-length bucketing audit — padded-batch serving/training
# wastes compute on pad tokens up to each batch's max length; bucketing
# by length bounds the waste.  Audit: split docs into 4 equal-rank
# buckets by token count (bucket = ((rn−1)·4) div n + 1 over the
# deterministic (tok, doc_id) order — the SAME closed-form rank
# arithmetic on both engines, not engine-ntile), and report per bucket
# the padded vs used token mass and the waste ratio.  Padded mass is
# cnt·max − Σtok — exact integers; one division at the end.  The
# global rank is the two-phase range-exchange primitive
# (operators/rank.global_row_number), so no single-task sort at scale.
@query(
    "length_bucketing_audit_docs",
    """
    WITH d AS (
      SELECT doc_id,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS tok
      FROM documents
    ),
    n_ AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
    ranked AS (
      SELECT tok, row_number() OVER (ORDER BY tok, doc_id) AS rn FROM d
    ),
    bucketed AS (
      SELECT tok, ((rn - 1) * 4) // n + 1 AS bucket FROM ranked, n_
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(tok) AS BIGINT) AS max_tok,
           CAST(COUNT(*) * MAX(tok) AS BIGINT) AS padded_tokens,
           CAST(SUM(tok) AS BIGINT) AS used_tokens,
           round(CAST(COUNT(*) * MAX(tok) - SUM(tok) AS DOUBLE)
                 / (COUNT(*) * MAX(tok)), 6) AS waste_ratio
    FROM bucketed GROUP BY bucket ORDER BY bucket
    """,
)
def length_bucketing_audit_docs(spark, sf_dir):
    from ..operators.rank import global_row_number
    from ..operators.text import token_count_ws

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count_ws(F.col("text")).cast("long").alias("tok")
    )
    n_ = d.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ranked = global_row_number(d, [F.asc("tok"), F.asc("doc_id")], out_col="rn")
    bucketed = ranked.crossJoin(F.broadcast(n_)).select(
        "tok",
        F.expr("((rn - 1) * 4) div n").alias("b0"),
    )
    return (
        bucketed.select("tok", (F.col("b0") + 1).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.max("tok").cast("long").alias("max_tok"),
            F.sum("tok").cast("long").alias("used_tokens"),
        )
        .select(
            F.col("bucket").cast("bigint").alias("bucket"),
            "n_docs",
            "max_tok",
            (F.col("n_docs") * F.col("max_tok"))
            .cast("long")
            .alias("padded_tokens"),
            "used_tokens",
            F.round(
                (F.col("n_docs") * F.col("max_tok") - F.col("used_tokens")).cast(
                    "double"
                )
                / (F.col("n_docs") * F.col("max_tok")),
                6,
            ).alias("waste_ratio"),
        )
        .orderBy("bucket")
    )
