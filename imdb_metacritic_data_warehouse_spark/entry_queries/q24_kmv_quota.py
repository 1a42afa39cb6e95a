"""Round-10 wave 42 — scalable sketch + quota ops: deterministic KMV
(k-minimum-values) distinct sketches with pairwise union/intersection
estimates (the mergeable twin of the EXACT source_overlap_matrix — at
100 TB you cannot intersect sources exactly per pair, but k-min hash
sets merge in k log k), and per-domain quota sampling (crawl-style cap
enforcement composed with the URL/registrable-domain machinery).
"""

from __future__ import annotations

from ._registry import F, _t, query

_KMV_K = 64
# the 60-bit hash space the shingle/jaccard machinery already uses
_KMV_SPACE = float(1 << 60)

_QUOTA_CAP = 30


# KMV sketch (Bar-Yossef et al. 2002; the theta-sketch ancestor): a
# set's k smallest 60-bit content hashes.  est_distinct = (k−1)·H/M
# where M is the k-th minimum and H the hash space; sketches MERGE by
# re-sorting the union of two k-sets — so per-source sketches built in
# one corpus pass answer ALL pairwise overlaps from 20 tiny arrays,
# where the exact matrix re-shuffles the corpus per pair at scale.
# Intersection estimate is the standard KMV combination: jaccard_est =
# |A_k ∩ B_k ∩ union_k| / k, est_inter = jaccard_est · est_union.
# Everything is DETERMINISTIC (content hashes, integer mins), so the
# oracle checks the estimates bit-for-bit; the semantic test audits
# them against exact distinct counts within the sketch's error band.
# Shape: one distinct aggregate on (source, hash) — uniform — then
# grouped_topk (two-phase k-min, no per-source window), then a
# 20×20 sketch self-join of dimension-sized rows.
@query(
    "kmv_overlap_sources",
    f"""
    WITH fps AS (
      SELECT DISTINCT source,
             CAST(CONCAT('0x', substr(md5(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
             ), 1, 15)) AS BIGINT) AS h
      FROM documents
    ),
    sk AS (
      SELECT source, (list_sort(list(h)))[1:{_KMV_K}] AS l
      FROM fps GROUP BY source
    ),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             (list_sort(list_distinct(a.l || b.l)))[1:{_KMV_K}] AS merged,
             a.l AS la, b.l AS lb
      FROM sk a JOIN sk b ON a.source < b.source
    )
    SELECT source_a, source_b,
           round(({_KMV_K} - 1) * {_KMV_SPACE!r}
                 / merged[least(len(merged), {_KMV_K})], 4) AS est_union,
           CAST(len(list_intersect(list_intersect(la, lb), merged)) AS BIGINT)
             AS inter_hits,
           round(CAST(len(list_intersect(list_intersect(la, lb), merged)) AS DOUBLE)
                 / {_KMV_K}, 6) AS jaccard_est,
           round(CAST(len(list_intersect(list_intersect(la, lb), merged)) AS DOUBLE)
                 / {_KMV_K}
                 * (({_KMV_K} - 1) * {_KMV_SPACE!r}
                    / merged[least(len(merged), {_KMV_K})]), 4) AS est_inter
    FROM pairs ORDER BY source_a, source_b
    """,
)
def kmv_overlap_sources(spark, sf_dir):
    from ..operators.rank import grouped_topk
    from ..operators.text import fingerprint

    d = _t(spark, sf_dir, "documents")
    fps = d.select(
        "source",
        F.conv(F.substring(fingerprint(F.col("text")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    ).distinct()
    sk = grouped_topk(
        fps, ["source"], F.struct(F.col("h").alias("h")), _KMV_K
    ).select(
        "source", F.expr("transform(__top, x -> x.h)").alias("l")
    )
    a = sk.select(F.col("source").alias("source_a"), F.col("l").alias("la"))
    b = sk.select(F.col("source").alias("source_b"), F.col("l").alias("lb"))
    pairs = a.join(b, F.col("source_a") < F.col("source_b")).select(
        "source_a",
        "source_b",
        "la",
        "lb",
        F.slice(
            F.array_sort(F.array_union(F.col("la"), F.col("lb"))), 1, _KMV_K
        ).alias("merged"),
    )
    kth = F.element_at(
        F.col("merged"), F.least(F.size("merged"), F.lit(_KMV_K))
    )
    hits = F.size(
        F.array_intersect(
            F.array_intersect(F.col("la"), F.col("lb")), F.col("merged")
        )
    )
    est_union = (F.lit(float(_KMV_K - 1)) * F.lit(_KMV_SPACE)) / kth
    return pairs.select(
        "source_a",
        "source_b",
        F.round(est_union, 4).alias("est_union"),
        hits.cast("bigint").alias("inter_hits"),
        F.round(hits.cast("double") / F.lit(_KMV_K), 6).alias("jaccard_est"),
        F.round(hits.cast("double") / F.lit(_KMV_K) * est_union, 4).alias(
            "est_inter"
        ),
    ).orderBy("source_a", "source_b")


# Per-domain quota sampling — the crawl/ingest-side cap a web corpus
# enforces so no registrable domain dominates the mixture (RefinedWeb/
# C4-style per-domain limits).  Membership is deterministic: within
# each domain keep the ``cap`` docs with the smallest content-hash
# rank (hash of the doc id — stable across reruns and engines, the
# deterministic_sample_split discipline), reported here as per-domain
# kept mass + an id-sum checksum of the kept set so the driver hash
# pins the SELECTION, not just the counts.  Shape: map-only URL
# synthesis/extraction, then grouped_topk — never a per-domain window.
@query(
    "domain_quota_sample_docs",
    f"""
    WITH u AS (
      SELECT doc_id,
             concat(CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'www.'
                         WHEN 1 THEN 'm.' ELSE '' END,
                    source,
                    CASE CAST(doc_id % 2 AS INTEGER) WHEN 0 THEN '.com'
                         ELSE '.org' END) AS host
      FROM documents
    ),
    dom AS (
      SELECT doc_id, regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS domain,
             CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS hr
      FROM u
    ),
    kept AS (
      SELECT domain, hr, doc_id,
             row_number() OVER (PARTITION BY domain ORDER BY hr, doc_id) AS rk
      FROM dom
    )
    SELECT domain,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rk <= {_QUOTA_CAP} THEN 1 ELSE 0 END) AS BIGINT)
             AS kept,
           CAST(SUM(CASE WHEN rk <= {_QUOTA_CAP} THEN doc_id ELSE 0 END)
                AS BIGINT) AS kept_id_sum
    FROM kept GROUP BY domain ORDER BY domain
    """,
)
def domain_quota_sample_docs(spark, sf_dir):
    from ..functions.parsing import registrable_domain
    from ..operators.rank import grouped_topk

    d = _t(spark, sf_dir, "documents")
    dom = d.select(
        "doc_id",
        registrable_domain(
            F.concat(
                F.lit("https://"),
                F.when(F.col("doc_id") % 3 == 0, F.lit("www."))
                .when(F.col("doc_id") % 3 == 1, F.lit("m."))
                .otherwise(F.lit("")),
                F.col("source"),
                F.when(F.col("doc_id") % 2 == 0, F.lit(".com")).otherwise(
                    F.lit(".org")
                ),
            )
        ).alias("domain"),
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
        )
        .cast("long")
        .alias("hr"),
    )
    counts = dom.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    rec = F.struct(F.col("hr").alias("hr"), F.col("doc_id").alias("doc_id"))
    top = grouped_topk(dom, ["domain"], rec, _QUOTA_CAP).select(
        "domain",
        F.size("__top").cast("bigint").alias("kept"),
        F.expr(
            "aggregate(__top, 0L, (acc, x) -> acc + x.doc_id)"
        ).cast("bigint").alias("kept_id_sum"),
    )
    return (
        counts.join(top, "domain")
        .select("domain", "n_docs", "kept", "kept_id_sum")
        .orderBy("domain")
    )
