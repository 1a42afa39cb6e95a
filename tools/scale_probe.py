"""Scale probe: time selected queries at 1× and N× the sf0.1 corpus.

Replicates documents/embeddings/orders/events N× (ids re-keyed so
dedup/grouping semantics stay honest — replica k of doc d gets id
d + k·10^7), writes the scaled tables to a scratch dir, then times
each query at both scales with bench.py's warm-up + best-of-2
protocol.  A healthy scan-shaped operator should scale ≤ N× in time;
shuffle-shaped ones should stay well under N·log-ish.

Usage: python tools/scale_probe.py [N] [query ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = "/tmp/spark_graft_scale_probe"

DEFAULT_QUERIES = [
    "bm25_docs",
    "dup_ngram_fraction_docs",
    "contamination_ngram_docs",
    "quality_logit_docs",
    "balanced_resample_docs",
    "embedding_centroid_outliers",
    "compaction_plan_orders",
    "funnel_conversion_events",
    "cohort_retention_events",
    "knn_graph_embeddings",
    "bpe_pair_counts_docs",
    "ngram_containment_pairs",
    "stratified_topk_docs",
    "select_token_budget_docs",
]

# which tables each probe query actually reads (others are symlinked)
SCALED_TABLES = ["documents", "embeddings", "orders", "events", "lineitem"]
ID_COLS = {
    "documents": "doc_id",
    "embeddings": "vec_id",
    "orders": "o_orderkey",
    "events": "event_id",
    # replicas re-key the ORDER, not the part: N× more orders over the
    # same part catalog — the realistic densification for co-occurrence
    # graph probes (edge count grows sub-linearly, weights grow)
    "lineitem": "l_orderkey",
}


def build_scaled(spark, n: int) -> str:
    from pyspark.sql import functions as F

    # the scratch path encodes WHICH tables are scaled: a cached dir
    # built before a table joined SCALED_TABLES would otherwise be
    # reused with that table still a 1x symlink, silently probing Nx
    # timings against unscaled data (ADVICE r3)
    import hashlib

    tset = hashlib.md5("|".join(SCALED_TABLES).encode()).hexdigest()[:8]
    out = f"{SCRATCH}/x{n}-{tset}"
    if os.path.isdir(out):
        return out
    os.makedirs(out, exist_ok=True)
    for t in SCALED_TABLES:
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        idc = ID_COLS[t]
        reps = [
            df.withColumn(idc, F.col(idc) + F.lit(k * 10_000_000)) for k in range(n)
        ]
        scaled = reps[0]
        for r in reps[1:]:
            scaled = scaled.unionByName(r)
        scaled.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    for t in ["region", "nation", "customer", "supplier", "part", "lineitem"]:
        src = f"{BASE}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(src, dst)
    return out


def time_query(qs, spark, name: str, sf_dir: str) -> float:
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best or 1e9, time.perf_counter() - t0)
    return best


def main():
    args = [a for a in sys.argv[1:]]
    n = int(args[0]) if args and args[0].isdigit() else 16
    names = args[1:] if len(args) > 1 else DEFAULT_QUERIES

    import __spark_entry__ as ent
    from imdb_metacritic_data_warehouse_spark.session import get_spark

    spark = get_spark("scale_probe")
    qs = ent.queries()
    scaled_dir = build_scaled(spark, n)

    print(f"{'query':35s} {'1x':>8s} {f'{n}x':>8s} {'ratio':>7s}")
    for name in names:
        t1 = time_query(qs, spark, name, BASE)
        tn = time_query(qs, spark, name, scaled_dir)
        print(f"{name:35s} {t1:8.2f} {tn:8.2f} {tn / t1:7.1f}")
    spark.stop()


if __name__ == "__main__":
    shutil.rmtree(SCRATCH, ignore_errors=True) if "--fresh" in sys.argv else None
    main()
