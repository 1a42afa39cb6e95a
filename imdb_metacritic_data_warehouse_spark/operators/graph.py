"""Distributed graph analytics over edge DataFrames.

PageRank via synchronous power iteration — the classic "importance on a
co-occurrence graph" signal (co-purchased parts, co-cited docs, link
graphs).  Everything is DataFrame joins/aggregates:

    contrib(v) = Σ_{u→v} pr(u) / out_deg(u)
    pr'(v)     = (1-d)/N + d · contrib(v)

Scale shape: per iteration one join edges⋈ranks on the source key and
one aggregate on the destination key — both partition by node id, no
global state.  ``localCheckpoint`` after each iteration bounds the
lineage exactly like the connected-components loop in
operators/dedup.py (an iterative plan otherwise doubles per round and
eventually overwhelms the optimizer).  N and the degree table are
data-derived but the only driver-side value is the scalar N.

On an UNDIRECTED graph (edges present in both directions, as
``undirected_edges`` builds) every node has out-degree ≥ 1, so there is
no dangling-mass term — the simple update above conserves probability
exactly.  For directed graphs with sinks, add the dangling term before
reusing this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirected_edges(pairs: DataFrame, a: str, b: str) -> DataFrame:
    """Symmetrize distinct (a < b) pairs into a both-directions edge
    list with columns (src, dst)."""
    fwd = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    return fwd.unionByName(
        pairs.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    )


def pagerank(
    edges: DataFrame, iters: int = 3, damping: float = 0.85
) -> DataFrame:
    """Power-iteration PageRank over an (src, dst) edge list.

    Returns (node, pr).  ``iters`` fixed and small keeps the result
    SQL-oracle-expressible (the DuckDB twin unrolls the same
    iterations); production runs would iterate to an L1 tolerance the
    same way connected_components loops to a fixpoint.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()  # scalar only — not a data collect
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # edges⋈degree is loop-invariant: materialize once, reuse per round
    e = edges.join(deg, "src").localCheckpoint(eager=True)

    base = (1.0 - damping) / n_nodes
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("pr"))
    for _ in range(iters):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("pr") / F.col("out_deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base) + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
