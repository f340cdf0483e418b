"""Iterative link-analysis over an edges frame: PageRank.

The scale path for the metadata plane's DAG analytics (SURVEY.md §2.1 maps
graph ops onto nodes/edges DataFrames) and for corpus-level link graphs
(page/domain authority as a quality prior — the classic web-curation
signal). Same iterative-DataFrame posture as dedup.py::connected_components:
each round is one equi-join + one aggregate, with ``localCheckpoint`` per
round so lineage (and thus replay cost / stack depth) stays O(1) instead of
O(iters).

Model: standard damped PageRank without dangling-mass redistribution
(dangling nodes keep the teleport term only) — the simplification every
join-based implementation uses; document, don't hide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Rank nodes of a directed graph; returns ``id, pagerank``.

    Scale design: node set and out-degrees are computed once; every
    iteration shuffles only (dst, contribution) pairs — partial-aggregated
    map-side — and the node-count scalar rides a 1-row broadcast crossJoin
    (no driver collect). Hot destination nodes are ordinary aggregate skew,
    which AQE splits; rank state is checkpointed per round so failure
    recovery never replays the whole chain.
    """
    # e/nodes/n1 are all reused EVERY round: without pinning them, each
    # iteration re-runs the upstream edge-derivation job three times over
    # (once via weighted, once via nodes, once via n1) — measured as the
    # bulk of ext_pagerank's wall time. localCheckpoint materializes once.
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("deg"))
    n1 = nodes.agg(F.count(F.lit(1)).cast("double").alias("n")).localCheckpoint(
        eager=False
    )

    ranks = nodes.crossJoin(F.broadcast(n1)).select(
        "id", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    # edges pre-joined with out-degree once; reused every round
    weighted = e.join(outdeg, "src").localCheckpoint(eager=False)

    for _ in range(iters):
        contribs = (
            weighted.join(ranks.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            nodes.join(contribs, "id", "left")
            .crossJoin(F.broadcast(n1))
            .select(
                "id",
                (
                    F.lit(1.0 - damping) / F.col("n")
                    + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("id", F.col("rank").alias("pagerank"))


def triangle_counts(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over an undirected graph — the clustering /
    community-density primitive next to PageRank and connected components
    (spam rings and botnets triangle-heavily; organic interaction graphs
    are sparse in triangles).

    Standard distributed shape: edges canonicalize to oriented (lo, hi)
    pairs with duplicates dropped, then two equi-joins enumerate each
    triangle exactly once as lo < mid < hi, and a final explode-aggregate
    credits each corner. All joins are hash-equi on node ids; at 100 TB
    the classic skew guard is degree-ordering (orient edges by degree,
    not id) so hub nodes don't fan the first join — documented here, id
    orientation kept for oracle replayability. Self-loops and NULL
    endpoints are dropped. Returns ``node, n_triangles``.
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("lo"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("hi"),
        )
        .filter(
            F.col("lo").isNotNull()
            & F.col("hi").isNotNull()
            & (F.col("lo") < F.col("hi"))
        )
        .distinct()
    )
    ab = e.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    bc = e.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    ac = e.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    tris = ab.join(bc, "b").join(ac, ["a", "c"])
    corners = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    return corners
