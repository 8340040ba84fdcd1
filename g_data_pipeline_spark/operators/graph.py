"""Distributed graph centrality: power-iteration PageRank.

Why it belongs in a training-data engine: link-graph centrality is a
standard document-quality prior for web corpora (the original
PageRank use case — Page et al. 1999; crawl-curation pipelines rank hosts
by a centrality score before sampling). The iterative shape (fixed-point
over a join + aggregate) complements the label-propagation connected
components in operators/dedup.py.

Spark shape per iteration: one join (ranks onto edges, keyed on src) + one
groupBy (contributions to dst) — both shuffles keyed on vertex id; lineage
truncated via localCheckpoint every few rounds, same discipline as
dedup_clusters (plan growth, not data growth, is what kills long loops).

Not SQL-expressible as one query (aggregation inside recursion); quality is
pinned in tests/test_operators.py against a dense NumPy power iteration on
the same graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 15,
) -> DataFrame:
    """PageRank over a DIRECTED edge list -> (id, rank), Σrank = 1.

    Dangling vertices (no out-edges) redistribute their mass uniformly each
    iteration — the standard stochastic-matrix completion, without which
    rank mass leaks and totals drift per iteration.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    nodes = nodes.localCheckpoint(eager=True)
    n = nodes.count()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))

    # With no dangling vertices (every id has out-edges — always true for a
    # symmetrized near-dup graph), the per-iteration dangling-mass scan is
    # provably zero: skip its driver round-trip entirely.
    has_dangling = (
        nodes.join(out_deg, nodes.id == out_deg.src, "left_anti").limit(1).count()
        > 0
    )

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    pending_unpersist = []
    for i in range(n_iter):
        with_deg = ranks.join(out_deg, ranks.id == out_deg.src, "left")
        if has_dangling:
            # the dangling collect AND the eventual ranks materialization
            # both consume with_deg — cache it; released after the next
            # checkpoint truncates the lineage that reads it
            with_deg = with_deg.persist()
            pending_unpersist.append(with_deg)
            dangling = (
                with_deg.filter(F.col("deg").isNull())
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                .collect()[0][0]
            )
        else:
            dangling = 0.0
        contribs = (
            with_deg.filter(F.col("deg").isNotNull())
            .select("id", (F.col("rank") / F.col("deg")).alias("share"))
            .join(e, F.col("id") == e.src)
            .groupBy("dst")
            .agg(F.sum("share").alias("in_mass"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            nodes.join(contribs, nodes.id == contribs.dst, "left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("in_mass"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if i % 3 == 2 or i == n_iter - 1:
            ranks = ranks.localCheckpoint(eager=True)
            for df_ in pending_unpersist:
                df_.unpersist()
            pending_unpersist.clear()
    return ranks


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-vertex triangle counts over an id-ORIENTED edge list
    (``id_a < id_b``, unique pairs) — the local clustering signal: in a
    near-dup graph, high triangle counts mark tight duplicate CLIQUES
    (template families) vs incidental pairwise overlaps, which changes the
    dedup decision (drop the clique to one survivor vs keep both of a
    borderline pair).

    Shape: two self-joins on shared vertices — e1(a,b) ⋈ e2(b,c) ⋈
    e3(a,c) — so each triangle a<b<c is found exactly once; every shuffle
    keys on a vertex id, never all-pairs. The id orientation bounds the
    wedge count by per-vertex out-degree; at 100 TB orient by DEGREE
    (low→high, the Schank–Wagner/Cohen MapReduce refinement) so hub
    vertices with huge in-degree can't mint quadratic wedges — same
    algebra, one extra degree join to build the orientation."""
    e1 = edges.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    e2 = edges.select(F.col("id_a").alias("b"), F.col("id_b").alias("c"))
    e3 = edges.select(F.col("id_a").alias("a"), F.col("id_b").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    nodes = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return nodes.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
