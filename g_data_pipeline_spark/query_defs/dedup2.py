"""Round-5 dedup wave 2: scale-path alternates for the two heaviest dedup
primitives, each gated against the SAME oracle as its sibling (identical
output contract, different Spark execution strategy — the gate proves the
alternate path is a drop-in):

- d_cc_star: alternating large-star/small-star connected components
  (O(log n) rounds) vs d_dedup_clusters' min-label propagation
  (O(diameter) rounds). Oracle: the recursive-CTE reachability fixpoint.
- d_incremental_bloom: Bloom-prefiltered incremental dedup (definitely-new
  batch keys skip the history anti-join) vs d_incremental_dedup's plain
  anti-join. Oracle: identical — the Bloom changes the plan, never the
  result (operators/bloom.py module doc has the exactness argument).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.queries import REGISTRY, register

# Oracle reuse is by construction, not copy: the siblings registered
# before this module (query_defs/__init__.py import order) hold the SQL.
_CC_ORACLE = REGISTRY["d_dedup_clusters"].oracle
_INCR_ORACLE = REGISTRY["d_incremental_dedup"].oracle


@register("d_cc_star", oracle=_CC_ORACLE, eager=True)  # star loop executes at build
def d_cc_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the exact 3-gram Jaccard pair graph via
    alternating large-star/small-star contraction (Kiveris et al. 2014) —
    the scale-safe path when duplicate CHAINS are long: O(log n) rounds
    vs label propagation's O(diameter). Same edge set, same recursive-CTE
    oracle, same (id, cluster_id=MIN member) output as d_dedup_clusters;
    the long-chain convergence advantage is pinned in
    tests/test_ccstar_bloom.py (chain of 64: <= 10 rounds)."""
    from g_data_pipeline_spark.operators.dedup import (
        cc_star,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, max_shingle_freq=1000
    )
    return cc_star(pairs)


@register("d_incremental_bloom", oracle=_INCR_ORACLE)
def d_incremental_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental batch-vs-archive dedup with a native Bloom pre-filter
    (operators/bloom.py): history fingerprints fold into a bitset word
    table via ONE map-side-combined bit_or aggregate; Bloom-negative batch
    docs (definitely new) bypass the exact anti-join, and only the ~1%
    candidate residue pays it. Output is bit-identical to
    d_incremental_dedup — the oracle is literally the same SQL — because
    the residual anti-join re-checks every candidate. Broadcast of the
    word table is plan-pinned."""
    from g_data_pipeline_spark.operators.bloom import incremental_dedup_bloom

    docs = load_table(spark, sf_dir, "documents")
    return incremental_dedup_bloom(
        docs.filter(F.col("doc_id") % 4 == 0),
        docs.filter(F.col("doc_id") % 4 != 0),
        "text",
        "doc_id",
    )


@register("d_source_overlap_sketch")
def d_source_overlap_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source shingle-overlap matrix at Theta-sketch cost — the
    100 TB-scale sibling of d_source_shingle_overlap (query_defs/dedup.py).

    Rows-only BY DESIGN: datasketches Theta estimates have no DuckDB
    twin. tests/test_sketch_overlap.py pins this against the exact
    posts-self-join matrix instead — bit-for-bit while every source sits
    below the sketch's exact-mode capacity (the regime at test scale),
    tolerance-bounded beyond it.

    One aggregate pass over documents builds a constant-size sketch per
    source; the pairwise matrix is computed from the 20-row sketch table
    alone (broadcast self-join), facts unread.
    """
    from g_data_pipeline_spark.functions.text import word_shingles
    from g_data_pipeline_spark.operators.sketch_overlap import (
        distinct_sketches,
        pairwise_overlap,
    )

    docs = load_table(spark, sf_dir, "documents")
    posts = docs.select(
        "source", F.explode(word_shingles("text", n=3)).alias("s")
    )
    return pairwise_overlap(
        distinct_sketches(posts, "source", "s"), "source"
    ).orderBy("grp_a", "grp_b")


@register(
    "d_shingle_containment",
    oracle=r"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT -x.doc_id - 1 AS doc_id, x.text || ' ' || y.text AS text
      FROM documents x JOIN documents y ON y.doc_id = x.doc_id + 1
      WHERE x.doc_id % 97 = 0
    ), sets AS (
      SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            for i in range(1, len(toks) - 1)]) AS sh
      FROM (SELECT doc_id,
                   string_split_regex(trim(lower(text)), '\s+') AS toks
            FROM corpus)
      WHERE len(toks) >= 3
    ), posts_all AS (
      SELECT doc_id, len(sh) AS sz, unnest(sh) AS s FROM sets WHERE len(sh) > 0
    ), freq AS (
      SELECT s, COUNT(*) AS df FROM posts_all GROUP BY s
    ), posts AS (
      SELECT p.* FROM posts_all p JOIN freq f ON p.s = f.s WHERE f.df <= 1000
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.sz AS size_a, COUNT(*) AS common
      FROM posts a JOIN posts b ON a.s = b.s AND a.doc_id <> b.doc_id
      GROUP BY 1, 2, 3
    )
    SELECT id_a, id_b, CAST(size_a AS BIGINT) AS size_a, common,
           CAST(ROUND(1e6 * CAST(common AS DOUBLE) / size_a) AS BIGINT)
             AS containment_micro
    FROM pairs
    WHERE CAST(ROUND(1e6 * CAST(common AS DOUBLE) / size_a) AS BIGINT)
          >= 800000
    """,
)
def d_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle-containment pairs (Broder '97's companion to
    Jaccard): containment(a→b) = |A∩B| / |A| catches the sub-document
    copies Jaccard structurally misses — a doc pasted verbatim into a much
    longer one has tiny Jaccard (huge union) but containment 1.0. The
    fixture plants exactly that: every 97th doc gets a synthetic container
    (negative id — the planted-id convention) concatenating it with its
    neighbor, so both planted directions surface at 1.0 alongside the
    corpus's natural near-dup pairs. Same inverted-index + DF-cutoff shape
    as d_ngram_jaccard_pairs (operators/dedup.py:
    shingle_containment_pairs); the broadcast-sized planted join never
    touches the shingle exchange."""
    from g_data_pipeline_spark.operators.dedup import (
        shingle_containment_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    seeds = docs.filter(F.col("doc_id") % 97 == 0)
    nxt = docs.select(
        (F.col("doc_id") - 1).alias("doc_id"), F.col("text").alias("text_b")
    )
    planted = seeds.join(nxt, "doc_id").select(
        (-F.col("doc_id") - 1).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" "), F.col("text_b")).alias("text"),
    )
    corpus = docs.unionByName(planted)
    return shingle_containment_pairs(
        corpus, "doc_id", "text", n=3, threshold=0.8, max_shingle_freq=1000
    )


@register(
    "d_triangle_cliques",
    oracle=r"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT -doc_id - 1, text || ' zzca' FROM documents WHERE doc_id % 101 = 0
      UNION ALL
      SELECT -doc_id - 2, text || ' zzcb' FROM documents WHERE doc_id % 101 = 0
    ), sets AS (
      SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            for i in range(1, len(toks) - 1)]) AS sh
      FROM (SELECT doc_id,
                   string_split_regex(trim(lower(text)), '\s+') AS toks
            FROM corpus)
      WHERE len(toks) >= 3
    ), posts_all AS (
      SELECT doc_id, len(sh) AS sz, unnest(sh) AS s FROM sets WHERE len(sh) > 0
    ), freq AS (
      SELECT s, COUNT(*) AS df FROM posts_all GROUP BY s
    ), posts AS (
      SELECT p.* FROM posts_all p JOIN freq f ON p.s = f.s WHERE f.df <= 1000
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.sz AS size_a, b.sz AS size_b, COUNT(*) AS common
      FROM posts a JOIN posts b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    ), edges AS (
      SELECT id_a, id_b FROM pairs
      WHERE common / CAST(size_a + size_b - common AS DOUBLE) >= 0.3
    ), tri AS (
      SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
      FROM edges e1
      JOIN edges e2 ON e2.id_a = e1.id_b
      JOIN edges e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
    ), nodes AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT node, COUNT(*) AS n_triangles FROM nodes GROUP BY node
    """,
)
def d_triangle_cliques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document triangle counts over the exact near-dup graph
    (Jaccard >= 0.3 word-3-gram edges — d_pagerank's graph): the local
    clustering signal separating duplicate CLIQUES (template families,
    mirror farms — drop to one survivor) from incidental pairwise overlaps
    (borderline — keep both). Every 101st doc gets two planted near-copies
    (negative ids, distinct 1-token suffixes), turning each seed into a
    3-clique so the triangle join is exercised beyond the corpus's single
    natural triangle. operators/graph.py:triangle_counts documents the
    degree-orientation refinement for 100 TB hubs."""
    from g_data_pipeline_spark.operators.dedup import ngram_jaccard_pairs
    from g_data_pipeline_spark.operators.graph import triangle_counts

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    seeds = docs.filter(F.col("doc_id") % 101 == 0)
    corpus = docs.unionByName(
        seeds.select(
            (-F.col("doc_id") - 1).alias("doc_id"),
            F.concat("text", F.lit(" zzca")).alias("text"),
        )
    ).unionByName(
        seeds.select(
            (-F.col("doc_id") - 2).alias("doc_id"),
            F.concat("text", F.lit(" zzcb")).alias("text"),
        )
    )
    edges = ngram_jaccard_pairs(
        corpus, "doc_id", "text", n=3, threshold=0.3, max_shingle_freq=1000
    ).select("id_a", "id_b")
    return triangle_counts(edges)
