"""Similarity-search queries over ``embeddings``: exact cosine top-k and
all-pairs near-dup (both oracle-matched via the scaled-long dot product),
plus hyperplane-LSH approximate top-k (rows-only; recall pinned in
tests/test_similarity.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.functions.vectors import sql_cosine_sim
from g_data_pipeline_spark.operators.similarity import (
    assign_to_centroids,
    cosine_topk,
    ivf_topk,
    lsh_near_dup_pairs,
    lsh_topk,
    near_dup_pairs,
)
from g_data_pipeline_spark.queries import register

_COS_AB = sql_cosine_sim("a.embedding", "b.embedding")


@register(
    "v_cosine_topk",
    oracle=f"""
    SELECT q_id, vec_id, cos, rank FROM (
      SELECT b.vec_id AS q_id, a.vec_id AS vec_id,
             {_COS_AB} AS cos,
             ROW_NUMBER() OVER (
               PARTITION BY b.vec_id
               ORDER BY {_COS_AB} DESC, a.vec_id) AS rank
      FROM embeddings a
      CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) b
      WHERE a.vec_id <> b.vec_id)
    WHERE rank <= 10
    """,
)
def v_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for 5 query vectors against the whole corpus
    (broadcast brute force — the ANN correctness baseline)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = cosine_topk(emb, queries, k=10)
    return out.withColumn("rank", F.col("rank").cast("long"))


@register(
    "v_near_dup_pairs",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COS_AB} AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_COS_AB} >= 0.35
    """,
)
def v_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All embedding pairs with cosine >= 0.35 (exact O(n^2) baseline)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return near_dup_pairs(emb, threshold=0.35)


@register("v_lsh_topk", oracle=None)
def v_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table hyperplane-LSH approximate top-10 (8 tables x 6 planes,
    multiprobe) for the same 5 queries. Rows-only; recall vs v_cosine_topk
    pinned in tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return lsh_topk(
        emb, queries, k=10, dim=64, n_tables=8, planes_per_table=6
    )


@register("v_ivf_topk", oracle=None, eager=True)  # centroid training collects at build
def v_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (k-means coarse quantizer, 16 cells, probe 4) approximate top-10
    for the same 5 queries. Rows-only (iterative training has no SQL twin);
    recall vs v_cosine_topk pinned in tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return ivf_topk(emb, queries, k=10, n_centroids=16, n_probe=4)


@register("v_ivfpq_topk", oracle=None, eager=True)  # centroid+codebook training collects at build
def v_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (16 coarse cells probe 4; 8x16 product-quantization codes,
    ADC shortlist 4k, exact re-rank) approximate top-10 for the same 5
    queries — the compressed-index scale path where the candidate join
    reads 8 small ints per vector instead of 64 floats. Rows-only
    (iterative codebook training has no SQL twin); recall, ADC exactness,
    and the zero-shuffle/broadcast plan pins live in tests/test_pq.py."""
    from g_data_pipeline_spark.operators.pq import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return ivfpq_topk(
        emb, queries, k=10, dim=64, n_centroids=16, n_probe=4,
        m_subspaces=8, n_codes=16, refine=4,
    )


def _planted_near_dup_corpus(emb: DataFrame) -> DataFrame:
    """embeddings ∪ perturbed copies of every 10th vector (deterministic
    xxhash64 noise, cosine ~0.95 to the original). The synthetic embeddings
    fixture has no high-similarity pairs of its own, so the near-dup
    operators are exercised on planted ones — the regime they exist for."""
    emb = emb.select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: (
                x.cast("double")
                + (
                    (F.pmod(F.xxhash64(F.col("vec_id"), i), F.lit(2001)) - 1000)
                    / 1000.0
                )
                * 0.07
            ).cast("float"),
        ).alias("embedding"),
    )
    return emb.unionByName(planted)


@register("v_lsh_near_dup_pairs", oracle=None)
def v_lsh_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs (cosine >= 0.9) via LSH bucketing over the
    planted-near-dup corpus — the scale-safe sibling of the O(n^2)
    v_near_dup_pairs baseline, run in LSH's design regime (high-similarity
    dedup: 16 planes/table keeps buckets near-singleton, Hamming-1
    multiprobe holds per-table collision ~0.5 for cos 0.95 pairs, 6 tables
    -> ~0.99 recall). Moderate-threshold all-pairs (e.g. 0.35 — vectors 69°
    apart) is intrinsically dense and belongs to the exact baseline, not a
    bucketed method. Rows-only; precision exact (verified cosine), recall
    pinned vs the exact baseline in tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_near_dup_pairs(
        _planted_near_dup_corpus(emb),
        threshold=0.9,
        dim=64,
        n_tables=6,
        planes_per_table=16,
    )


@register(
    "v_mean_pool",
    oracle="""
    SELECT CAST(label AS BIGINT) AS label, pos,
           CAST(SUM(CAST(ROUND(CAST(val AS DOUBLE) * 1e12) AS BIGINT))
                AS DOUBLE) / 1e12 / COUNT(*) AS m,
           COUNT(*) AS n_vectors
    FROM (SELECT label, unnest(embedding) AS val,
                 generate_subscripts(embedding, 1) - 1 AS pos
          FROM embeddings)
    GROUP BY label, pos
    """,
)
def v_mean_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (class centroid) via the (group, pos)-keyed
    two-stage aggregation — deterministic scaled-long element sums, skew
    spread across dim partitions. Registered in FLATTENED form
    (label, pos, m, n_vectors) — the driver's canonicalizer cannot hash
    array columns — while the array-assembling ``mean_pool`` stays the
    library surface (operators/similarity.py:mean_pool)."""
    from g_data_pipeline_spark.operators.similarity import mean_pool_flat

    emb = load_table(spark, sf_dir, "embeddings")
    flat = mean_pool_flat(emb.select("label", "embedding"), ["label"])
    return flat.select(
        F.col("label").cast("long").alias("label"), "pos", "m", "n_vectors"
    )


@register("d_semantic_dedup", eager=True)  # rows-only: k-means cells are not SQL-expressible; eager: centroid training runs at build
def d_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup survivor set (cluster-then-dedup, min-id survivor) over the
    embeddings corpus at cosine >= 0.35 within 8 k-means cells
    (operators/similarity.py:semantic_dedup). Precision pinned exactly and
    recall bounded vs the O(n^2) baseline in tests/test_similarity.py."""
    from g_data_pipeline_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, threshold=0.35, n_centroids=8)


@register(
    "v_quantize_int8",
    oracle="""
    SELECT vec_id,
           generate_subscripts(embedding, 1) - 1 AS pos,
           list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
             / 127.0 AS scale,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) /
                  (list_max(list_transform(embedding,
                     y -> abs(CAST(y AS DOUBLE)))) / 127.0) + 0.5) AS BIGINT)
             AS q
    FROM embeddings
    """,
)
def v_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization (scale = max|x|/127, q =
    floor(x/scale + 0.5)) — the storage-shrink pass before shipping
    vectors to an ANN index; 4x smaller than float32 at ~equal recall.
    floor(x+0.5) instead of round() because the engines' round-half modes
    are not contractually identical; floor on identical doubles is.
    Pure array expressions — no UDF, one posexplode, scan speed at 100 TB.
    Registered in FLATTENED form (vec_id, pos, scale, q) so the driver's
    scalar-only canonicalizer can grade it; the packed array shape is a
    trivial collect_list away for library use."""
    emb = load_table(spark, sf_dir, "embeddings")
    absmax = F.array_max(
        F.transform("embedding", lambda x: F.abs(x.cast("double")))
    )
    scaled = emb.select(
        "vec_id",
        (absmax / F.lit(127.0)).alias("scale"),
        F.posexplode("embedding").alias("pos", "x"),
    )
    return scaled.select(
        "vec_id",
        F.col("pos").cast("long").alias("pos"),
        "scale",
        F.floor(F.col("x").cast("double") / F.col("scale") + 0.5)
        .cast("long")
        .alias("q"),
    )


@register("v_incremental_semantic", oracle=None)
def v_incremental_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SEMANTIC dedup vs a growing embedding archive
    (operators/incremental_semantic.py — the SemDeDup modality at crawl
    cadence, completing the incremental family across exact / substring
    / MinHash / SimHash / semantic): even vec_ids play the archived
    history under a frozen 8-cell codebook (vec_id < 8 rows, the
    v_topic_balance convention), odd vec_ids the new dump; output = the
    dump's total labeling (id, n_dup_neighbors, is_dup). Rows-only BY
    DESIGN: the decision composes exact cosine (oracle-gated via
    v_cosine_topk / v_near_dup_pairs) with cell-probed directory state;
    the one-pass rule is pinned against a pure-Python twin +
    replay/exactly-once streaming pins in
    tests/test_incremental_semantic.py."""
    from g_data_pipeline_spark.operators.incremental_semantic import (
        embedding_cell_archive,
        incremental_semantic_dedup,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("c_vec")
    )
    history = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    archive = embedding_cell_archive(history, cents)
    labeled, _delta = incremental_semantic_dedup(
        batch, archive, cents, threshold=0.95, n_probe=2
    )
    return labeled


@register(
    "t_semantic_packing",
    oracle=f"""
    WITH c AS (
      SELECT vec_id AS cell, embedding AS c_vec
      FROM embeddings WHERE vec_id < 8
    ), scored AS (
      SELECT a.vec_id, c.cell,
             {sql_cosine_sim("a.embedding", "c.c_vec")} AS cos
      FROM embeddings a CROSS JOIN c
    ), best AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cell ASC) AS rn
        FROM scored) WHERE rn = 1
    ), counted AS (
      SELECT d.doc_id, b.cell,
             CASE WHEN trim(d.text) = '' THEN 0
                  ELSE CAST(len(string_split_regex(trim(lower(d.text)),
                                                   '\\s+')) AS BIGINT)
             END AS n_tokens
      FROM documents d JOIN best b ON b.vec_id = d.doc_id
    ), cum AS (
      SELECT doc_id, cell, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY cell ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM counted
    )
    SELECT doc_id, CAST(cell AS BIGINT) AS cell, n_tokens,
           CAST(floor((c - n_tokens) / 512.0) AS BIGINT) AS bin_id,
           CAST((c - n_tokens) % 512 AS BIGINT) AS bin_offset,
           floor((c - 1) / 512.0) > floor((c - n_tokens) / 512.0)
             AS spans_bins
    FROM cum
    """,
)
def t_semantic_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (in-context) packing — ICLM-style (Shi et al. '23,
    arXiv:2310.10638): pack RELATED documents into shared training
    contexts by streaming each k-means CELL as its own packing group
    (cells from the frozen 8-centroid codebook, the v_topic_balance
    assignment; packing math from operators/packing.pack_sequences) —
    documents that retrieve together train together, instead of the
    random adjacency of source-order packing. Composition is fully
    SQL-expressible, so the gate pins assignment + per-cell prefix sums
    + bin mapping end-to-end. Shape: broadcast codebook scoring (corpus
    never shuffles for assignment), one doc-keyed join, one cell-keyed
    window — parallelism = number of cells, the packing-stream contract
    (pre-bucket cells by hash(id) %% k for more streams at scale)."""
    from g_data_pipeline_spark.operators.packing import pack_sequences

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("c_vec")
    )
    best = assign_to_centroids(emb, cents)
    celled = docs.join(
        best.select(F.col("vec_id").alias("doc_id"), "cell"), "doc_id"
    )
    packed = pack_sequences(celled, "doc_id", "text", "cell", capacity=512)
    return packed.select(
        "doc_id",
        F.col("cell").cast("long").alias("cell"),
        "n_tokens",
        "bin_id",
        "bin_offset",
        "spans_bins",
    )
