"""Dedup queries over ``documents``/``orders``: exact, fingerprint, exact
n-gram Jaccard, and — since round 7 — the MinHash-LSH banded pair path and
the SimHash pigeonhole path, all oracle-matched end-to-end (the gated
entries run the DuckDB-reproducible md5 hash family; the faster xxhash64
production family keeps its quality pins in tests/test_dedup.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.operators.dedup import (
    exact_dedup,
    fingerprint_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from g_data_pipeline_spark.queries import register


@register(
    "d_exact_dedup",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
      FROM orders) WHERE rn = 1
    """,
)
def d_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exact dedup: one row per key, MIN(order col) survives
    (dropDuplicates keeps an arbitrary row; this is the reproducible form).
    Here: each customer's first order."""
    orders = load_table(spark, sf_dir, "orders")
    return exact_dedup(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        "o_orderkey",
    )


@register(
    "d_fingerprint_dedup",
    oracle=r"""
    SELECT doc_id, n_chars FROM (
      SELECT doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY md5(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')))
               ORDER BY doc_id) AS rn
      FROM documents) WHERE rn = 1
    """,
)
def d_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-exact dedup on normalized-text md5 (case/punct/whitespace
    invariant)."""
    docs = load_table(spark, sf_dir, "documents")
    return fingerprint_dedup(
        docs.select("doc_id", "n_chars", "text"), "text", "doc_id"
    ).drop("text")


@register(
    "d_ngram_jaccard_pairs",
    oracle=r"""
    WITH sets AS (
      SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            for i in range(1, len(toks) - 1)]) AS sh
      FROM (SELECT doc_id,
                   string_split_regex(trim(lower(text)), '\s+') AS toks
            FROM documents)
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
    )
    SELECT id_a, id_b, common,
           common / CAST(size_a + size_b - common AS DOUBLE) AS jaccard
    FROM pairs
    WHERE common / CAST(size_a + size_b - common AS DOUBLE) >= 0.5
    """,
)
def d_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT word-3-gram Jaccard near-dup pairs (>= 0.5) via the shingle
    inverted index — the ground truth the sketch methods are measured
    against. The document-frequency cutoff (max_shingle_freq=1000, mirrored
    in the oracle) drops ultra-hot shingles before the self-join so a
    stopword-run shared by f docs can't mint f^2 candidate rows at scale."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, max_shingle_freq=1000
    )


# md5 "permutation" i of shingle s — the DuckDB twin of
# operators/dedup._md5_perm (the cross-engine family proven by
# d_minhash_estimate_pairs, query_defs/sketches.py).
_LSH_HASHES, _LSH_BANDS = 32, 8
_LSH_R = _LSH_HASHES // _LSH_BANDS

_SQL_LSH_SETS = r"""
    sets AS (
      SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            for i in range(1, len(toks) - 1)]) AS sh
      FROM (SELECT doc_id,
                   string_split_regex(trim(lower(text)), '\s+') AS toks
            FROM documents)
      WHERE len(toks) >= 3
    )
"""


@register(
    "d_minhash_lsh_pairs",
    oracle=f"""
    WITH {_SQL_LSH_SETS}, sig AS (
      SELECT doc_id,
             [list_min(list_transform(sh,
                s -> CAST(('0x' || substring(md5(s || chr(31)
                                             || CAST(i AS VARCHAR)), 1, 15))
                     AS BIGINT)))
              for i in range(0, {_LSH_HASHES})] AS sg
      FROM sets WHERE len(sh) > 0
    ), bands AS (
      SELECT doc_id, b.band,
             array_to_string(sg[b.band * {_LSH_R} + 1
                               : b.band * {_LSH_R} + {_LSH_R}], ',')
               AS bucket
      FROM sig CROSS JOIN (SELECT unnest(range(0, {_LSH_BANDS})) AS band) b
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ), verified AS (
      SELECT c.id_a, c.id_b,
             len(list_intersect(sa.sh, sb.sh)) AS common,
             len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))
               AS un
      FROM cand c
      JOIN sets sa ON sa.doc_id = c.id_a
      JOIN sets sb ON sb.doc_id = c.id_b
    )
    SELECT id_a, id_b, CAST(common AS BIGINT) AS common,
           CAST(ROUND(common / CAST(un AS DOUBLE) * 1e6) AS BIGINT)
             AS jaccard_micro
    FROM verified
    WHERE common / CAST(un AS DOUBLE) >= 0.5
    """,
)
def d_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32 hashes)+LSH(8 bands of r=4) near-dup pairs, verified to
    exact Jaccard >= 0.5 — oracle-gated END-TO-END (round-7 graduation of
    the oldest rows-only flagship): signatures from the md5 permutation
    family, band buckets as raw value strings, candidate self-join,
    Jaccard verification — every stage has the byte-identical SQL twin
    DuckDB runs. The banding algebra (1-(1-s^r)^b candidate recall, ~97%
    at s=0.5) is therefore pinned cross-engine, not just property-tested.
    The xxhash64 production family (narrower long buckets, fastest
    shuffle key) stays the operator default; its recall vs the exact
    inverted-index oracle is pinned in tests/test_dedup.py. Shape: the
    only shuffles key on (band, bucket-content) and on candidate doc ids
    — never all-pairs."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs,
        "doc_id",
        "text",
        n=3,
        num_hashes=_LSH_HASHES,
        bands=_LSH_BANDS,
        threshold=0.5,
        hash_family="md5",
    )
    return pairs.select(
        "id_a",
        "id_b",
        F.col("common").cast("long").alias("common"),
        F.round(F.col("jaccard") * F.lit(1e6))
        .cast("long")
        .alias("jaccard_micro"),
    )


_SH_PAIR_BITS, _SH_PAIR_BANDS, _SH_PAIR_MAXHAM = 32, 4, 6
_SH_CHUNK = 2 ** (_SH_PAIR_BITS // _SH_PAIR_BANDS)


@register(
    "d_simhash_pairs",
    oracle=rf"""
    WITH fp AS (
      SELECT doc_id,
             list_sum([CASE WHEN list_sum(list_transform(hs,
                              h -> ((h // (1::BIGINT << j)) % 2) * 2 - 1)) > 0
                            THEN (1::BIGINT << j) ELSE 0 END
                       for j in range(0, {_SH_PAIR_BITS})]) AS f
      FROM (SELECT doc_id,
                   list_transform(
                     string_split_regex(trim(lower(text)), '\s+'),
                     t -> CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT))
                     AS hs
            FROM documents)
    ), bands AS (
      SELECT doc_id, f, b.band,
             (f // (1::BIGINT << (b.band * {_SH_PAIR_BITS // _SH_PAIR_BANDS})))
               % {_SH_CHUNK} AS chunk
      FROM fp
      CROSS JOIN (SELECT unnest(range(0, {_SH_PAIR_BANDS})) AS band) b
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.f AS fa, b.f AS fb
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(fa, fb)) <= {_SH_PAIR_MAXHAM}
    """,
)
def d_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via pigeonhole banding, oracle-gated
    END-TO-END (round-7 graduation): 32-bit md5-family fingerprints
    (per-bit +/-1 votes over the raw token multiset), split into 4
    8-bit chunks — by pigeonhole any pair within Hamming < 4 shares a
    chunk; candidates verify to Hamming <= 6 with exact bit_count(xor).
    Every stage (token hash, vote/sign, chunk extraction, candidate
    join, Hamming) runs byte-identically in DuckDB. The 64-bit xxhash64
    production variant (operators/dedup.simhash_pairs defaults) stays
    property-pinned in tests/test_dedup.py. One shuffle keyed on
    (band, chunk) content — never all-pairs."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = simhash_pairs(
        docs,
        "doc_id",
        "text",
        max_hamming=_SH_PAIR_MAXHAM,
        bands=_SH_PAIR_BANDS,
        bits=_SH_PAIR_BITS,
        hash_family="md5",
    )
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


@register("d_incremental_minhash", oracle=None)
def d_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup maintenance vs a growing MinHash-LSH band
    archive (operators/dedup.incremental_minhash_dedup — the RefinedWeb
    crawl-cadence modality): even doc_ids play the archived history, odd
    doc_ids the new dump; output = the dump's total labeling (id,
    n_buckets, n_dup_buckets, is_dup). Rows-only BY DESIGN: the decision
    composes the banding algebra (oracle-gated end-to-end via
    d_minhash_lsh_pairs) with directory state, and the one-pass rule is
    pinned against a pure-Python twin + replay/exactly-once streaming
    pins in tests/test_incremental_minhash.py."""
    from g_data_pipeline_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_band_directory,
    )

    docs = load_table(spark, sf_dir, "documents")
    history = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    directory = minhash_band_directory(history, "doc_id", "text")
    labeled, _delta = incremental_minhash_dedup(
        batch, directory, "doc_id", "text"
    )
    return labeled


@register(
    "d_decontaminate",
    oracle=r"""
    WITH shing AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 3
                  THEN list_distinct([array_to_string(toks[i:i+2], ' ')
                                      for i in range(1, len(toks) - 1)])
                  ELSE [] END AS sh
      FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
            FROM documents)
    ),
    bench AS (SELECT DISTINCT unnest(sh) AS s FROM shing WHERE doc_id % 37 = 0),
    corpus AS (SELECT doc_id, unnest(sh) AS s FROM shing WHERE doc_id % 37 <> 0)
    SELECT d.doc_id,
           CAST(COALESCE(cnt, 0) AS BIGINT) AS n_overlap,
           COALESCE(cnt, 0) >= 5 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 37 <> 0) d
    LEFT JOIN (SELECT doc_id, COUNT(*) AS cnt
               FROM corpus JOIN bench USING (s)
               GROUP BY doc_id) o USING (doc_id)
    """,
)
def d_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination over the documents corpus: every 37th doc
    plays the held-out eval suite; corpus docs sharing >= 5 distinct word
    3-grams with it are flagged (the sf0.01 corpus contains a genuine
    benchmark near-duplicate at 56 shared 3-grams). See
    operators/dedup.py::decontaminate for the broadcast-probe scale plan."""
    from g_data_pipeline_spark.operators.dedup import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    benchmark = docs.filter(F.col("doc_id") % 37 == 0)
    corpus = docs.filter(F.col("doc_id") % 37 != 0)
    return decontaminate(corpus, benchmark, "doc_id", "text", n=3, min_overlap=5)


@register(
    "d_span_dedup",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents
    ), spans AS (
      SELECT doc_id, i - 1 AS pos,
             array_to_string(t[(i-1)*8+1 : (i-1)*8+8], ' ') AS span
      FROM toks, LATERAL (SELECT unnest(generate_series(1,
           CAST(ceil(len(t) / 8.0) AS BIGINT))) AS i)
    ), kept AS (
      SELECT doc_id, pos, span,
             ROW_NUMBER() OVER (PARTITION BY span ORDER BY doc_id, pos) AS rn
      FROM spans
    ), reassembled AS (
      SELECT doc_id, string_agg(span, ' ' ORDER BY pos) AS dedup_text,
             COUNT(*) AS spans_kept
      FROM kept WHERE rn = 1 GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(r.dedup_text, '') AS dedup_text,
           CAST(COALESCE(r.spans_kept, 0) AS BIGINT) AS spans_kept,
           CAST(ceil(len(string_split_regex(trim(lower(d.text)), '\s+')) / 8.0)
                AS BIGINT) AS spans_total
    FROM documents d LEFT JOIN reassembled r USING (doc_id)
    """,
)
def d_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style repeated-span removal over the corpus: 8-token spans, first
    occurrence (by doc_id, position) survives, documents reassembled from
    surviving spans. Total labeling — every doc comes back, possibly with
    dedup_text=''. See operators/dedup.py::span_dedup for the scale plan
    (shuffle keyed on span content)."""
    from g_data_pipeline_spark.operators.dedup import span_dedup

    docs = load_table(spark, sf_dir, "documents")
    return span_dedup(docs, "doc_id", "text", span_tokens=8)


@register(
    "d_incremental_dedup",
    oracle=r"""
    WITH fp AS (
      SELECT doc_id,
             md5(trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS fingerprint
      FROM documents
    ), hist AS (
      SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 4 <> 0
    )
    SELECT doc_id, fingerprint FROM (
      SELECT doc_id, fingerprint,
             ROW_NUMBER() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
      FROM fp
      WHERE doc_id % 4 = 0
        AND fingerprint NOT IN (SELECT fingerprint FROM hist)
    ) WHERE rn = 1
    """,
)
def d_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (batch-vs-archive) dedup: docs with doc_id % 4 == 0 play
    the new crawl dump, the rest the historical corpus; batch docs whose
    normalized-text fingerprint exists in history are dropped, then the
    batch dedupes internally (MIN doc_id survives). NOT IN is safe as
    left_anti here because md5 fingerprints are non-null. See
    operators/dedup.py::incremental_dedup (anti join keyed on fingerprint,
    never broadcast — history is the big side)."""
    from g_data_pipeline_spark.operators.dedup import incremental_dedup

    docs = load_table(spark, sf_dir, "documents")
    return incremental_dedup(
        docs.filter(F.col("doc_id") % 4 == 0),
        docs.filter(F.col("doc_id") % 4 != 0),
        "text",
        "doc_id",
    )


@register(
    "d_priority_merge",
    oracle=r"""
    WITH corpus AS (
      SELECT doc_id, source, text, n_chars FROM documents
      UNION ALL
      SELECT -doc_id - 1 AS doc_id, 'mirror' AS source, text, n_chars
      FROM documents WHERE doc_id % 5 = 0
    )
    SELECT doc_id, source, n_chars FROM (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY md5(trim(regexp_replace(regexp_replace(
                 lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')))
               ORDER BY CASE WHEN source = 'mirror' THEN 0 ELSE 1 END,
                        doc_id) AS rn
      FROM corpus) WHERE rn = 1
    """,
)
def d_priority_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority-aware multi-source corpus merge: when the same normalized
    text arrives from several sources, keep the copy from the
    highest-priority source (then MIN doc id) — the union step of every
    multi-dump training corpus (curated mirror beats raw crawl). The
    synthetic corpus has no natural cross-source duplicates, so a 'mirror'
    copy of every 5th document is planted (higher priority than the
    original; planted id = -doc_id - 1, which can never collide with a real
    non-negative doc_id at ANY scale factor — an additive offset would) and
    must win its pair. One shuffle, keyed on
    the content fingerprint; survivor choice is a WindowGroupLimit-pruned
    rank, same scale shape as exact_dedup (operators/dedup.py:39)."""
    from g_data_pipeline_spark.functions.text import fingerprint_md5

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text", "n_chars"
    )
    planted = docs.filter(F.col("doc_id") % 5 == 0).select(
        (-F.col("doc_id") - 1).alias("doc_id"),
        F.lit("mirror").alias("source"),
        "text",
        "n_chars",
    )
    corpus = docs.unionByName(planted)
    tier = F.when(F.col("source") == "mirror", 0).otherwise(1)
    from pyspark.sql import Window

    w = Window.partitionBy(fingerprint_md5("text")).orderBy(
        tier.asc(), F.col("doc_id").asc()
    )
    return (
        corpus.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "source", "n_chars")
    )


@register(
    "d_source_shingle_overlap",
    oracle=r"""
    WITH shing AS (
      SELECT source, list_distinct([array_to_string(toks[i:i+2], ' ')
                     for i in range(1, len(toks) - 1)]) AS sh
      FROM (SELECT source, string_split_regex(trim(lower(text)), '\s+') AS toks
            FROM documents)
      WHERE len(toks) >= 3
    ), posts AS (
      SELECT DISTINCT source, unnest(sh) AS s FROM shing
    ), sizes AS (
      SELECT source, COUNT(*) AS n_shingles FROM posts GROUP BY source
    )
    SELECT a.source AS src_a, b.source AS src_b,
           COUNT(*) AS shared_shingles,
           COUNT(*) / CAST(sa.n_shingles + sb.n_shingles - COUNT(*) AS DOUBLE)
             AS jaccard
    FROM posts a
    JOIN posts b ON a.s = b.s AND a.source < b.source
    JOIN sizes sa ON sa.source = a.source
    JOIN sizes sb ON sb.source = b.source
    GROUP BY a.source, b.source, sa.n_shingles, sb.n_shingles
    """,
)
def d_source_shingle_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for every source pair, the count
    and Jaccard similarity of shared distinct word-3-gram shingles — the
    subcorpus-level overlap audit run before mixing sources into a training
    set (near-identical sources double-weight their content silently).

    Scale: posts are DISTINCT (source, shingle) — a shingle contributes at
    most n_sources rows, so the shingle self-join fans out by at most
    n_sources² per shingle key INDEPENDENT of corpus row count (unlike
    doc-level pair joins, which need the frequency cutoff). Shuffles keyed
    on shingle then (src_a, src_b); source count is the small dimension, so
    the sizes join broadcasts."""
    from g_data_pipeline_spark.functions.text import word_shingles

    docs = load_table(spark, sf_dir, "documents")
    posts = (
        docs.select(
            "source", F.explode(word_shingles("text", n=3)).alias("s")
        )
        .distinct()
        # Materialize the (much smaller) distinct posts set ONCE: three
        # branches consume it (pair join sides a/b + per-source sizes).
        # Catalyst's ReuseExchange covers the identical a/b subtrees, but
        # the sizes aggregation would otherwise re-scan documents and
        # re-explode every shingle — at corpus scale that doubles the
        # dominant cost. localCheckpoint trades executor-storage of the
        # distinct set for a single explode pass (same pattern as
        # dedup_clusters / semantic_dedup).
        .localCheckpoint(eager=True)
    )
    sizes = posts.groupBy("source").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = posts.select(F.col("source").alias("src_a"), "s")
    b = posts.select(F.col("source").alias("src_b"), "s")
    pairs = (
        a.join(b, "s")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("shared_shingles"))
    )
    return (
        pairs.join(
            F.broadcast(sizes.select(F.col("source").alias("src_a"),
                                     F.col("n_shingles").alias("n_a"))),
            "src_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("src_b"),
                                     F.col("n_shingles").alias("n_b"))),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            "shared_shingles",
            (
                F.col("shared_shingles").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("shared_shingles"))
                .cast("double")
            ).alias("jaccard"),
        )
    )


@register("d_pagerank", eager=True)  # rows-only: aggregation-inside-recursion has no SQL twin; eager: iterations run at build
def d_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document centrality over the exact near-dup graph (Jaccard >= 0.3
    word-3-gram edges, symmetrized): the graph-quality-prior primitive
    (web-crawl curation ranks hosts/pages by link centrality before
    sampling). Iterative power iteration (operators/graph.py:pagerank);
    NumPy parity pinned to 1e-9 in tests/test_operators.py."""
    from g_data_pipeline_spark.operators.dedup import ngram_jaccard_pairs
    from g_data_pipeline_spark.operators.graph import pagerank

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.3, max_shingle_freq=1000
    )
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")).union(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    return pagerank(edges, n_iter=10)
