"""Round-5 curation wave: URL canonicalization dedup and the embedding
topic-balance report.

- d_url_dedup: the web-crawl front door — canonicalize URLs (scheme/host
  case, tracking params, fragments, trailing slash) and collapse
  variants. The corpus has no URL column, so a deterministic URL is
  planted per document ON BOTH ENGINES (same literal recipe); the
  canonicalizer chain (pure regexp_replace/lower — functions-level, zero
  UDFs) is the operator under test.
- v_topic_balance: k-means cell shares per source — closes the loop from
  similarity clustering (v_kmeans_assign's codebook scoring) to mixture
  weighting (t_mixture_weights), the way d_survivorship_report closes the
  dedup loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.functions.vectors import sql_cosine_sim
from g_data_pipeline_spark.queries import register

# Planted URL per doc: mixed-case scheme+host, versioned path, tracking
# params interleaved with a real param, and a fragment — every piece the
# canonicalizer must handle. Same literal recipe on both engines.
_SQL_URL = (
    "'HTTPS://WWW.Example' || CAST(doc_id % 10 AS VARCHAR)"
    " || '.COM/Path/' || CAST(doc_id % 50 AS VARCHAR)"
    " || '/?utm_source=feed&id=' || CAST(doc_id % 50 AS VARCHAR)"
    " || '&utm_campaign=c' || CAST(doc_id % 3 AS VARCHAR)"
    " || '#frag' || CAST(doc_id % 7 AS VARCHAR)"
)


def _spark_url() -> F.Column:
    d = F.col("doc_id")
    return F.concat(
        F.lit("HTTPS://WWW.Example"),
        (d % 10).cast("string"),
        F.lit(".COM/Path/"),
        (d % 50).cast("string"),
        F.lit("/?utm_source=feed&id="),
        (d % 50).cast("string"),
        F.lit("&utm_campaign=c"),
        (d % 3).cast("string"),
        F.lit("#frag"),
        (d % 7).cast("string"),
    )


def canonical_url(url: F.Column) -> F.Column:
    """Deterministic URL canonicalizer, pure JVM expressions:
    1. strip the fragment;
    2. drop tracking params (utm_*) wherever they sit in the query
       string, preserving separators for the survivors;
    3. drop a now-empty '?';
    4. lowercase ONLY scheme+host (path/query case is significant);
    5. normalize scheme to https; strip a trailing path slash.
    Mirrored verbatim in SQL by :func:`sql_canonical_url` (no
    backreferences/lookaround — RE2-safe)."""
    u = F.regexp_replace(url, r"#.*$", "")
    u = F.regexp_replace(u, r"&utm_[^&#]*", "")
    u = F.regexp_replace(u, r"\?utm_[^&#]*&", "?")
    u = F.regexp_replace(u, r"\?utm_[^&#]*$", "")
    host = F.lower(F.regexp_extract(u, r"^[Hh][Tt][Tt][Pp][Ss]?://([^/?#]*)", 1))
    rest = F.regexp_replace(u, r"^[Hh][Tt][Tt][Pp][Ss]?://[^/?#]*", "")
    rest = F.regexp_replace(rest, r"/\?", "?")
    rest = F.regexp_replace(rest, r"/$", "")
    return F.concat(F.lit("https://"), host, rest)


def sql_canonical_url(expr: str) -> str:
    u = f"regexp_replace({expr}, '#.*$', '', 'g')"
    u = f"regexp_replace({u}, '&utm_[^&#]*', '', 'g')"
    u = f"regexp_replace({u}, '\\?utm_[^&#]*&', '?', 'g')"
    u = f"regexp_replace({u}, '\\?utm_[^&#]*$', '', 'g')"
    host = f"lower(regexp_extract({u}, '^[Hh][Tt][Tt][Pp][Ss]?://([^/?#]*)', 1))"
    rest = f"regexp_replace({u}, '^[Hh][Tt][Tt][Pp][Ss]?://[^/?#]*', '', 'g')"
    rest = f"regexp_replace({rest}, '/\\?', '?', 'g')"
    rest = f"regexp_replace({rest}, '/$', '', 'g')"
    return f"('https://' || {host} || {rest})"


@register(
    "d_url_dedup",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, {sql_canonical_url(_SQL_URL)} AS canonical_url
      FROM documents
    )
    SELECT canonical_url,
           COUNT(*) AS n_variants,
           CAST(MIN(doc_id) AS BIGINT) AS survivor_doc_id
    FROM u GROUP BY canonical_url
    """,
)
def d_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup: variants differing only in host case,
    tracking params, fragments, or trailing slashes collapse to one
    canonical key; MIN(doc_id) survives. The planted fixture generates 10
    host/param/fragment variants per canonical page — the gate fails if
    ANY canonicalization step misses on either engine. One hash aggregate
    keyed on the canonical URL (map-side combined); canonicalization
    itself is zero-shuffle scan-stage work."""
    docs = load_table(spark, sf_dir, "documents")
    u = docs.select(
        "doc_id", canonical_url(_spark_url()).alias("canonical_url")
    )
    return u.groupBy("canonical_url").agg(
        F.count(F.lit(1)).alias("n_variants"),
        F.min("doc_id").cast("long").alias("survivor_doc_id"),
    )


@register(
    "v_topic_balance",
    oracle=f"""
    WITH c AS (
      SELECT vec_id AS cell, embedding AS c_vec
      FROM embeddings WHERE vec_id < 8
    ), scored AS (
      SELECT a.vec_id, c.cell,
             {sql_cosine_sim("a.embedding", "c.c_vec")} AS cos
      FROM embeddings a CROSS JOIN c
    ), best AS (
      SELECT vec_id, cell,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, cell ASC) AS rn
      FROM scored
    ), j AS (
      SELECT d.source, b.cell
      FROM best b JOIN documents d ON b.vec_id = d.doc_id
      WHERE b.rn = 1
    ), per AS (
      SELECT source, cell, COUNT(*) AS n_docs FROM j GROUP BY source, cell
    ), tot AS (
      SELECT source, SUM(n_docs) AS t FROM per GROUP BY source
    )
    SELECT p.source, p.cell, p.n_docs,
           CAST(ROUND(p.n_docs * 1e6 / CAST(t.t AS DOUBLE)) AS BIGINT)
             AS share_micro
    FROM per p JOIN tot t USING (source)
    """,
)
def v_topic_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic balance per source: every embedding is assigned to its
    max-cosine codebook cell (v_kmeans_assign's broadcast scoring — the
    corpus never shuffles for assignment), linked to its document, and
    rolled up to cluster shares within each source. The report that
    drives topic-aware mixture reweighting: a source whose mass sits in
    one cell is a single-topic feed. Micro-scaled shares, one rounding."""
    from g_data_pipeline_spark.operators.similarity import assign_to_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("c_vec")
    )
    best = assign_to_centroids(emb, cents)
    j = best.join(
        docs.select(F.col("doc_id"), F.col("source")),
        best.vec_id == F.col("doc_id"),
    ).select("source", "cell")
    per = j.groupBy("source", "cell").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    tot = per.groupBy("source").agg(F.sum("n_docs").alias("t"))
    return per.join(F.broadcast(tot), "source").select(
        "source",
        "cell",
        "n_docs",
        F.round(F.col("n_docs") * F.lit(1e6) / F.col("t").cast("double"))
        .cast("long")
        .alias("share_micro"),
    )
