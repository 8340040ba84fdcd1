"""Sketch-graduation queries (round 4, waves 7 and 11): oracle-gated
MinHash and SimHash ESTIMATORS (md5 hash families — reproducible in
DuckDB, unlike the xxhash64 production families in operators/dedup.py),
and an oracle query for the distributed exact-percentile kernel (the
profiler's 100 TB path).

All graduate previously test-only scale machinery to the driver's
hash-equality gate: the MinHash estimate is checked component-by-component
against the same signatures computed in SQL, the SimHash vote/sign/XOR/
popcount algebra is checked at the bit level, and the range-partitioned
order-statistics median must equal QUANTILE_CONT bit-for-bit.

Registered post-window (r5 rotation queue, ROTATION.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.operators.dedup import (
    ngram_jaccard_pairs,
    shingle_sets,
)
from g_data_pipeline_spark.operators.percentiles import (
    exact_percentiles_distributed,
)
from g_data_pipeline_spark.queries import register

_NUM_HASHES = 16

# md5 "permutation" i of shingle s: 60-bit integer from the first 15 hex
# chars of md5(s <US> i) — identical bytes on both engines.
_SQL_SETS = r"""
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

_SQL_SIG = f"""
    sig AS (
      SELECT doc_id,
             [list_min(list_transform(sh,
                s -> CAST(('0x' || substring(md5(s || chr(31)
                                             || CAST(i AS VARCHAR)), 1, 15))
                     AS BIGINT)))
              for i in range(0, {_NUM_HASHES})] AS sg
      FROM sets WHERE len(sh) > 0
    )
"""


@register(
    "d_minhash_estimate_pairs",
    oracle=f"""
    WITH {_SQL_SETS}, {_SQL_SIG}, posts_all AS (
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
    ), hits AS (
      SELECT id_a, id_b, common, size_a + size_b - common AS un
      FROM pairs
      WHERE common / CAST(size_a + size_b - common AS DOUBLE) >= 0.5
    )
    SELECT h.id_a, h.id_b, h.common,
           CAST(ROUND(h.common / CAST(h.un AS DOUBLE) * 1e6) AS BIGINT)
             AS exact_micro,
           CAST(len(list_filter(range(1, {_NUM_HASHES} + 1),
                                i -> sa.sg[i] = sb.sg[i])) AS BIGINT)
             AS n_sig_match,
           CAST(ROUND(len(list_filter(range(1, {_NUM_HASHES} + 1),
                                      i -> sa.sg[i] = sb.sg[i]))
                      / CAST({_NUM_HASHES} AS DOUBLE) * 1e6) AS BIGINT)
             AS est_micro
    FROM hits h
    JOIN sig sa ON sa.doc_id = h.id_a
    JOIN sig sb ON sb.doc_id = h.id_b
    """,
)
def d_minhash_estimate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash Jaccard estimator, oracle-gated end-to-end: per-doc 16-component
    signatures from an md5 permutation family (min over shingles per
    permutation — computed ROW-WISE as array expressions, no explode), then
    for every exact-Jaccard >= 0.5 pair the component match fraction is the
    similarity estimate, emitted next to the exact value. The production
    family (seeded xxhash64, operators/dedup.py:minhash_signature) has no
    SQL twin, so THIS query pins the estimator algebra cross-engine while
    tests/test_dedup.py pins the xxhash64 family's recall. Shape: signature
    build is embarrassingly parallel; the pair list comes from the
    DF-cutoff inverted index (sub-quadratic); signatures join back keyed on
    doc id. All outputs exact integers."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, max_shingle_freq=1000
    ).select(
        "id_a",
        "id_b",
        "common",
        F.round(F.col("jaccard") * F.lit(1e6)).cast("bigint").alias(
            "exact_micro"
        ),
    )

    sets = shingle_sets(docs, "doc_id", "text", n=3).filter(
        F.col("set_size") > 0
    )

    def perm(i: int):
        return F.array_min(
            F.transform(
                F.col("shingles"),
                lambda s: F.conv(
                    F.substring(
                        F.md5(F.concat(s, F.lit("\x1f"), F.lit(str(i)))), 1, 15
                    ),
                    16,
                    10,
                ).cast("bigint"),
            )
        )

    sig = sets.select(
        F.col("id").alias("doc_id"),
        F.array(*[perm(i) for i in range(_NUM_HASHES)]).alias("sg"),
    )
    sa = sig.select(F.col("doc_id").alias("id_a"), F.col("sg").alias("sg_a"))
    sb = sig.select(F.col("doc_id").alias("id_b"), F.col("sg").alias("sg_b"))
    joined = pairs.join(sa, "id_a").join(sb, "id_b")
    n_match = F.aggregate(
        F.zip_with(
            F.col("sg_a"),
            F.col("sg_b"),
            lambda x, y: (x == y).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return joined.select(
        "id_a",
        "id_b",
        "common",
        "exact_micro",
        n_match.alias("n_sig_match"),
        F.round(n_match / F.lit(float(_NUM_HASHES)) * F.lit(1e6))
        .cast("bigint")
        .alias("est_micro"),
    )


@register(
    "p_distributed_percentiles",
    eager=True,  # kernel executes at DataFrame-build time (registry spec flag)
    oracle="""
    SELECT QUANTILE_CONT(l_extendedprice, 0.25) AS p25,
           QUANTILE_CONT(l_extendedprice, 0.5) AS median,
           QUANTILE_CONT(l_extendedprice, 0.75) AS p75
    FROM lineitem
    """,
)
def p_distributed_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The profiler's 100 TB percentile path under the driver gate: exact
    linear-interpolated p25/median/p75 via RANGE-PARTITIONED order
    statistics (operators/percentiles.py — no single-node sort, no
    whole-column buffer; each partition sorts locally and only the few
    needed order statistics are fetched). Must equal QUANTILE_CONT
    bit-for-bit — the kernel's exactness claim, checked by hash. The
    bounded driver-side work is the partition-count bookkeeping (a few
    scalars), not data."""
    li = load_table(spark, sf_dir, "lineitem")
    vals = exact_percentiles_distributed(
        li, "l_extendedprice", [0.25, 0.5, 0.75], num_partitions=16
    )
    return spark.createDataFrame(
        [(vals[0.25], vals[0.5], vals[0.75])],
        "p25 double, median double, p75 double",
    )


# ---------------------------------------------------------------------------
# SimHash estimator (wave 11): md5 bit family, oracle-gated
# ---------------------------------------------------------------------------

_SH_BITS = 32

_SQL_SIMHASH_SETS = r"""
    ssets AS (
      SELECT doc_id,
             list_distinct(string_split_regex(trim(lower(text)), '\s+'))
               AS toks
      FROM documents
      WHERE len(string_split_regex(trim(lower(text)), '\s+')) >= 3
    )
"""

_SQL_FP = f"""
    fp AS (
      SELECT doc_id,
             list_sum([CASE WHEN list_sum(list_transform(hs,
                              h -> ((h // (1::BIGINT << j)) % 2) * 2 - 1)) > 0
                            THEN (1::BIGINT << j) ELSE 0 END
                       for j in range(0, {_SH_BITS})]) AS f
      FROM (SELECT doc_id,
                   list_transform(toks,
                     t -> CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT))
                     AS hs
            FROM ssets)
    )
"""


@register(
    "d_simhash_estimate_pairs",
    oracle=f"""
    WITH {_SQL_SETS}, {_SQL_SIMHASH_SETS}, {_SQL_FP}, posts_all AS (
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
    ), hits AS (
      SELECT id_a, id_b, common, size_a + size_b - common AS un
      FROM pairs
      WHERE common / CAST(size_a + size_b - common AS DOUBLE) >= 0.5
    )
    SELECT h.id_a, h.id_b,
           CAST(ROUND(h.common / CAST(h.un AS DOUBLE) * 1e6) AS BIGINT)
             AS exact_micro,
           CAST(bit_count(xor(fa.f, fb.f)) AS BIGINT) AS hamming
    FROM hits h
    JOIN fp fa ON fa.doc_id = h.id_a
    JOIN fp fb ON fb.doc_id = h.id_b
    """,
)
def d_simhash_estimate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash similarity estimator, oracle-gated end-to-end at the BIT
    level: a {_SH_BITS}-bit fingerprint per document (for each bit
    position, the sign of the sum of +/-1 votes from each distinct
    token's md5 bit), then the Hamming distance for every exact-Jaccard
    >= 0.5 pair — near-identical docs show tiny Hamming distances. The
    production SimHash (operators/dedup.py, xxhash64) stays rows-only;
    THIS query pins the vote/sign/XOR/popcount algebra cross-engine
    (shifts, parity, bit_count must agree bit-for-bit). Fingerprints are
    row-wise expressions (no explode); pairs come from the DF-cutoff
    inverted index; fingerprint lookups join keyed on doc id."""
    docs = load_table(spark, sf_dir, "documents")
    from g_data_pipeline_spark.functions.text import tokens as toks_fn

    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, max_shingle_freq=1000
    ).select(
        "id_a",
        "id_b",
        F.round(F.col("jaccard") * F.lit(1e6)).cast("bigint").alias(
            "exact_micro"
        ),
    )

    base = docs.select(
        "doc_id", F.array_distinct(toks_fn(F.col("text"))).alias("toks")
    ).filter(F.size("toks") >= 3)
    hs = F.transform(
        F.col("toks"),
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint"),
    )

    def bit_term(j: int):
        vote = F.aggregate(
            F.col("hs"),
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + (F.shiftrightunsigned(h, j).bitwiseAND(F.lit(1)) * 2 - 1),
        )
        return F.when(vote > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )

    fp = base.withColumn("hs", hs).select(
        "doc_id",
        sum([bit_term(j) for j in range(1, _SH_BITS)], bit_term(0)).alias("f"),
    )
    fa = fp.select(F.col("doc_id").alias("id_a"), F.col("f").alias("f_a"))
    fb = fp.select(F.col("doc_id").alias("id_b"), F.col("f").alias("f_b"))
    return (
        pairs.join(fa, "id_a")
        .join(fb, "id_b")
        .select(
            "id_a",
            "id_b",
            "exact_micro",
            F.bit_count(F.col("f_a").bitwiseXOR(F.col("f_b")))
            .cast("bigint")
            .alias("hamming"),
        )
    )
