"""Deduplication operators for training-data pipelines: exact,
fingerprint, n-gram Jaccard, MinHash+LSH, SimHash.

None of this exists in the reference (its only distinct-adjacent op is
``n_unique`` counting — SURVEY.md §2.3 P4); these are the north-star
extensions, designed Spark-first. Algorithms are the published standards:
MinHash resemblance sketching (Broder, "On the resemblance and containment
of documents", 1997), banded LSH (Leskovec/Rajaraman/Ullman, Mining of
Massive Datasets ch.3), and SimHash (Charikar, "Similarity estimation
techniques from rounding algorithms", STOC 2002; Manku et al., WWW 2007
for the Hamming-band trick).

- Everything is DataFrame expressions + joins — the only shuffles are the
  ones the algorithms inherently need (group on key / band / shingle).
- All hashing is seeded ``xxhash64`` (Spark's built-in 64-bit XXH64) —
  deterministic across runs, partitionings, and cluster sizes. No Python
  UDFs anywhere.
- The scale story per operator is in its docstring; the common trick is
  that candidate generation (LSH bands, shingle inverted index) keys the
  shuffle on *content*, so work distributes by data, not by pair count.

Exact-duplicate policy: the survivor of a duplicate group is the row with
the minimal ``order_col`` — deterministic, unlike ``dropDuplicates`` (which
keeps an arbitrary first-seen row per key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from g_data_pipeline_spark.functions.text import (
    normalize_text,
    tokens,
    word_shingles,
)


def exact_dedup(
    df: DataFrame, key_cols: list[str], order_col: str
) -> DataFrame:
    """Keep one row per distinct ``key_cols`` — the one with MIN(order_col).

    One shuffle on the key columns (same as any groupBy); WindowGroupLimit
    truncates each partition to 1 row pre-shuffle for the rank filter, so
    skewed duplicate groups don't concentrate memory.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def fingerprint_dedup(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Near-exact dedup on the md5 of normalized text (case/punctuation/
    whitespace-invariant). Same plan shape as exact_dedup keyed on the
    fingerprint."""
    return exact_dedup(
        df.withColumn("__fp", F.md5(normalize_text(text_col).cast("binary"))),
        ["__fp"],
        id_col,
    ).drop("__fp")


# --------------------------------------------------------------------------
# n-gram Jaccard (exact near-dup ground truth)
# --------------------------------------------------------------------------

def shingle_sets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    token_mode: str = "whitespace",
) -> DataFrame:
    """(id, shingles array, set size) per doc — the input signal shared by
    exact Jaccard and MinHash. ``token_mode="script"`` shingles over
    script-aware tokens (one per CJK char — without it a whole CJK
    sentence is a single "word" and every shingle-based dedup is blind
    on zh/ja corpora; round 8, byte-identical default)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_shingles(text_col, n, token_mode)).alias(
            "shingles"
        ),
    ).withColumn("set_size", F.size("shingles"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
    token_mode: str = "whitespace",
) -> DataFrame:
    """EXACT Jaccard-similar pairs (id_a < id_b, jaccard >= threshold) via a
    shingle inverted index:

        explode shingles -> self-join on shingle -> count common -> Jaccard.

    Scale: the join shuffles on shingle *content*; a hot shingle appearing
    in f docs contributes f^2 candidate rows, so ``max_shingle_freq`` drops
    ultra-common shingles (stopword runs) before the join — the standard
    document-frequency cutoff. Exact for pairs whose similarity comes from
    non-dropped shingles; at 100 TB run this per-language-partition with a
    cutoff, or use minhash_lsh_pairs below.
    """
    sets = shingle_sets(df, id_col, text_col, n, token_mode).filter(
        F.col("set_size") > 0
    )
    posts = sets.select("id", "set_size", F.explode("shingles").alias("sh"))
    if max_shingle_freq is not None:
        freq = posts.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
        posts = posts.join(
            freq.filter(F.col("df") <= max_shingle_freq).select("sh"), "sh"
        )
    a = posts.select(
        F.col("id").alias("id_a"), F.col("set_size").alias("size_a"), "sh"
    )
    b = posts.select(
        F.col("id").alias("id_b"), F.col("set_size").alias("size_b"), "sh"
    )
    pairs = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "size_a", "size_b")
        .agg(F.count(F.lit(1)).alias("common"))
        .withColumn(
            "jaccard",
            F.col("common")
            / (F.col("size_a") + F.col("size_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return pairs.select("id_a", "id_b", "common", "jaccard")


def shingle_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = None,
    token_mode: str = "whitespace",
) -> DataFrame:
    """EXACT shingle-CONTAINMENT pairs: for every ORDERED pair (a, b),
    containment(a -> b) = |shingles(a) ∩ shingles(b)| / |shingles(a)|.

    Jaccard misses sub-document copies: a short doc pasted verbatim into a
    much longer one has near-zero Jaccard (the union is huge) but
    containment(short -> long) ≈ 1 — the Broder '97 "containment"
    companion measure, and the right signal for quote/excerpt/wrapper
    contamination. Emits BOTH directions (the measure is asymmetric).

    Same inverted-index shape and document-frequency cutoff as
    ngram_jaccard_pairs — shuffles ride shingle content, never all-pairs.
    The fraction is emitted as an exact micro-scaled integer
    (containment_micro), threshold-compared in integer space."""
    sets = shingle_sets(df, id_col, text_col, n, token_mode).filter(
        F.col("set_size") > 0
    )
    posts = sets.select("id", "set_size", F.explode("shingles").alias("sh"))
    if max_shingle_freq is not None:
        freq = posts.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
        posts = posts.join(
            freq.filter(F.col("df") <= max_shingle_freq).select("sh"), "sh"
        )
    a = posts.select(
        F.col("id").alias("id_a"), F.col("set_size").alias("size_a"), "sh"
    )
    b = posts.select(F.col("id").alias("id_b"), "sh")
    micro = F.round(
        F.lit(1e6) * F.col("common").cast("double") / F.col("size_a")
    ).cast("long")
    return (
        a.join(b, "sh")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b", "size_a")
        .agg(F.count(F.lit(1)).alias("common"))
        .withColumn("containment_micro", micro)
        .filter(F.col("containment_micro") >= int(round(threshold * 1e6)))
        .select(
            "id_a",
            "id_b",
            F.col("size_a").cast("long").alias("size_a"),
            "common",
            "containment_micro",
        )
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def _md5_perm(s: Column, i: int) -> Column:
    """md5 'permutation' i of a shingle: 60-bit integer from the first 15
    hex chars of md5(s <US> i) — byte-identical in DuckDB
    (``CAST('0x' || substring(md5(s || chr(31) || i), 1, 15) AS BIGINT)``),
    the cross-engine family the oracle-gated estimators pinned
    (query_defs/sketches.py)."""
    return F.conv(
        F.substring(F.md5(F.concat(s, F.lit("\x1f"), F.lit(str(i)))), 1, 15),
        16,
        10,
    ).cast("bigint")


def minhash_signature(
    shingles: Column, num_hashes: int, hash_family: str = "xxhash64"
) -> Column:
    """array<long> signature: per permutation i, min over shingles of
    permutation-i's hash. ``hash_family='xxhash64'`` (default, production)
    uses seeded xxhash64 — deterministic everywhere, computed JVM-side
    inside one expression, fastest. ``'md5'`` uses the md5 permutation
    family reproducible in DuckDB SQL — same algebra, used by the
    oracle-gated registry entries."""
    if hash_family == "md5":
        perm = _md5_perm
    elif hash_family == "xxhash64":
        def perm(s: Column, i: int) -> Column:
            return F.xxhash64(s, F.lit(i))
    else:
        raise ValueError(f"unknown hash_family {hash_family!r}")
    return F.array(
        *[
            F.array_min(F.transform(shingles, lambda s: perm(s, i)))
            for i in range(num_hashes)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    verify: bool = True,
    hash_family: str = "xxhash64",
    token_mode: str = "whitespace",
) -> DataFrame:
    """Near-dup pairs via MinHash signatures + banded LSH:

        signature (num_hashes mins) -> split into ``bands`` bands of
        r = num_hashes/bands values -> candidate pairs = docs sharing any
        band hash -> (optionally) verify candidates with EXACT Jaccard.

    The only shuffles are the band-bucket self-join (keyed on band content)
    and the final pair group — no all-pairs blowup. With b bands of r rows
    the candidate-recall curve is 1-(1-s^r)^b; defaults (b=8, r=4) give
    ~97% recall at s=0.5. ``verify=True`` recomputes exact Jaccard on the
    candidates only (cheap: candidates ≪ n²), so precision is exact and
    the output is directly comparable to ngram_jaccard_pairs minus LSH
    misses.

    ``hash_family``: 'xxhash64' (default) hashes each band's content to a
    long bucket — narrowest shuffle key, the production path. 'md5' uses
    the DuckDB-reproducible md5 permutation family AND keeps the band
    bucket as the raw value string, so the ENTIRE banding algebra —
    signatures, band split, bucket grouping, candidate join — has an
    exact SQL twin (the d_minhash_lsh_pairs oracle); a content-string key
    also makes the candidate set collision-free by construction.
    """
    sets = shingle_sets(df, id_col, text_col, n, token_mode).filter(
        F.col("set_size") > 0
    )
    band_rows = _minhash_band_rows(
        sets, num_hashes=num_hashes, bands=bands, hash_family=hash_family
    )
    a = band_rows.select(F.col("id").alias("id_a"), "band", "bucket")
    b = band_rows.select(F.col("id").alias("id_b"), "band", "bucket")
    candidates = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
    )
    if not verify:
        return candidates

    sets_a = sets.select(
        F.col("id").alias("id_a"),
        F.col("shingles").alias("sh_a"),
        F.col("set_size").alias("size_a"),
    )
    sets_b = sets.select(
        F.col("id").alias("id_b"),
        F.col("shingles").alias("sh_b"),
        F.col("set_size").alias("size_b"),
    )
    return (
        candidates.join(sets_a, "id_a")
        .join(sets_b, "id_b")
        .withColumn(
            "common", F.size(F.array_intersect("sh_a", "sh_b"))
        )
        .withColumn(
            "jaccard",
            F.col("common")
            / (F.col("size_a") + F.col("size_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "common", "jaccard")
    )


def _minhash_band_rows(
    sets: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(id, band, bucket) LSH band rows from a ``shingle_sets`` frame —
    the shared kernel behind :func:`minhash_lsh_pairs` and the
    incremental archive ops. Bucket = the band's r signature values
    hashed to a long (xxhash64 family, narrowest shuffle key) or kept as
    the raw value string (md5 family, SQL-twin-able + collision-free)."""
    r = num_hashes // bands
    assert r * bands == num_hashes, "bands must divide num_hashes"
    sigs = sets.withColumn(
        "sig",
        minhash_signature(F.col("shingles"), num_hashes, hash_family),
    )

    def band_key(bi: int) -> Column:
        content = F.concat_ws(
            ",", *[F.col("sig")[bi * r + j].cast("string") for j in range(r)]
        )
        if hash_family == "md5":
            return content.alias("bucket")  # SQL-twin-able, collision-free
        return F.xxhash64(content).alias("bucket")

    return (
        sigs.select(
            "id",
            F.posexplode(
                F.array(
                    *[
                        F.struct(F.lit(bi).alias("band"), band_key(bi))
                        for bi in range(bands)
                    ]
                )
            ).alias("pos", "bb"),
        )
        .select(
            "id",
            F.col("bb.band").alias("band"),
            F.col("bb.bucket").alias("bucket"),
        )
    )


def minhash_band_directory(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    hash_family: str = "xxhash64",
    token_mode: str = "whitespace",
) -> DataFrame:
    """The persistent state behind incremental NEAR-dup maintenance: one
    row per DISTINCT LSH band bucket with its canonical owner ``(band,
    bucket, owner_id)`` — the MinHash twin of
    :func:`substring_window_directory`. Built once from the historical
    corpus, then maintained by appending each dump's survivor delta
    (:func:`incremental_minhash_dedup`); at 100 TB this directory is a
    bucketed-by-(band,bucket) table so only the batch side ever
    shuffles."""
    sets = shingle_sets(df, id_col, text_col, n, token_mode).filter(
        F.col("set_size") > 0
    )
    rows = _minhash_band_rows(
        sets, num_hashes=num_hashes, bands=bands, hash_family=hash_family
    )
    return rows.groupBy("band", "bucket").agg(
        F.min("id").alias("owner_id")
    )


def incremental_minhash_dedup(
    batch: DataFrame,
    directory: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int | None = None,
    threshold: float = 0.8,
    hash_family: str = "xxhash64",
    token_mode: str = "whitespace",
) -> tuple[DataFrame, DataFrame]:
    """NEAR-dup dedup of a new crawl dump against a growing MinHash-LSH
    archive — the modality production crawl curation runs most (the
    RefinedWeb/Gopher shape: banded LSH decides, no pairwise
    verification — the archive keeps band buckets, not documents, so
    there is nothing to verify against; precision is the banding
    curve's). The near-dup twin of :func:`incremental_substring_dedup`.

    Decision, one pass, deterministic:

    - ARCHIVE hit: a batch doc band bucket already in ``directory`` with
      ``owner_id != id`` (self-ownership is excluded so a replay against
      a directory that already absorbed this batch's delta labels
      identically — the exactly-once streaming twin relies on it);
    - BATCH hit: the bucket's minimum id WITHIN the batch is smaller
      than the doc's (bucket-min survivorship over ALL batch docs —
      including docs that are themselves archive dups, deliberately:
      restricting to survivors would flip chained decisions between a
      first run and a replay). Chained buckets therefore collapse
      greedily toward the cluster minimum — the one-pass approximation
      of connected components; full CC is :func:`dedup_clusters`.
    - ``is_dup`` = any hit; ``n_dup_buckets`` counts the doc's hit
      buckets (replay-stable: a first-run batch hit becomes an archive
      hit on replay, same count).

    Returns ``(labeled, delta)``: ``labeled`` = (id, n_buckets,
    n_dup_buckets, is_dup) for EVERY batch row (docs too short to
    shingle carry 0/0/false); ``delta`` = the SURVIVORS' band buckets
    not already in the directory, canonical owner = min surviving id —
    the rows to append so the next dump dedups against this one.

    Scale: every wide operation keys on (band, bucket) content or batch
    doc id; the archive is never rescanned — with a (band,
    bucket)-bucketed directory table only the batch side shuffles.

    Banding (round-8, verdict #7): when ``bands`` is None the split is
    DERIVED from the target Jaccard ``threshold`` via the LSH banding
    planner (operators/banding.recommend_banding — sharpest
    factorization of ``num_hashes`` whose S-curve recall at the
    threshold still clears the planner's floor). The defaults
    (num_hashes=32, threshold=0.8) reproduce the historical hard-coded
    8 bands x 4 rows exactly (test-pinned); pass ``bands`` explicitly
    to override the planner. NOTE an incremental directory bakes its
    banding in: changing (bands, rows) mid-stream orphans existing
    buckets — pick per archive, once.
    """
    if bands is None:
        from g_data_pipeline_spark.operators.banding import (
            recommend_banding,
        )

        bands = recommend_banding(num_hashes, threshold).bands
    sets = shingle_sets(batch, id_col, text_col, n, token_mode).filter(
        F.col("set_size") > 0
    )
    rows = _minhash_band_rows(
        sets, num_hashes=num_hashes, bands=bands, hash_family=hash_family
    )
    return _incremental_band_label(
        batch.select(F.col(id_col).alias("id")), rows, directory
    )


def _incremental_band_label(
    ids: DataFrame, rows: DataFrame, directory: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """The banded-archive decision core shared by the MinHash and SimHash
    incremental forms: given a batch's (id, band, bucket) rows and a
    (band, bucket, owner_id) directory, label every id (archive-hit /
    bucket-min survivorship — see incremental_minhash_dedup's docstring
    for the replay-stability argument) and emit the survivors' new-bucket
    delta. ``ids`` supplies the TOTAL labeling domain (ids with no band
    rows label 0/0/false)."""
    dir_slim = directory.select("band", "bucket", "owner_id")
    hits = rows.join(dir_slim, ["band", "bucket"], "left").withColumn(
        "__arch", F.col("owner_id").isNotNull() & (F.col("owner_id") != F.col("id"))
    )
    batch_min = rows.groupBy("band", "bucket").agg(
        F.min("id").alias("__bmin")
    )
    flagged = (
        hits.join(batch_min, ["band", "bucket"])
        .withColumn(
            "__hit", F.col("__arch") | (F.col("__bmin") < F.col("id"))
        )
    )
    per_doc = flagged.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.count_if(F.col("__hit")).alias("n_dup_buckets"),
    )
    labeled = (
        ids.join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce("n_buckets", F.lit(0)).cast("long").alias(
                "n_buckets"
            ),
            F.coalesce("n_dup_buckets", F.lit(0)).cast("long").alias(
                "n_dup_buckets"
            ),
            (F.coalesce("n_dup_buckets", F.lit(0)) > 0).alias("is_dup"),
        )
    )
    survivors = per_doc.filter(F.col("n_dup_buckets") == 0).select("id")
    delta = (
        rows.join(survivors, "id", "left_semi")
        .join(dir_slim.select("band", "bucket"), ["band", "bucket"], "left_anti")
        .groupBy("band", "bucket")
        .agg(F.min("id").alias("owner_id"))
    )
    return labeled, delta


def _simhash_band_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bands: int = 4,
    bits: int = 64,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(id, band, bucket) pigeonhole chunk rows from per-doc SimHash
    fingerprints — the Hamming-family twin of :func:`_minhash_band_rows`
    (bucket = the band's chunk VALUE; any pair within Hamming < bands
    shares one)."""
    from g_data_pipeline_spark.functions.text import tokens

    assert bits % bands == 0, "bands must divide bits"
    chunk_bits = bits // bands
    mask = (1 << chunk_bits) - 1
    sims = df.select(
        F.col(id_col).alias("id"),
        simhash_expr(tokens(text_col), bits, hash_family).alias("simhash"),
    )
    return sims.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftright("simhash", bi * chunk_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(
        "id",
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
    )


def simhash_band_directory(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bands: int = 4,
    bits: int = 64,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Persistent (band, chunk-bucket, owner_id) archive for incremental
    SimHash near-dup maintenance — the Hamming-family twin of
    :func:`minhash_band_directory` (pigeonhole: Hamming < bands implies
    a shared chunk, so archive membership catches close fingerprints
    without storing them)."""
    rows = _simhash_band_rows(df, id_col, text_col, bands, bits, hash_family)
    return rows.groupBy("band", "bucket").agg(
        F.min("id").alias("owner_id")
    )


def incremental_simhash_dedup(
    batch: DataFrame,
    directory: DataFrame,
    id_col: str,
    text_col: str,
    bands: int = 4,
    bits: int = 64,
    hash_family: str = "xxhash64",
) -> tuple[DataFrame, DataFrame]:
    """SimHash twin of :func:`incremental_minhash_dedup`: a new dump's
    pigeonhole chunk rows against a growing (band, chunk) archive —
    catches Hamming-close documents (templated/boilerplate variants,
    where MinHash's Jaccard lens is the shingle-set view and SimHash's
    is the weighted-bit view; production crawls run both). Identical
    decision core (:func:`_incremental_band_label`): archive hits with
    self-ownership excluded, bucket-min survivorship over all batch
    docs, replay-stable labels, survivor-only deltas. NOTE pigeonhole
    precision: a shared 16-bit chunk is weaker evidence than a shared
    4-value MinHash band — size chunks (bits/bands) to the corpus, or
    treat ``n_dup_buckets >= 2`` as the drop rule."""
    rows = _simhash_band_rows(batch, id_col, text_col, bands, bits, hash_family)
    return _incremental_band_label(
        batch.select(F.col(id_col).alias("id")), rows, directory
    )


# --------------------------------------------------------------------------
# Duplicate clustering (connected components over near-dup pairs)
# --------------------------------------------------------------------------

def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Connected components over a near-dup pair graph -> (id, cluster_id)
    with cluster_id = MIN member id. The iterative-algorithm shape (label
    propagation to a fixed point) that no single SQL query expresses:

        label(v) <- min(label(v), min over neighbors(label(u)))

    repeated until no label changes. Each iteration is one join + one
    groupBy (shuffles keyed on vertex id); iterations ~ graph diameter
    (near-dup clusters are small and dense, so typically 2-4). The loop
    checkpoints via localCheckpoint every few rounds to truncate lineage —
    without it the plan doubles per iteration and the driver OOMs on plan
    size long before data size matters.

    Output contains every vertex that appears in ``pairs`` (singletons that
    never appear pair with themselves trivially and need no clustering).
    """
    # EAGERLY materialize the edge list once: every iteration's
    # neighbor_min join consumes `edges`, and without the checkpoint the
    # expensive upstream pair pipeline (e.g. the n-gram Jaccard inverted
    # index) re-runs inside EVERY iteration. The edge list itself is tiny
    # (two ids per near-dup pair) at any corpus size.
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
    )
    converged = False
    prev_cached: DataFrame | None = None
    for i in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        updated = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("new_label"),
                (F.col("nbr_label") < F.col("label")).alias("changed"),
            )
        )
        # Persist before the convergence-check action so the iteration's
        # join/groupBy is computed once, not re-paid when `labels` feeds the
        # next round.
        updated = updated.persist()
        changed = updated.filter(F.col("changed")).limit(1).count() > 0
        labels = updated.select("id", F.col("new_label").alias("label"))
        if i % 3 == 2:
            labels = labels.localCheckpoint(eager=True)
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = updated
        if not changed:
            converged = True
            break
    # Materialize the final labels off the cached lineage, then release it.
    labels = labels.localCheckpoint(eager=True)
    if prev_cached is not None:
        prev_cached.unpersist()
    if not converged:
        raise RuntimeError(
            f"dedup_clusters did not converge within {max_iterations} "
            "iterations (graph diameter exceeds the cap); raise "
            "max_iterations — returning partially-propagated labels would "
            "silently mis-cluster"
        )
    return labels.select(F.col("id"), F.col("label").alias("cluster_id"))


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash_expr(
    tokens_col: Column, bits: int = 64, hash_family: str = "xxhash64"
) -> Column:
    """SimHash over a token array, fully JVM-side:

    per token: h = hash(token); per bit b: +1 if set else -1, summed
    over tokens via one aggregate() with an array accumulator; bit b of the
    simhash = (sum_b > 0). Returns a LONG.

    ``hash_family='md5'`` swaps xxhash64 for the DuckDB-reproducible
    60-bit md5 token hash (first 15 hex chars — the estimator family,
    query_defs/sketches.py), so the whole vote/sign algebra has an exact
    SQL twin; bits must be <= 60 in that family (use 32, the gated
    convention)."""
    if hash_family == "md5":
        if bits > 60:
            raise ValueError("md5 family provides 60 hash bits; bits <= 60")
        hashes = F.transform(
            tokens_col,
            lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast(
                "bigint"
            ),
        )
    elif hash_family == "xxhash64":
        hashes = F.transform(tokens_col, lambda t: F.xxhash64(t))
    else:
        raise ValueError(f"unknown hash_family {hash_family!r}")
    acc0 = F.array_repeat(F.lit(0).cast("long"), bits)
    sums = F.aggregate(
        hashes,
        acc0,
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                    )
                    .otherwise(F.lit(-1))
                    .cast("long")
                    for b in range(bits)
                ]
            ),
            lambda a, d: a + d,
        ),
    )
    # bit 63 of a signed long is the sign bit: 1<<63 must wrap negative.
    pow2 = F.array(
        *[
            F.lit((1 << b) if b < 63 else -(1 << 63)).cast("long")
            for b in range(bits)
        ]
    )
    return F.aggregate(
        F.zip_with(
            sums, pow2, lambda s, p: F.when(s > 0, p).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc.bitwiseOR(v),
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 8,
    bands: int = 4,
    bits: int = 64,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Candidate generation: split the ``bits``-bit simhash into ``bands``
    chunks; by pigeonhole, any pair within Hamming distance < bands must
    agree on at least one chunk -> join on (band, chunk). Exact Hamming
    verification via bit_count(xor). One shuffle keyed on chunk content.
    ``hash_family='md5'`` (with bits=32) is the DuckDB-reproducible
    variant the d_simhash_pairs oracle gates end-to-end.
    """
    from g_data_pipeline_spark.functions.text import tokens

    assert bits % bands == 0, "bands must divide bits"
    chunk_bits = bits // bands
    mask = (1 << chunk_bits) - 1
    sims = df.select(
        F.col(id_col).alias("id"),
        simhash_expr(tokens(text_col), bits, hash_family).alias("simhash"),
    )
    band_rows = sims.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftright("simhash", bi * chunk_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "simhash", F.col("bb.band").alias("band"), F.col("bb.chunk").alias("chunk"))
    a = band_rows.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sim_a"), "band", "chunk"
    )
    b = band_rows.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sim_b"), "band", "chunk"
    )
    return (
        a.join(b, ["band", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sim_a", "sim_b")
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_overlap: int = 5,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing >=
    ``min_overlap`` distinct word n-grams with ANY benchmark document — the
    standard pre-training hygiene pass (n-gram collision scans per the
    GPT-3 appendix C / PaLM appendix methodology; no equivalent in the
    reference, which has no corpus operators at all).

    Returns every corpus row's (id, n_overlap, contaminated) — zero-overlap
    documents are kept with n_overlap = 0 so the output is a total labeling,
    ready for an anti-join or a filter.

    Scale (100 TB corpus vs ~10^5-doc benchmark suite): the benchmark
    shingle set is DISTINCT-reduced then broadcast, so the corpus side
    explodes its shingles and probes the broadcast hash map with NO shuffle;
    the only shuffles are the per-doc overlap count (keyed on doc id) and
    the small left join planting zeros. If the benchmark outgrows broadcast
    (~10^8 shingles), drop the hint and the same plan runs as a shuffled
    join keyed on shingle content.
    """
    bench_shingles = (
        benchmark.select(
            F.explode(F.array_distinct(word_shingles(text_col, n))).alias("s")
        )
        .distinct()
    )
    corpus_shingles = corpus.select(
        F.col(id_col).alias("_cid"),
        F.explode(F.array_distinct(word_shingles(text_col, n))).alias("s"),
    )
    overlap = (
        corpus_shingles.join(F.broadcast(bench_shingles), "s", "left_semi")
        .groupBy("_cid")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
    )
    return (
        corpus.select(F.col(id_col))
        .join(overlap, F.col(id_col) == F.col("_cid"), "left")
        .select(
            id_col,
            F.coalesce(F.col("n_overlap"), F.lit(0).cast("long")).alias("n_overlap"),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) >= min_overlap).alias(
                "contaminated"
            ),
        )
    )


def span_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_tokens: int = 8,
) -> DataFrame:
    """Corpus-level repeated-span removal (the C4 "three-sentence span"
    dedup, token-window form; Raffel et al. 2020 §2.2): split every document
    into non-overlapping ``span_tokens``-token spans, keep only the FIRST
    occurrence of each distinct span corpus-wide (ordered by (doc id,
    position) — deterministic), and reassemble each document from its
    surviving spans in original order.

    Returns a total labeling: (id, dedup_text, spans_kept, spans_total) for
    EVERY input row — a fully-deduplicated document comes back with
    ``dedup_text = ''`` and ``spans_kept = 0``.

    Scale (100 TB): the only wide stage is the first-occurrence rank, which
    shuffles keyed on span CONTENT — work distributes by data, and
    WindowGroupLimit truncates each span's group before the final filter.
    The decision rows are slim (guide §8): after the rank filter the span
    STRING is dropped — reassembly shuffles surviving (id, pos) ints only
    and rebuilds each document's text row-locally by re-slicing its staged
    token array (span text crosses exactly one exchange, as the rank key).
    No UDFs; span extraction is sequence+slice like word_shingles, over a
    STAGED token attribute (an expression referenced inside the transform
    lambda would re-run the regex split once per span — the round-6
    O(n_tokens²) trap).
    """
    staged = df.select(
        F.col(id_col).alias("id"),
        tokens(text_col).alias("__toks"),
        (F.trim(F.col(text_col)) == "").alias("__blank"),
    )
    toks = F.col("__toks")
    n_spans = (
        F.when(F.col("__blank"), F.lit(0))
        .otherwise(F.ceil(F.size(toks) / F.lit(float(span_tokens))))
        .cast("int")
    )

    def span_at(pos: Column) -> Column:
        return F.concat_ws(
            " ", F.slice(toks, pos * span_tokens + 1, span_tokens)
        )

    spans = F.when(
        n_spans > 0,
        F.transform(F.sequence(F.lit(0), n_spans - 1), span_at),
    ).otherwise(F.array().cast("array<string>"))

    exploded = staged.select(
        "id", F.posexplode(spans).alias("pos", "span")
    )
    w = Window.partitionBy("span").orderBy("id", "pos")
    kept_pos = (
        exploded.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("pos")).alias("__keep"))
    )
    return (
        staged.select(
            "id",
            "__toks",
            # NULL text: n_spans is NULL (size(NULL) under ANSI); the old
            # size-of-empty-array form returned 0 — keep that contract.
            F.coalesce(n_spans.cast("long"), F.lit(0).cast("long")).alias(
                "spans_total"
            ),
        )
        .join(kept_pos, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(
                F.array_join(F.transform(F.col("__keep"), span_at), " "),
                F.lit(""),
            ).alias("dedup_text"),
            F.coalesce(
                F.size("__keep").cast("long"), F.lit(0).cast("long")
            ).alias("spans_kept"),
            "spans_total",
        )
    )


def incremental_dedup(
    batch: DataFrame,
    history: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Incremental corpus dedup: drop batch documents whose normalized-text
    fingerprint already exists in the historical corpus, then dedupe within
    the batch itself (MIN(id) survives). The daily-crawl-vs-archive pattern:
    history is append-only; each new dump is anti-joined against it.

    Scale (100 TB history): no broadcast hint — Catalyst picks by stats,
    so a small history broadcasts and a billions-of-fingerprints history
    hash-partitions both sides on the 128-bit fingerprint (in a real
    deployment the history side is a bucketed fingerprint table so only the
    batch side shuffles). Within-batch dedup reuses the same fingerprint
    key, so AQE can reuse the exchange.
    """
    from g_data_pipeline_spark.functions.text import fingerprint_md5

    hist_fp = history.select(fingerprint_md5(text_col).alias("__fp")).distinct()
    fresh = (
        batch.withColumn("__fp", fingerprint_md5(text_col))
        .join(hist_fp, "__fp", "left_anti")
    )
    return (
        exact_dedup(fresh, ["__fp"], id_col)
        .select(F.col(id_col), F.col("__fp").alias("fingerprint"))
    )


# --------------------------------------------------------------------------
# Alternating large-star / small-star connected components
# --------------------------------------------------------------------------

def cc_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 30,
    return_iterations: bool = False,
) -> DataFrame | tuple[DataFrame, int]:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014) -> (id, cluster_id = MIN member id).

    The scale-safe sibling of :func:`dedup_clusters`: min-label
    propagation converges in O(graph diameter) rounds — fine for dense
    near-dup clusters (diameter 2-4), but a LONG DUPLICATE CHAIN
    (a≈b≈c≈…, each adjacent pair similar) makes diameter O(n). The star
    alternation contracts such chains in O(log n) rounds:

      large-star: every node points its LARGER neighbors at its
                  neighborhood minimum     {(v, m(u)) : v ∈ Γ(u), v > u}
      small-star: every node and its smaller neighbors re-point at the
                  minimum                  {(v, m(u)) : v ∈ Γ⁻(u) ∪ {u}, v ≠ m(u)}

    Each half-round is one groupBy (vertex-keyed min) + one join (emit) —
    two shuffles keyed on vertex id, map-side combined, no driver-side
    state beyond a (count, hash) convergence checksum. Per-iteration
    persist + localCheckpoint truncates lineage exactly like
    dedup_clusters. Convergence = small-star fixpoint (edge multiset
    checksum unchanged); non-convergence raises rather than returning
    silently mis-clustered labels.

    Use dedup_clusters for dense near-dup graphs (fewer shuffles per
    round); use cc_star when chains may be long — both are oracle-checked
    against the same recursive-CTE reachability fixpoint.
    """
    # EAGERLY materialize the raw pair list ONCE: building `pairs` is
    # typically the expensive part (e.g. the n-gram Jaccard inverted
    # index), and both the vertex set and iteration 1 consume it from
    # several operators BEFORE any action would populate a lazy persist —
    # without the eager checkpoint the whole upstream pipeline re-runs
    # per consumer (measured 50 s -> ~13 s at sf0.1). The checkpointed
    # pair list is tiny (two ids per near-dup pair) at any corpus size.
    raw = pairs.select(
        F.col(id_a).alias("u"), F.col(id_b).alias("v")
    ).localCheckpoint(eager=True)
    verts = (
        raw.select(F.col("u").alias("id"))
        .union(raw.select(F.col("v").alias("id")))
        .distinct()
        .persist()
    )
    edges = raw.filter(F.col("u") != F.col("v")).distinct()
    prev_sig: tuple[int, int] | None = None
    prev_cached: DataFrame | None = None
    converged = False
    iterations = 0
    for i in range(max_iterations):
        # -- large star: bidirectional neighborhoods, larger neighbors
        # re-pointed at min(N(u) ∪ {u}).
        bi = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = bi.groupBy("u").agg(F.min("v").alias("mn"))
        mins = mins.select(
            "u", F.least(F.col("mn"), F.col("u")).alias("m")
        )
        large = (
            bi.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # Invariant from here on: u > v for every edge.
        # -- small star: per u (all neighbors smaller), re-point them and
        # u itself at the minimum.
        mins2 = large.groupBy("u").agg(F.min("v").alias("m"))
        repointed = (
            large.join(mins2, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        self_edge = mins2.select(F.col("u"), F.col("m").alias("v"))
        edges = repointed.union(self_edge).distinct().persist()
        # Convergence checksum: one tiny action per round (count + an
        # order-insensitive hash-sum of the edge multiset).
        # Decimal accumulator: an ANSI-mode long sum of 64-bit hashes
        # overflows; decimal(38,0) is exact and order-insensitive.
        sig_row = edges.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ).collect()[0]
        sig = (sig_row.n, sig_row.h)
        iterations = i + 1
        if i % 3 == 2:
            edges = edges.localCheckpoint(eager=True)
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = edges
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged and prev_sig is not None and prev_sig[0] > 0:
        raise RuntimeError(
            f"cc_star did not converge within {max_iterations} iterations"
        )
    # At the fixpoint every edge is (member, root); roots label themselves.
    labels = (
        verts.join(
            edges.groupBy("u").agg(F.min("v").alias("root")),
            verts.id == F.col("u"),
            "left",
        )
        .select(
            "id", F.coalesce(F.col("root"), F.col("id")).alias("cluster_id")
        )
    )
    labels = labels.localCheckpoint(eager=True)
    verts.unpersist()
    if prev_cached is not None:
        prev_cached.unpersist()
    if return_iterations:
        return labels, iterations
    return labels


def substring_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window_tokens: int = 50,
) -> DataFrame:
    """Exact substring-level dedup TRANSFORM (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): every
    sliding ``window_tokens``-token window that also occurs in another
    document marks a duplicated region; the canonical first occurrence
    (min doc id, then min position) keeps its text, every other
    occurrence's covered tokens are CUT and the document reassembled from
    the surviving tokens. (The paper indexes a suffix array; the
    Spark-native re-expression is the same hash-window inverted index the
    ``d_substring_dedup`` report uses — shuffles keyed on window CONTENT,
    never all-pairs.) Within-document repeats with no cross-document copy
    are left alone — that is the repetition family's job
    (operators/repetition.py).

    Returns a total labeling: (id, dedup_text, n_tokens, n_tokens_kept)
    for EVERY input row; documents shorter than the window pass through
    unchanged.

    Shape: one window explode -> per-hash stats (count of distinct docs +
    the canonical occurrence, one content-keyed shuffle) -> join back ->
    per-doc collect of the REMOVED window start positions (bounded by
    document length) -> LINEAR row-local merged-interval reassembly (no
    UDF; see :func:`_reassemble_after_cuts`).
    """
    w = int(window_tokens)
    # Materialize the token array as a COLUMN before any higher-order
    # lambda touches it: a computed array referenced inside a lambda
    # re-runs the regex split per element — O(n²) splits per document.
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("__text"),
        tokens(F.col(text_col)).alias("__toks"),
    )
    tc = F.col("__toks")
    wins = F.when(
        F.size(tc) >= w,
        F.transform(
            F.sequence(F.lit(1), F.size(tc) - F.lit(w - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(tc, i, w))),
        ),
    ).otherwise(F.array().cast("array<string>"))

    occ = base.select("id", F.posexplode(wins).alias("pos0", "h"))
    stats = occ.groupBy("h").agg(
        F.count_distinct("id").alias("__nd"),
        # canonical occurrence: (min id, min pos within that id) — one
        # struct-min, deterministic
        F.min(F.struct("id", "pos0")).alias("__keep"),
    )
    removed = (
        occ.join(stats, "h")
        .filter(
            (F.col("__nd") >= 2)
            & ~(
                (F.col("id") == F.col("__keep.id"))
                & (F.col("pos0") == F.col("__keep.pos0"))
            )
        )
        .groupBy("id")
        .agg(F.collect_list("pos0").alias("__starts"))
    )
    out = base.join(removed, "id", "left").withColumn(
        "__starts",
        F.coalesce("__starts", F.array().cast("array<int>")),
    )
    return _reassemble_after_cuts(out, w)


def _reassemble_after_cuts(out: DataFrame, w: int) -> DataFrame:
    """Cut every token covered by a removed window start and reassemble —
    LINEAR in document length (round-7 rewrite; the previous per-token
    ``F.exists`` over cut starts was O(tokens x cut-windows), worst-case
    quadratic for a long fully-duplicated document).

    Expects columns (id, __text, __toks, __starts); start ``s`` (0-based
    window position) cuts 1-based tokens [s+1, s+w]. Shape, all row-local
    array expressions:

    1. sort starts; a start BEGINS a merged cut interval iff the gap to
       its predecessor exceeds w, ENDS one iff the gap to its successor
       does (one O(k) pass via transform's (element, index) lambda +
       ``F.get`` of the shifted neighbor — nulls at the edges coalesce);
    2. the KEPT spans are the complement of the merged [lo, hi] cut
       intervals (zip_with of his-prefixed-with-0 against
       los-suffixed-with-n+1);
    3. the surviving text is one ``F.slice`` per kept span, flattened —
       O(tokens) element moves total, no per-token predicate.
    """
    out = out.withColumn("__ss", F.array_sort("__starts"))
    ss = F.col("__ss")  # attribute: cheap to reference inside lambdas
    t = F.col("__toks")
    ann = F.transform(
        ss,
        lambda s, i: F.struct(
            s.alias("s"),
            ((i == F.lit(0)) | (s - F.get(ss, i - 1) > F.lit(w))).alias(
                "b"
            ),
            F.coalesce(F.get(ss, i + 1) - s > F.lit(w), F.lit(True)).alias(
                "e"
            ),
        ),
    )
    los = F.transform(F.filter(ann, lambda x: x["b"]), lambda x: x["s"] + 1)
    his = F.transform(F.filter(ann, lambda x: x["e"]), lambda x: x["s"] + w)
    kept_spans = F.filter(
        F.zip_with(
            F.concat(F.array(F.lit(0)), his),
            F.concat(los, F.array(F.size(t) + 1)),
            lambda hi_prev, lo_next: F.struct(
                (hi_prev + 1).alias("lo"), (lo_next - 1).alias("hi")
            ),
        ),
        lambda sp: sp["hi"] >= sp["lo"],
    )
    kept = F.when(
        F.trim(F.col("__text")) == "", F.array().cast("array<string>")
    ).otherwise(
        F.flatten(
            F.transform(
                kept_spans,
                lambda sp: F.slice(t, sp["lo"], sp["hi"] - sp["lo"] + 1),
            )
        )
    )
    return out.select(
        "id",
        F.array_join(kept, " ").alias("dedup_text"),
        F.when(F.trim(F.col("__text")) == "", F.lit(0))
        .otherwise(F.size(t))
        .cast("long")
        .alias("n_tokens"),
        F.size(kept).cast("long").alias("n_tokens_kept"),
    )


def substring_window_directory(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window_tokens: int = 50,
) -> DataFrame:
    """The persistent state behind incremental substring dedup: one row
    per DISTINCT window hash with its canonical first occurrence
    ``(md5_hash h, owner_id, owner_pos)``. Built once from the historical
    corpus (or maintained by appending each batch's NEW hashes — see
    :func:`incremental_substring_dedup`); at 100 TB this directory is a
    bucketed-by-hash table so only the batch side ever shuffles."""
    w = int(window_tokens)
    base = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__toks")
    )
    tc = F.col("__toks")
    wins = F.when(
        F.size(tc) >= w,
        F.transform(
            F.sequence(F.lit(1), F.size(tc) - F.lit(w - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(tc, i, w))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    occ = base.select("id", F.posexplode(wins).alias("pos0", "h"))
    return occ.groupBy("h").agg(
        F.min(F.struct("id", "pos0")).alias("__o")
    ).select(
        "h",
        F.col("__o.id").alias("owner_id"),
        F.col("__o.pos0").alias("owner_pos"),
    )


def incremental_substring_dedup(
    batch: DataFrame,
    directory: DataFrame,
    id_col: str,
    text_col: str,
    window_tokens: int = 50,
) -> tuple[DataFrame, DataFrame]:
    """Substring-level dedup at crawl-dump cadence (the incremental form
    of :func:`substring_dedup`): every batch window whose hash already
    exists in the HISTORY DIRECTORY — or whose canonical first occurrence
    within the batch is another document — has its covered tokens cut;
    the batch is then reassembled from surviving tokens.

    Returns ``(cleaned, directory_delta)``:

    - ``cleaned``: (id, dedup_text, n_tokens, n_tokens_kept) for every
      batch row (total labeling);
    - ``directory_delta``: the batch's NEW canonical windows — rows to
      APPEND to the directory so the next dump dedups against this one
      (same schema as :func:`substring_window_directory`; survivors'
      within-batch duplicates are already collapsed to one owner).

    Consistency: history always wins — a batch window matching a
    directory hash is cut wherever it appears in the batch, so replaying
    a batch against a directory that already absorbed its delta cuts the
    batch down to only its never-seen-before text (idempotent-shaped,
    like incremental_dedup's fingerprint anti-join). Within the batch,
    the canonical (min id, min pos) occurrence survives, matching the
    one-shot operator.

    Scale: the only wide operations key on the window HASH (batch windows
    vs directory anti/semi joins) and on batch doc ids (the removed-start
    collect) — the 100 TB directory never rescans its corpus, and with a
    hash-bucketed directory table only the batch side shuffles.
    """
    w = int(window_tokens)
    base = batch.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("__text"),
        tokens(F.col(text_col)).alias("__toks"),
    )
    tc = F.col("__toks")
    wins = F.when(
        F.size(tc) >= w,
        F.transform(
            F.sequence(F.lit(1), F.size(tc) - F.lit(w - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(tc, i, w))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    occ = base.select("id", F.posexplode(wins).alias("pos0", "h"))

    dir_hashes = directory.select("h")
    hist_hit = occ.join(dir_hashes, "h", "left_semi")  # cut everywhere
    fresh = occ.join(dir_hashes, "h", "left_anti")
    fresh_canon = fresh.groupBy("h").agg(
        F.min(F.struct("id", "pos0")).alias("__keep")
    )
    batch_dup = (
        fresh.join(fresh_canon, "h")
        .filter(
            ~(
                (F.col("id") == F.col("__keep.id"))
                & (F.col("pos0") == F.col("__keep.pos0"))
            )
        )
        .select("id", "pos0")
    )
    removed = (
        hist_hit.select("id", "pos0")
        .unionByName(batch_dup)
        .groupBy("id")
        .agg(F.collect_list("pos0").alias("__starts"))
    )
    out = base.join(removed, "id", "left").withColumn(
        "__starts", F.coalesce("__starts", F.array().cast("array<int>"))
    )
    cleaned = _reassemble_after_cuts(out, w)
    delta = fresh_canon.select(
        "h",
        F.col("__keep.id").alias("owner_id"),
        F.col("__keep.pos0").alias("owner_pos"),
    )
    return cleaned, delta
