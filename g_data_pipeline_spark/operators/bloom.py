"""Bloom-filter pre-filter for incremental (batch-vs-archive) dedup.

At a 100 TB archive the exact anti-join's shuffle of the HISTORY side
dominates incremental dedup cost. A Bloom filter over the history
fingerprints prunes the batch first: Bloom-NEGATIVE batch keys are
*definitely* absent from history and skip the anti-join entirely; only the
Bloom-positive candidates (true duplicates + ~fpp false positives) pay the
exact join. Exactness is preserved because the residual anti-join
re-checks every candidate — the Bloom only ever removes provably-new keys
from the join input, never adds or drops a result row.

Spark 4 does not expose ``bloom_filter_agg`` / ``might_contain`` as public
SQL functions (they back Catalyst's internal runtime-filter injection
only), so the filter is built NATIVELY as a DataFrame bitset table:

  build:  history → k probe positions per key (``xxhash64(seed, key) pmod
          m``) → (word = bit div 64, mask = 1 << (bit % 64)) →
          ``groupBy(word).agg(bit_or(mask))`` — a map-side-combined
          aggregate whose output is m/64 rows (a 2^24-bit filter is 262k
          rows ≈ 4 MB), trivially broadcastable.
  probe:  batch → same k probes → broadcast-join the word table →
          key is a candidate iff ALL k probed bits are set.

Everything is JVM expressions (xxhash64 / pmod / shiftleft / bit_or /
bitwise &) — zero UDFs, and the history pass is ONE map-side-combined
aggregate instead of a full-width shuffle of every fingerprint.

Sizing: m ≈ 10 bits and k = 5 hashes per element give ~1% fpp
(standard Bloom calculus: fpp ≈ (1 - e^{-kn/m})^k). The word table grows
with m, not with history row count — at 10^10 archive fingerprints,
m = 10^11 bits = 12.5 GB is too big to broadcast whole, so shard the word
table by ``word pmod shards`` and probe per shard, or accept higher fpp;
the residual anti-join keeps every configuration exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_BITS = 1 << 22
DEFAULT_NUM_HASHES = 5


def _probe_bits(key: F.Column, num_bits: int, num_hashes: int) -> F.Column:
    """array<long> of ``num_hashes`` bit positions for a key. Seeded by
    prefixing the hash input with the probe index (xxhash64 exposes no
    seed argument; an extra column is the standard trick)."""
    return F.array(
        *[
            F.pmod(F.xxhash64(F.lit(i), key), F.lit(num_bits))
            for i in range(num_hashes)
        ]
    )


def bloom_build(
    history: DataFrame,
    key_col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """(word: long, bits: long) bitset table over history keys — the
    Bloom filter itself. One explode + one map-side-combined bit_or
    aggregate; output has at most num_bits/64 rows regardless of history
    size."""
    probes = history.select(
        F.explode(_probe_bits(F.col(key_col), num_bits, num_hashes)).alias(
            "bit"
        )
    )
    return (
        probes.select(
            (F.col("bit") / F.lit(64)).cast("long").alias("word"),
            F.expr("shiftleft(cast(1 as bigint), cast(bit % 64 as int))").alias(
                "mask"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_might_contain(
    batch: DataFrame,
    bloom: DataFrame,
    key_col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """batch + a boolean ``__might`` column: True iff every probed bit is
    set (may contain), False iff the key is DEFINITELY absent from the
    filtered set. Probe rows broadcast-join the word table; one keyed
    count-if aggregate folds them back to one row per batch row (keyed on
    a monotonically-unique row id so duplicate keys in the batch are
    preserved)."""
    with_id = batch.withColumn("__rid", F.monotonically_increasing_id())
    probes = with_id.select(
        "__rid",
        F.explode(
            _probe_bits(F.col(key_col), num_bits, num_hashes)
        ).alias("bit"),
    ).select(
        "__rid",
        (F.col("bit") / F.lit(64)).cast("long").alias("word"),
        F.expr("shiftleft(cast(1 as bigint), cast(bit % 64 as int))").alias(
            "mask"
        ),
    )
    checked = probes.join(F.broadcast(bloom), "word", "left").select(
        "__rid",
        (
            F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))
            == F.col("mask")
        ).alias("hit"),
    )
    verdicts = checked.groupBy("__rid").agg(
        (F.count_if("hit") == F.lit(num_hashes)).alias("__might")
    )
    return with_id.join(verdicts, "__rid").drop("__rid")


def incremental_dedup_bloom(
    batch: DataFrame,
    history: DataFrame,
    text_col: str,
    id_col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
    history_fp_col: str | None = None,
) -> DataFrame:
    """Exact incremental dedup (same output contract as
    operators/dedup.py::incremental_dedup — drop batch docs whose
    normalized fingerprint exists in history, then within-batch MIN(id)
    dedup) with a Bloom pre-filter: Bloom-negative batch docs bypass the
    history anti-join entirely; only candidates are re-checked exactly.

    ``history_fp_col``: when the archive already stores fingerprints
    (the streaming sink's layout — re-fingerprinting raw text per batch
    would re-scan the whole archive), name that column instead of
    letting the operator fingerprint ``text_col`` on the history side.
    """
    from g_data_pipeline_spark.functions.text import fingerprint_md5
    from g_data_pipeline_spark.operators.dedup import exact_dedup

    if history_fp_col is not None:
        hist_fp = history.select(F.col(history_fp_col).alias("__fp")).distinct()
    else:
        hist_fp = history.select(
            fingerprint_md5(text_col).alias("__fp")
        ).distinct()
    bloom = bloom_build(hist_fp, "__fp", num_bits, num_hashes)
    keyed = batch.withColumn("__fp", fingerprint_md5(text_col))
    flagged = bloom_might_contain(keyed, bloom, "__fp", num_bits, num_hashes)
    definite_new = flagged.filter(~F.col("__might")).drop("__might")
    candidates = flagged.filter(F.col("__might")).drop("__might")
    survivors = candidates.join(hist_fp, "__fp", "left_anti")
    fresh = definite_new.unionByName(survivors)
    return exact_dedup(fresh, ["__fp"], id_col).select(
        F.col(id_col), F.col("__fp").alias("fingerprint")
    )
