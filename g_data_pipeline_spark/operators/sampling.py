"""Deterministic hash-based sampling — reproducible subsets at any scale.

``df.sample()`` is seeded per-partition RNG: results change with partition
count/layout, so a "10% sample" is NOT stable across cluster sizes, retries,
or engines — useless for reproducible training-data splits. Hash sampling
decides per ROW from the row's own key: keep iff

    bucket(key) = int(md5(key || seed)[:15 hex]) mod 1e6  <  fraction * 1e6

Properties: (a) deterministic everywhere — same rows at local[1] and on a
1000-executor cluster, and md5 is engine-identical, so a DuckDB oracle
reproduces the exact sample; (b) a pure narrow filter — pushes to the scan
side, no shuffle, no RNG state; (c) consistent across tables — sampling two
tables by the same key keeps them join-compatible (the standard trick for
sampled fact/dim pairs); (d) seed changes give independent samples.

Stratified form: per-stratum fractions via one CASE over the stratum
column — one pass, no per-stratum jobs (``sampleBy`` semantics, but
deterministic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def hash_bucket_expr(key_cols: list[str], seed: str = "") -> Column:
    """Uniform bucket in [0, 1e6) from md5 of the concatenated key + seed.
    15 hex chars = 60 bits -> exact BIGINT, no precision loss; chr(31) as
    separator avoids ('ab','c') == ('a','bc') collisions."""
    key = F.concat_ws(
        "\x1f", *[F.col(c).cast("string") for c in key_cols], F.lit(seed)
    )
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint") % _BUCKETS


def sql_hash_bucket(key_cols: list[str], seed: str = "") -> str:
    """DuckDB twin of :func:`hash_bucket_expr` (md5 hex is identical)."""
    keys = ", ".join(f"CAST({c} AS VARCHAR)" for c in key_cols)
    return (
        f"CAST(('0x' || substring(md5(concat_ws(chr(31), {keys}, '{seed}')), 1, 15)) "
        f"AS BIGINT) % {_BUCKETS}"
    )


def hash_sample(
    df: DataFrame, key_cols: list[str], fraction: float, seed: str = ""
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows, decided per key."""
    return df.filter(hash_bucket_expr(key_cols, seed) < int(fraction * _BUCKETS))


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_cols: list[str],
    default_fraction: float = 0.0,
    seed: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (``sampleBy``, reproducibly):
    strata absent from ``fractions`` get ``default_fraction``."""
    threshold: Column = F.lit(int(default_fraction * _BUCKETS))
    for value, frac in fractions.items():
        threshold = (
            F.when(F.col(strata_col) == value, F.lit(int(frac * _BUCKETS)))
            .otherwise(threshold)
        )
    return df.filter(hash_bucket_expr(key_cols, seed) < threshold)


def mixture_weights(
    df: DataFrame,
    source_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled source mixing weights: per-source document counts
    c_i are reweighted as w_i = c_i**alpha / sum_j(c_j**alpha) — the
    standard corpus-mixing scheme (exponential smoothing of multilingual /
    multi-source sampling; mT5 (Xue et al. 2021) §3.1, alpha in [0.2, 1]),
    which upsamples small sources relative to their natural share.

    Output: (source, n_docs, natural_share, mix_weight), one row per source.

    Determinism: for alpha = 0.5 the weight goes through floor(sqrt(c)*1e6)
    — sqrt is IEEE-correctly-rounded on every engine, and the scaled-long
    totals sum exactly, so the final single division is bit-deterministic
    (same scheme as functions/deterministic.py). Other alphas use pow(),
    whose last-ulp behavior is NOT contractually identical across engines —
    fine for production, but register only alpha=0.5 against an oracle.

    Scale: one grouped aggregate (map-side partials) down to #sources rows,
    then an unpartitioned window over that tiny result — the window's
    single-partition stage holds #sources rows, not data rows.
    """
    counts = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    if alpha == 0.5:
        w_scaled = F.floor(F.sqrt(F.col("n_docs")) * F.lit(1_000_000.0)).cast(
            "long"
        )
    else:
        w_scaled = F.floor(
            F.pow(F.col("n_docs").cast("double"), F.lit(alpha))
            * F.lit(1_000_000.0)
        ).cast("long")
    everything = Window.partitionBy()
    return (
        counts.withColumn("__w", w_scaled)
        .select(
            "source",
            "n_docs",
            (
                F.col("n_docs").cast("double")
                / F.sum("n_docs").over(everything).cast("double")
            ).alias("natural_share"),
            (
                F.col("__w").cast("double")
                / F.sum("__w").over(everything).cast("double")
            ).alias("mix_weight"),
        )
    )


def group_split(
    df: DataFrame,
    group_cols: list[str],
    splits: dict[str, float] | None = None,
    seed: str = "",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: the split label is a pure
    function of the GROUP key (e.g. url host, author, conversation id),
    so every row of a group lands in the SAME split — the guard against
    train/test contamination through near-identical documents sharing a
    provenance key (row-level splitting puts 20 pages of one site in
    train and 3 in test, and the eval leaks).

    ``splits`` maps label -> fraction (must sum to ~1); labels are
    assigned by cumulative md5-bucket ranges, so the assignment is
    deterministic, layout-invariant, and reproducible in SQL via
    :func:`sql_hash_bucket`. Adds a ``split`` column; zero shuffles
    (pure row-local expression)."""
    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(splits.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions sum to {total}, expected 1.0")
    bucket = hash_bucket_expr(group_cols, seed)
    expr = None
    acc = 0.0
    items = list(splits.items())
    for label, frac in items[:-1]:
        acc += frac
        cond = bucket < int(acc * _BUCKETS)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    last_label = items[-1][0]
    expr = F.lit(last_label) if expr is None else expr.otherwise(F.lit(last_label))
    return df.withColumn("split", expr)


def deterministic_shuffle(
    df: DataFrame,
    key_cols: list[str],
    epoch: int = 0,
    n_shards: int = 16,
    seed: str = "shuffle-v1",
) -> DataFrame:
    """Reproducible GLOBAL example shuffle for training export: every row
    gets a ``shard`` and a ``shuffle_pos`` defining a pseudo-random total
    order that is a PURE FUNCTION of (key, seed, epoch) — the same
    permutation on any cluster size, input layout, or engine, and a FRESH
    independent permutation per epoch (vary ``epoch``; the trainer's
    every-epoch reshuffle without ever re-randomizing state).

    Contract: rows ordered by (shard, shuffle_pos) are the shuffled
    dataset; write with ``.partitionBy("shard")`` sorted within shard and
    a dataloader reading shards round-robin sees the permuted stream.
    ``shuffle_pos`` = xxhash64(key, seed, epoch) with the key as the
    tiebreak, so ties (hash collisions) stay deterministic.

    Scale: assigning is a zero-shuffle projection; materializing the
    order is ONE repartition on shard + a within-shard sort — no global
    single-partition sort (each shard sorts independently).
    """
    h = F.xxhash64(
        *[F.col(c) for c in key_cols], F.lit(seed), F.lit(int(epoch))
    )
    out = df.withColumn("shuffle_pos", h).withColumn(
        "shard", F.pmod(F.xxhash64(F.col("shuffle_pos")), F.lit(int(n_shards)))
    )
    return out.repartition(int(n_shards), "shard").sortWithinPartitions(
        "shard", "shuffle_pos", *key_cols
    )
