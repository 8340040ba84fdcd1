"""Analytics wave 7 (round 4, wave 3): event-sequence analytics
(Markov transition matrix, inter-arrival dwell time, z-score anomaly
counts), snapshot diffing, equi-depth histograms, quality-weighted
sampling, and embedding-norm distribution stats.

None of these exist in the reference (single-table CSV queries only —
SURVEY.md §2.2); they are standard event-analytics / data-quality /
curation shapes a production pipeline layers on top of that surface.

Registered IN the round-4 driver window at registration time (ROTATION.md
rule 3), paired with demotions of already-green freshness entries.

Determinism policy: same as queries.py — integer counts everywhere
possible; float aggregates through exact scaled-long sums
(functions/deterministic.py); derived doubles (z-score thresholds) are
computed with the identical operation order on both engines and compared
only after micro-scaling to integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.functions.deterministic import dsum, sql_dsum
from g_data_pipeline_spark.functions.text import token_count
from g_data_pipeline_spark.functions.vectors import norm_sq_scaled, sql_dot_scaled
from g_data_pipeline_spark.operators.sampling import (
    hash_bucket_expr,
    sql_hash_bucket,
)
from g_data_pipeline_spark.queries import register

# ---------------------------------------------------------------------------
# Event-sequence analytics
# ---------------------------------------------------------------------------


@register(
    "e_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      FROM events
    ), pairs AS (
      SELECT from_type, to_type, COUNT(*) AS n_transitions
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT from_type, to_type, n_transitions,
           CAST(ROUND(CAST(n_transitions AS DOUBLE)
                      / CAST(SUM(n_transitions) OVER (PARTITION BY from_type)
                             AS DOUBLE) * 1e6) AS BIGINT) AS prob_micro
    FROM pairs
    """,
)
def e_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    LEAD over (user_id, ts, event_id) pairs consecutive events, then the
    (from, to) counts and row-normalized transition probabilities. One
    shuffle on user_id for the sequencing window; the transition agg is
    |event_type|^2 groups (tiny at any scale) with map-side partials, and
    the row-normalizing window runs on that tiny aggregate, not the raw
    events. The probability is count/total of exact integers — one double
    division, micro-scaled with ONE rounding on both engines."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    pairs = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    wt = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(wt).cast("double")
            * F.lit(1e6)
        )
        .cast("bigint")
        .alias("prob_micro"),
    )


@register(
    "e_dwell_time",
    oracle="""
    WITH gaps AS (
      SELECT epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT gap_us // 600000000 AS bucket_10min,
           COUNT(*) AS n_gaps,
           CAST(SUM(gap_us) AS BIGINT) AS total_gap_us
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY 1
    """,
)
def e_dwell_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival (dwell) time distribution: per-user consecutive-event
    gaps in exact integer microseconds, bucketed into 10-minute bins.
    All-integer pipeline (epoch_us -> LAG -> floor-div), so nothing to
    disagree on between engines. One shuffle on user_id for the lag; the
    bucket agg has map-side partials and a handful of groups. The catalog's
    nanos->micros floor (catalog.py:load_table) keeps epoch_us identical on
    both engines."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gaps = events.select(
        (us - F.lag(us).over(w)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return (
        gaps.withColumn("bucket_10min", F.expr("gap_us div 600000000"))
        .groupBy("bucket_10min")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("gap_us").cast("bigint").alias("total_gap_us"),
        )
    )


@register(
    "e_zscore_anomaly",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             COUNT(value) AS n_events,
             SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS s1,
             SUM(CAST(ROUND(value * value * 1e6) AS BIGINT)) AS s2
      FROM events
      GROUP BY event_type
    ), thr AS (
      SELECT event_type, n_events,
             CAST(ROUND((((CAST(s1 AS DOUBLE) / 1e6) / n_events)
                         + 2 * SQRT(GREATEST(CASE WHEN n_events > 1 THEN
                                    (((CAST(s2 AS DOUBLE) / 1e6) / n_events)
                                     - ((CAST(s1 AS DOUBLE) / 1e6) / n_events)
                                       * ((CAST(s1 AS DOUBLE) / 1e6) / n_events))
                                    * n_events / (n_events - 1)
                                    ELSE 0.0 END, 0.0))) * 1e6)
                  AS BIGINT) AS thr_micro
      FROM stats
    )
    SELECT e.event_type, t.n_events,
           COUNT(*) FILTER (
             WHERE CAST(ROUND(e.value * 1e6) AS BIGINT) > t.thr_micro)
             AS n_anomalies,
           t.thr_micro
    FROM events e JOIN thr t ON e.event_type = t.event_type
    GROUP BY e.event_type, t.n_events, t.thr_micro
    """,
)
def e_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score anomaly counts (value > mean + 2*stddev).
    Mean/variance come from exact scaled-long sums (n, sum, sum-of-squares
    — the one-pass moment kernel), so the derived threshold is a chain of
    identical IEEE double ops on both engines; the comparison itself is
    micro-scaled integers, so no float compare sits on the gated path.
    Shape: one 5-row stats aggregate broadcast back onto the fact scan —
    two scans, zero wide shuffles of raw events; at 100 TB the stats agg
    is map-side-combined and the join side is trivially broadcast."""
    events = load_table(spark, sf_dir, "events")
    stats = events.groupBy("event_type").agg(
        F.count("value").alias("n_events"),
        F.sum(F.round(F.col("value") * F.lit(1e6)).cast("long")).alias("s1"),
        F.sum(
            F.round(F.col("value") * F.col("value") * F.lit(1e6)).cast("long")
        ).alias("s2"),
    )
    n = F.col("n_events")
    mean = (F.col("s1").cast("double") / F.lit(1e6)) / n
    ex2 = (F.col("s2").cast("double") / F.lit(1e6)) / n
    # Clamp at 0: the rounded-moment variance estimate can dip epsilon-
    # negative for a near-constant group, where Spark sqrt gives NaN but
    # DuckDB sqrt RAISES — a gate crash, not just a mismatch. And guard the
    # ddof=1 divisor: a single-row group gives 0/0, which Spark's Divide
    # returns as NULL but DuckDB evaluates as nan — mirrored CASE in the
    # oracle (same pattern as e_ab_test's pooled-proportion guard).
    var = F.when(
        n > F.lit(1), (ex2 - mean * mean) * n / (n - F.lit(1))
    ).otherwise(F.lit(0.0))
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    thr = stats.select(
        "event_type",
        "n_events",
        F.round((mean + F.lit(2) * std) * F.lit(1e6))
        .cast("bigint")
        .alias("thr_micro"),
    )
    flagged = events.join(F.broadcast(thr), "event_type")
    return flagged.groupBy("event_type", "n_events", "thr_micro").agg(
        F.count_if(
            F.round(F.col("value") * F.lit(1e6)).cast("bigint")
            > F.col("thr_micro")
        ).alias("n_anomalies")
    ).select("event_type", "n_events", "n_anomalies", "thr_micro")


# ---------------------------------------------------------------------------
# Snapshot diff
# ---------------------------------------------------------------------------

_SNAPSHOT_ORACLE = """
    WITH v1 AS (
      SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), v2 AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 10 = 0
                  THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) + 5000
                  ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT) END AS cents
      FROM orders WHERE o_orderkey % 10 <> 3
      UNION ALL
      SELECT -o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT)
      FROM orders WHERE o_orderkey % 10 = 1
    ), diff AS (
      SELECT CASE WHEN v1.o_orderkey IS NULL THEN 'added'
                  WHEN v2.o_orderkey IS NULL THEN 'removed'
                  WHEN v1.cents <> v2.cents THEN 'changed'
                  ELSE 'unchanged' END AS status,
             CASE WHEN v1.o_orderkey IS NULL THEN v2.cents
                  WHEN v2.o_orderkey IS NULL THEN -v1.cents
                  ELSE v2.cents - v1.cents END AS delta_cents
      FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
    )
    SELECT status, COUNT(*) AS n_keys,
           CAST(SUM(delta_cents) AS BIGINT) AS delta_cents
    FROM diff
    GROUP BY status
    """


@register("a_snapshot_diff", oracle=_SNAPSHOT_ORACLE)
def a_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (table-format time travel / audit primitive): two
    versions of the orders table — v2 synthetically drops keys %10==3,
    reprices keys %10==0 by +$50, and inserts negative-key clones of
    %10==1 — full-outer-joined on the key and classified into
    added/removed/changed/unchanged with exact integer cent deltas.
    The join shuffles both sides on the key once (sort-merge — at 100 TB
    both snapshots are facts, neither broadcastable) and the 4-group
    summary agg is map-side-combined. Cents are exact scaled longs, so
    change detection never compares floats."""
    orders = load_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    v1 = orders.select(key.alias("k1"), cents.alias("cents1"))
    v2 = (
        orders.filter(key % 10 != 3)
        .select(
            key.alias("k2"),
            F.when(key % 10 == 0, cents + F.lit(5000))
            .otherwise(cents)
            .alias("cents2"),
        )
        .unionByName(
            orders.filter(key % 10 == 1).select(
                (-key).alias("k2"), cents.alias("cents2")
            )
        )
    )
    diff = v1.join(v2, v1["k1"] == v2["k2"], "full_outer").select(
        F.when(F.col("k1").isNull(), F.lit("added"))
        .when(F.col("k2").isNull(), F.lit("removed"))
        .when(F.col("cents1") != F.col("cents2"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
        F.when(F.col("k1").isNull(), F.col("cents2"))
        .when(F.col("k2").isNull(), -F.col("cents1"))
        .otherwise(F.col("cents2") - F.col("cents1"))
        .alias("delta_cents"),
    )
    return diff.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("delta_cents").cast("bigint").alias("delta_cents"),
    )


# ---------------------------------------------------------------------------
# Equi-depth histogram
# ---------------------------------------------------------------------------

_CUTS = [i / 10.0 for i in range(1, 10)]
_SQL_CUTS = ", ".join(
    f"QUANTILE_CONT(l_extendedprice, {p}) AS c{i}"
    for i, p in enumerate(_CUTS, start=1)
)
_SQL_DECILE = " + ".join(
    f"CAST(l_extendedprice > c{i} AS BIGINT)" for i in range(1, 10)
)


@register(
    "a_equidepth_histogram",
    oracle=f"""
    WITH cuts AS (SELECT {_SQL_CUTS} FROM lineitem)
    SELECT 1 + {_SQL_DECILE} AS decile,
           COUNT(*) AS n_rows,
           {sql_dsum('l_extendedprice')} AS sum_price,
           MIN(l_extendedprice) AS lo_seen,
           MAX(l_extendedprice) AS hi_seen
    FROM lineitem CROSS JOIN cuts
    GROUP BY 1
    """,
)
def a_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram of a numeric column: 9 exact
    interpolated decile cut points from a single-row pre-aggregate,
    broadcast back onto the scan, rows binned by counting cuts strictly
    below the value (ties land in the lower bin on both engines — integer
    bool sums, no float binning arithmetic beyond the shared cut values).
    This is the optimizer-statistics / data-skew primitive fixed-width
    histograms (p_histogram) can't provide on skewed columns. Scale: the
    exact percentile pre-agg is the documented small-data mode; swap the
    cut computation for operators/percentiles.py's GK sketch at 100 TB —
    the binning pass is unchanged (broadcast + map-side-combined agg)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("x")
    )
    price = F.col("x").cast("double")
    # ONE array-percentile aggregate: nine separate F.percentile exprs
    # each buffer the whole column (9x the memory — OOMed a 1g-driver
    # session at sf0.1); the array form holds the values once.
    cuts = li.agg(
        F.percentile(price, F.array(*[F.lit(p) for p in _CUTS])).alias("cs")
    ).select(*[F.col("cs")[i].alias(f"c{i + 1}") for i in range(len(_CUTS))])
    decile = F.lit(1)
    for i in range(1, 10):
        decile = decile + (F.col("x") > F.col(f"c{i}")).cast("bigint")
    return (
        li.crossJoin(F.broadcast(cuts))
        .groupBy(decile.alias("decile"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("x").alias("sum_price"),
            F.min("x").alias("lo_seen"),
            F.max("x").alias("hi_seen"),
        )
    )


# ---------------------------------------------------------------------------
# Quality-weighted sampling
# ---------------------------------------------------------------------------

_SQL_NTOK = r"len(string_split_regex(trim(lower(text)), '\s+'))"


@register(
    "t_weighted_sample",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE CAST({_SQL_NTOK} AS BIGINT) END AS ntok,
             LEAST(1000000,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE CAST({_SQL_NTOK} AS BIGINT) END * 12500)
               AS weight_micro
      FROM documents
    )
    SELECT doc_id, source, ntok, weight_micro
    FROM scored
    WHERE ({sql_hash_bucket(['doc_id'], seed='wsample-v1')}) < weight_micro
    """,
)
def t_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic sampling: keep each document with
    probability proportional to its token count (capped at 1.0), decided
    by the md5 hash bucket of its id — the reproducible version of
    ``rand() < weight`` used to upsample long documents into a training
    mix. The weight is ALL-integer (ntok * 12500 capped at 1e6), so the
    keep decision never touches a float. Embarrassingly parallel: pure
    filter, no shuffle, layout-invariant across partitionings — the same
    docs survive on 1 executor or 1000."""
    docs = load_table(spark, sf_dir, "documents")
    ntok = token_count(F.col("text")).cast("bigint")
    weight = F.least(F.lit(1000000).cast("bigint"), ntok * F.lit(12500))
    return (
        docs.select(
            "doc_id",
            "source",
            ntok.alias("ntok"),
            weight.alias("weight_micro"),
        )
        .filter(hash_bucket_expr(["doc_id"], seed="wsample-v1") < F.col("weight_micro"))
    )


# ---------------------------------------------------------------------------
# Embedding-norm distribution
# ---------------------------------------------------------------------------


@register(
    "v_norm_stats",
    oracle=f"""
    WITH norms AS (
      SELECT label, {sql_dot_scaled('embedding', 'embedding')} AS norm_sq
      FROM embeddings
    )
    SELECT label,
           COUNT(*) AS n_vecs,
           {sql_dsum('norm_sq')} AS total_normsq,
           MIN(CAST(ROUND(norm_sq * 1e6) AS BIGINT)) AS min_normsq_micro,
           MAX(CAST(ROUND(norm_sq * 1e6) AS BIGINT)) AS max_normsq_micro
    FROM norms
    GROUP BY label
    """,
)
def v_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding L2-norm-squared distribution — the sanity check
    run before cosine-based dedup/ANN (unnormalized or zero vectors break
    cosine geometry). Norms are deterministic scaled-long dot products
    (functions/vectors.py), aggregated with exact scaled sums; min/max are
    micro-scaled integers. Single map-side-combined aggregate, no join,
    no shuffle beyond the |labels|-group agg."""
    emb = load_table(spark, sf_dir, "embeddings")
    norm_sq = norm_sq_scaled(F.col("embedding"))
    norms = emb.select("label", norm_sq.alias("norm_sq"))
    return norms.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        dsum("norm_sq").alias("total_normsq"),
        F.min(F.round(F.col("norm_sq") * F.lit(1e6)).cast("bigint")).alias(
            "min_normsq_micro"
        ),
        F.max(F.round(F.col("norm_sq") * F.lit(1e6)).cast("bigint")).alias(
            "max_normsq_micro"
        ),
    )
