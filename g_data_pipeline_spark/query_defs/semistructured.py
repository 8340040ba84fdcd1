"""Round-7 extended event-payload wave, oracle-gated:

- e_variant_shred: a deterministic nested JSON payload is planted per
  event ON BOTH ENGINES (the d_url_dedup recipe pattern), shredded
  through Spark's native VARIANT type (functions/variant.py), and
  compared against DuckDB's JSON path extraction — proving parse_json ->
  try_variant_get typed extraction end-to-end, nested objects and array
  indexing included.
- e_conversation_stats: the SFT-curation conversation report
  (operators/conversations.py) — gap-sessionized multi-turn assembly
  with structure stats and the transcript dedup fingerprint, vs DuckDB's
  gaps-and-islands + ordered string_agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.queries import register

# Planted nested payload: object nesting, an array index, and an integer
# leaf — every VARIANT access mode the shredder uses. Same literal
# recipe on both engines.
_SQL_JSON = (
    "'{\"meta\": {\"tier\": \"t' || CAST(user_id % 3 AS VARCHAR)"
    " || '\", \"flags\": [' || CAST(event_id % 2 AS VARCHAR)"
    " || ', 7]}, \"k\": ' || CAST(event_id % 97 AS VARCHAR) || '}'"
)


def _spark_json() -> F.Column:
    return F.concat(
        F.lit('{"meta": {"tier": "t'),
        (F.col("user_id") % 3).cast("string"),
        F.lit('", "flags": ['),
        (F.col("event_id") % 2).cast("string"),
        F.lit(", 7]}, \"k\": "),
        (F.col("event_id") % 97).cast("string"),
        F.lit("}"),
    )


@register(
    "e_variant_shred",
    oracle=rf"""
    WITH j AS (
      SELECT event_type, {_SQL_JSON} AS payload FROM events
    )
    SELECT event_type,
           json_extract_string(payload, '$.meta.tier') AS tier,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(json_extract(payload, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(SUM(CAST(json_extract(payload, '$.meta.flags[0]')
                         AS BIGINT)) AS BIGINT) AS sum_flag0,
           CAST(COUNT(*) FILTER (WHERE json_extract(payload, '$.missing')
                                 IS NULL) AS BIGINT) AS n_missing
    FROM j GROUP BY event_type, tier
    """,
)
def e_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT shredding gate: the planted nested JSON payload is parsed
    ONCE to Spark's binary VARIANT (parse_json), hot paths are extracted
    typed (try_variant_get: nested object string, array index, integer
    leaf, plus a deliberately-missing path that must come back NULL on
    every row), and the shredded columns aggregate per (event_type,
    tier). DuckDB answers with its JSON path functions over the same
    planted payload. All extraction is JVM VariantGet codegen — zero
    Python nodes, zero extra shuffles beyond the one keyed aggregate;
    at scale the parse+shred is scan-stage work and the variant residual
    (functions/variant.shred_variant) keeps drifted fields queryable
    without re-ingesting."""
    from g_data_pipeline_spark.functions.variant import shred_variant

    events = load_table(spark, sf_dir, "events")
    shredded = shred_variant(
        events.select("event_type", _spark_json().alias("payload")),
        "payload",
        {
            "tier": ("$.meta.tier", "string"),
            "k": ("$.k", "bigint"),
            "flag0": ("$.meta.flags[0]", "bigint"),
            "missing": ("$.missing", "bigint"),
        },
        keep_residual=False,
    )
    return shredded.groupBy("event_type", "tier").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").cast("long").alias("sum_k"),
        F.sum("flag0").cast("long").alias("sum_flag0"),
        F.count_if(F.col("missing").isNull()).alias("n_missing"),
    )


# ---------------------------------------------------------------------------
# e_conversation_stats: SFT conversation curation report
# ---------------------------------------------------------------------------

_CONV_GAP_US = 30 * 60 * 1_000_000  # operators/conversations.py default


@register(
    "e_conversation_stats",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_id, epoch_us(ts) AS us, event_type, props,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), marked AS (
      SELECT user_id, event_id, us, event_type, props,
             CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > {_CONV_GAP_US}
                           THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conv_idx
      FROM seq
    ), turns AS (
      SELECT user_id, conv_idx, us, event_id, event_type, props,
             CASE WHEN event_type = LAG(event_type)
                    OVER (PARTITION BY user_id, conv_idx
                          ORDER BY us, event_id)
                  THEN 1 ELSE 0 END AS same_role
      FROM marked
    )
    SELECT user_id AS user, conv_idx,
           CAST(COUNT(*) AS BIGINT) AS n_turns,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_roles,
           CAST((MAX(us) - MIN(us)) // 1000 AS BIGINT) AS duration_ms,
           CAST(SUM(same_role) AS BIGINT) AS alternation_breaks,
           md5(string_agg(event_type || ':' || COALESCE(props, ''), chr(10)
                          ORDER BY us, event_id)) AS transcript_fp
    FROM turns GROUP BY user_id, conv_idx
    """,
)
def e_conversation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation-level SFT curation report
    (operators/conversations.conversation_report) over the event stream
    read as chat turns (role = event_type, content = props, 30-min gap):
    per conversation — turn count, distinct roles, exact duration_ms,
    alternation breaks (consecutive same-role turns = malformed SFT
    data), and the md5 transcript fingerprint that keys conversation
    dedup. DuckDB reproduces it with gaps-and-islands + ordered
    string_agg; the fingerprint matching byte-for-byte proves turn
    ORDERING (ts, then event_id on ties) is engine-identical. One
    user-keyed shuffle end-to-end: sessionization windows, the
    within-conversation lag, and the final aggregate all share the user
    partition (+ the rollup's own exchange); duration floors via
    subtract-pmod on nonnegative operands (== DuckDB's truncating //).
    """
    from g_data_pipeline_spark.operators.conversations import (
        conversation_report,
    )

    events = load_table(spark, sf_dir, "events")
    return conversation_report(
        events,
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "props",
        gap_us=_CONV_GAP_US,
    )
