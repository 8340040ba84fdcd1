"""Analytics wave 8 (round 4, wave 4): declarative data-quality
expectations (Deequ-shaped rule report), blocked record linkage / entity
resolution, and gap-based sessionization with session-id assignment.

None of these exist in the reference (rows are trusted as parsed, no
multi-row semantics — SURVEY.md §2.1); they are the validation / identity /
behavioral layers a production pipeline adds on top of that surface.

Determinism: all three queries output integers only (counts, ids, edit
distances, exact cent/microsecond deltas) — nothing float sits on the
gated path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.operators.expectations import (
    expectations_report,
    foreign_key_report,
    in_range,
    in_set,
    matches,
    not_null,
    row_level_report,
    unique_report,
)
from g_data_pipeline_spark.operators.linkage import link_customers_demo
from g_data_pipeline_spark.queries import register

# ---------------------------------------------------------------------------
# Data-quality expectations
# ---------------------------------------------------------------------------
#
# The checks run over a deliberately-dirtied union of the orders snapshot
# (clean data would make every count 0): synthetic violations are cloned
# from deterministic key slices with NEGATIVE keys -(k+1), collision-free
# against the non-negative base keys at any scale factor (the round-3
# advice on planted-id offsets).

_DIRTY_ORACLE = """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    UNION ALL
    SELECT -(o_orderkey + 1), NULL, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders WHERE o_orderkey % 100 = 1
    UNION ALL
    SELECT -(o_orderkey + 1), o_custkey, o_orderstatus, -5.0, o_orderpriority
    FROM orders WHERE o_orderkey % 100 = 2
    UNION ALL
    SELECT -(o_orderkey + 1), o_custkey, 'X', o_totalprice, '9-BOGUS priority'
    FROM orders WHERE o_orderkey % 100 = 3
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders WHERE o_orderkey % 100 = 4
    UNION ALL
    SELECT -(o_orderkey + 1), -999, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders WHERE o_orderkey % 100 = 5
"""


def _dirty_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority",
    )
    k = F.col("o_orderkey")
    neg = (-(k + 1)).alias("o_orderkey")
    null_cust = base.filter(k % 100 == 1).select(
        neg,
        F.lit(None).cast("long").alias("o_custkey"),
        "o_orderstatus", "o_totalprice", "o_orderpriority",
    )
    bad_price = base.filter(k % 100 == 2).select(
        neg, "o_custkey", "o_orderstatus",
        F.lit(-5.0).alias("o_totalprice"), "o_orderpriority",
    )
    bad_status = base.filter(k % 100 == 3).select(
        neg, "o_custkey",
        F.lit("X").alias("o_orderstatus"), "o_totalprice",
        F.lit("9-BOGUS priority").alias("o_orderpriority"),
    )
    dup_key = base.filter(k % 100 == 4)
    orphan = base.filter(k % 100 == 5).select(
        neg,
        F.lit(-999).cast("long").alias("o_custkey"),
        "o_orderstatus", "o_totalprice", "o_orderpriority",
    )
    out = base
    for extra in (null_cust, bad_price, bad_status, dup_key, orphan):
        out = out.unionByName(extra)
    return out


@register(
    "a_expectations_report",
    oracle=f"""
    WITH dirty AS ({_DIRTY_ORACLE})
    SELECT 'not_null(o_custkey)' AS rule,
           COUNT(*) AS n_checked,
           COUNT(*) FILTER (WHERE o_custkey IS NULL) AS n_violations
    FROM dirty
    UNION ALL
    SELECT 'in_range(o_totalprice,0.0,600000.0)', COUNT(*),
           COUNT(*) FILTER (WHERE o_totalprice IS NOT NULL
                            AND (o_totalprice < 0.0 OR o_totalprice > 600000.0))
    FROM dirty
    UNION ALL
    SELECT 'in_set(o_orderstatus)', COUNT(*),
           COUNT(*) FILTER (WHERE o_orderstatus IS NOT NULL
                            AND o_orderstatus NOT IN ('O', 'F', 'P'))
    FROM dirty
    UNION ALL
    SELECT 'priority_format(o_orderpriority)', COUNT(*),
           COUNT(*) FILTER (WHERE o_orderpriority IS NOT NULL
                            AND NOT regexp_matches(o_orderpriority,
                                                   '^[1-5]-[A-Z ]+$'))
    FROM dirty
    UNION ALL
    SELECT 'unique(o_orderkey)', COUNT(*),
           COUNT(*) - COUNT(DISTINCT o_orderkey)
    FROM dirty
    UNION ALL
    SELECT 'fk(o_custkey->c_custkey)', COUNT(*),
           COUNT(*) FILTER (WHERE o_custkey IS NULL OR NOT EXISTS (
             SELECT 1 FROM customer c WHERE c.c_custkey = dirty.o_custkey))
    FROM dirty
    """,
)
def a_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (operators/expectations.py) over a
    deliberately-dirtied orders snapshot: four row-level rules fused into
    ONE aggregate scan (conditional counts, map-side combined), key
    uniqueness as a keyed aggregate, referential integrity as a left-anti
    join against the customer dimension (broadcast under stats, shuffle
    otherwise). Three passes total regardless of rule count — the shape a
    100 TB pre-flight validation needs. Output: (rule, n_checked,
    n_violations), all integers."""
    dirty = _dirty_orders(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer")
    rules = [
        not_null("o_custkey"),
        in_range("o_totalprice", 0.0, 600000.0),
        in_set("o_orderstatus", ["O", "F", "P"]),
        matches(
            "o_orderpriority",
            "^[1-5]-[A-Z ]+$",
            label="priority_format(o_orderpriority)",
        ),
    ]
    return expectations_report(
        [
            row_level_report(dirty, rules),
            unique_report(dirty, ["o_orderkey"]),
            foreign_key_report(dirty, "o_custkey", customer, "c_custkey"),
        ]
    )


# ---------------------------------------------------------------------------
# Record linkage
# ---------------------------------------------------------------------------

_LINKAGE_ORACLE = """
    WITH dirty AS (
      SELECT c_custkey, c_name, c_nationkey,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
      FROM customer
      UNION ALL
      SELECT -(c_custkey + 1),
             replace(c_name, 'Customer#', 'Custmer#'),
             c_nationkey,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) + 37
      FROM customer WHERE c_custkey % 7 = 0
    ), prepped AS (
      SELECT c_custkey AS id, c_name, c_nationkey, bal_cents,
             right(c_name, 3) AS name_sfx
      FROM dirty
    )
    SELECT a.id AS id_a, b.id AS id_b,
           levenshtein(a.c_name, b.c_name) AS name_lev,
           abs(a.bal_cents - b.bal_cents) AS cents_diff
    FROM prepped a JOIN prepped b
      ON a.c_nationkey = b.c_nationkey AND a.name_sfx = b.name_sfx
     AND a.id < b.id
    WHERE levenshtein(a.c_name, b.c_name) <= 2
      AND abs(a.bal_cents - b.bal_cents) <= 100
    """


@register("a_record_linkage", oracle=_LINKAGE_ORACLE)
def a_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage / entity resolution (operators/linkage.py) over a
    customer table with planted dirty duplicates (negative-key clones with
    a 1-edit name typo and a 37-cent balance drift): candidates come from
    an equi-join on the blocking key (nationkey, last-3-of-name) — never
    all-pairs — and match when name edit distance <= 2 AND balance delta
    <= 100 cents. Candidate volume is sum of squared block sizes, the same
    sub-quadratic contract as the LSH band joins; Levenshtein runs JVM-side
    inside codegen. Outputs exact integers only."""
    customer = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    base = customer.select(
        "c_custkey", "c_name", "c_nationkey", cents.alias("bal_cents")
    )
    clones = customer.filter(F.col("c_custkey") % 7 == 0).select(
        (-(F.col("c_custkey") + 1)).alias("c_custkey"),
        F.regexp_replace("c_name", "Customer#", "Custmer#").alias("c_name"),
        "c_nationkey",
        (cents + F.lit(37)).alias("bal_cents"),
    )
    dirty = base.unionByName(clones).withColumn(
        "name_sfx", F.col("c_name").substr(-3, 3)
    )
    return link_customers_demo(dirty, max_lev=2, max_cents=100)


# ---------------------------------------------------------------------------
# Sessionization with session-id assignment
# ---------------------------------------------------------------------------

_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


@register(
    "e_sessionize",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), marked AS (
      SELECT user_id, us,
             CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > {_SESSION_GAP_US}
                           THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
      FROM seq
    )
    SELECT user_id, session_idx,
           COUNT(*) AS n_events,
           CAST(MAX(us) - MIN(us) AS BIGINT) AS duration_us
    FROM marked
    GROUP BY user_id, session_idx
    """,
)
def e_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization that ASSIGNS session ids (the companion to
    e_session_windows' aggregate form, needed when downstream ops join on
    the session): a 30-minute inactivity gap starts a new session; the id
    is the running count of session starts per user. All-integer
    microsecond pipeline. Both windows and the per-session aggregate share
    the user_id partitioning, so the whole query is ONE shuffle — Catalyst
    reuses the exchange (plan-pinned)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    seq = events.select(
        "user_id",
        "event_id",
        us.alias("us"),
        (us - F.lag(us).over(w)).alias("gap_us"),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = seq.select(
        "user_id",
        "us",
        F.sum(
            F.when(
                F.col("gap_us").isNull()
                | (F.col("gap_us") > F.lit(_SESSION_GAP_US)),
                F.lit(1),
            ).otherwise(F.lit(0))
        )
        .over(wrun)
        .alias("session_idx"),
    )
    return marked.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("us") - F.min("us")).cast("bigint").alias("duration_us"),
    )
