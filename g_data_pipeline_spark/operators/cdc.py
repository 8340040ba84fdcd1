"""Change-data-capture operators: latest-wins MERGE (upsert/delete apply)
and SCD type-2 history construction.

The reference has no mutation surface at all (its tables are immutable CSV
uploads — SURVEY.md §1.2), but any lakehouse pipeline that re-lands data
needs MERGE semantics; these are the engine-level primitives behind Delta
``MERGE INTO`` / Iceberg upsert, expressed as pure DataFrame ops.

Scale model (100 TB):
- ``merge_latest``: union(base, changes) then ONE shuffle keyed on the
  merge key; the per-key latest-wins rank is a ``row_number`` over
  (seq desc) that Spark prunes with WindowGroupLimit (top-1 per key is
  computed map-side before the shuffle, so the shuffle carries at most one
  candidate row per key per map partition — no per-key history blowup).
  AQE handles key skew; no broadcast needed on either side.
- ``scd2_history``: change capture + interval construction are windows
  over the SAME (key, ordered-by-ts) partitioning, so the whole operator
  costs ONE shuffle; Spark chains the lag/lead/row_number into a single
  Window node over one sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_latest(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    seq_col: str = "change_seq",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a CDC change set onto a base snapshot, latest-wins per key.

    ``base`` rows are treated as sequence 0 upserts; ``changes`` carries
    (key, payload..., seq_col, op_col) with op in {'U','I','D'} (insert and
    update are both "make the row look like this"; delete_op removes the
    key). The row with the highest ``seq_col`` per key wins; a winning
    delete drops the key from the output. Payload columns are taken from
    ``base``'s schema minus the key (changes must carry the same columns).

    Deterministic: (seq desc, op desc) ordering ranks 'U' > 'I' > 'D' at
    exact seq ties -> documented as "upsert beats delete at equal
    sequence"; real CDC feeds have unique sequence numbers per key.
    """
    payload = [c for c in base.columns if c != key]
    base_tagged = base.select(
        key,
        *payload,
        F.lit(0).cast("long").alias(seq_col),
        F.lit("U").alias(op_col),
    )
    changes_tagged = changes.select(key, *payload, seq_col, op_col)
    unioned = base_tagged.unionByName(changes_tagged)
    w = Window.partitionBy(key).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc()
    )
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(op_col) != delete_op))
        .select(key, *payload)
    )


def scd2_history(
    df: DataFrame,
    key: str,
    ts_col: str,
    attr_col: str,
    tie_col: str | None = None,
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 history from an event log.

    For each ``key``, consecutive events with the same ``attr_col`` value
    collapse into one version row; output columns are (key, attr, valid_from,
    valid_to, version_no, is_current) where valid_to is the next version's
    valid_from (null = current version). ``tie_col`` (e.g. an event id)
    makes ordering total when timestamps can collide.

    One shuffle: change-capture lag, interval lead, and version numbering
    all share the (key) partitioning / (ts, tie) ordering.
    """
    order: list[Column] = [F.col(ts_col).asc()]
    if tie_col is not None:
        order.append(F.col(tie_col).asc())
    w = Window.partitionBy(key).orderBy(*order)

    changed = F.coalesce(
        F.col(attr_col) != F.lag(attr_col).over(w), F.lit(True)
    )
    starts = df.withColumn("__chg", changed).filter(F.col("__chg"))

    w2_order: list[Column] = [F.col(ts_col).asc()]
    if tie_col is not None:
        w2_order.append(F.col(tie_col).asc())
    w2 = Window.partitionBy(key).orderBy(*w2_order)
    return starts.select(
        key,
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("long").alias("version_no"),
        F.lead(ts_col).over(w2).isNull().cast("long").alias("is_current"),
    )
