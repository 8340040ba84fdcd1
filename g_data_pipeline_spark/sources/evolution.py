"""Schema evolution at the landing zone: drift detection + a safe
append/read contract.

A long-lived ingest path WILL see upstream schema changes (new telemetry
fields, dropped columns, a int→long widening). The reference ingests a
single CSV per upload and re-infers per file (``src/services/data.rs``)
— no cross-batch contract at all. At 100 TB the contract is the point:
an additive change must not break readers of old files, and a silent
type change must not corrupt a column (parquet readers error or, worse,
unions coerce).

Policy implemented here (the common lakehouse default):

- ADDED columns: allowed. New files carry them; old files read as NULL
  under ``mergeSchema`` — the append is backward-compatible.
- REMOVED columns: allowed for the writer (new files simply lack them;
  they read as NULL for new rows), but reported — usually a bug upstream.
- TYPE CHANGES: rejected by default. Parquet files with conflicting
  physical types for one column make the dataset unreadable with
  ``mergeSchema`` (Spark raises on merge failure) — the batch must be
  cast at the edge instead (``reconcile_batch`` does the safe cast when
  the change is a widening).

``spark.read.parquet`` does NOT merge schemas by default (it samples one
footer); :func:`read_evolved` pins the ``mergeSchema`` read so the union
schema is always visible. Column pruning/pushdown still work — merged
schema resolution happens at planning, the scan remains columnar.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class SchemaDriftError(ValueError):
    pass


@dataclass(frozen=True)
class SchemaDrift:
    added: list[str] = field(default_factory=list)
    removed: list[str] = field(default_factory=list)
    changed: list[tuple[str, str, str]] = field(default_factory=list)

    @property
    def is_compatible(self) -> bool:
        return not self.changed


# widenings that are safe to cast at the edge (no information loss);
# names are DataType.simpleString() forms
_WIDENINGS = {
    ("tinyint", "smallint"),
    ("tinyint", "int"),
    ("smallint", "int"),
    ("int", "bigint"),
    ("tinyint", "bigint"),
    ("smallint", "bigint"),
    ("float", "double"),
    ("int", "double"),
    ("bigint", "double"),
    ("date", "timestamp"),
}


def schema_drift(base: T.StructType, new: T.StructType) -> SchemaDrift:
    b = {f.name: f.dataType.simpleString() for f in base.fields}
    n = {f.name: f.dataType.simpleString() for f in new.fields}
    return SchemaDrift(
        added=sorted(set(n) - set(b)),
        removed=sorted(set(b) - set(n)),
        changed=sorted(
            (c, b[c], n[c]) for c in set(b) & set(n) if b[c] != n[c]
        ),
    )


def reconcile_batch(batch: DataFrame, base: T.StructType) -> DataFrame:
    """Cast the batch's type drifts back to the base types where the
    BATCH side is the narrower (or equal-width) one — i.e. upstream
    narrowed or re-inferred a column; widening the values to the landed
    type is lossless. Raises ``SchemaDriftError`` for any change that is
    not such a widening (the landed files cannot be rewritten)."""
    drift = schema_drift(base, batch.schema)
    bad = [
        (c, old, new)
        for c, old, new in drift.changed
        if (new, old) not in _WIDENINGS
    ]
    if bad:
        raise SchemaDriftError(
            f"incompatible type changes (column, landed, batch): {bad}; "
            "cast at the source or land to a new dataset version"
        )
    out = batch
    landed = {f.name: f.dataType for f in base.fields}
    for c, _old, _new in drift.changed:
        out = out.withColumn(c, F.col(c).cast(landed[c]))
    return out


def land_evolving(batch: DataFrame, path: str, base: T.StructType | None) -> None:
    """Append a batch under the evolution policy: reconcile type drift
    against the landed schema (when one exists), then append. Added /
    removed columns flow through as-is — ``read_evolved`` surfaces the
    union schema."""
    if base is not None:
        batch = reconcile_batch(batch, base)
    batch.write.mode("append").parquet(path)


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read the landing dataset with the UNION schema across all landed
    files (files missing a column yield NULL for it)."""
    return spark.read.option("mergeSchema", "true").parquet(path)
