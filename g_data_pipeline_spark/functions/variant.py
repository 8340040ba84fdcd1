"""Semi-structured column handling on Spark 4's native VARIANT type —
the engine-level path for JSON-ish event/crawl payloads (parse once into
a binary-encoded variant, extract typed paths with JVM expressions) as
opposed to per-query string regexes or rigid from_json schemas.

Why VARIANT and not from_json: a crawl/event feed's payload schema
drifts per producer; from_json needs the schema up front and silently
nulls everything on drift, while VARIANT keeps every field queryable
(`variant_get` any path later) at ~Parquet-binary access speed, and
`schema_of_variant` makes the drift itself measurable. All expressions
here are JVM-side (VariantGet / SchemaOfVariant codegen) — zero Python
UDFs, scan-stage work.

Reference has no semi-structured surface (its Rust service stores JSON
rows as opaque strings) — this is extension surface; the gated twin is
query_defs/semistructured.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def variant_extract(
    v: Column, paths: dict[str, tuple[str, str]], strict: bool = False
) -> dict[str, Column]:
    """Typed path extraction from a VARIANT column: ``paths`` maps output
    name -> (variant path like ``$.meta.tier`` or ``$.flags[0]``, Spark
    type). Non-strict (default) uses ``try_variant_get`` — missing paths
    and cast misfits become NULL (the right behavior for drifting
    feeds); strict uses ``variant_get``, which raises on a cast misfit
    (the right behavior for a contract-checked landing zone)."""
    get = F.variant_get if strict else F.try_variant_get
    return {name: get(v, path, typ) for name, (path, typ) in paths.items()}


def shred_variant(
    df: DataFrame,
    json_col: str,
    paths: dict[str, tuple[str, str]],
    keep_residual: bool = True,
    strict: bool = False,
) -> DataFrame:
    """Shred a JSON-string column into typed top-level columns (the
    stable, hot paths) plus — by default — the full parsed VARIANT as
    ``<json_col>_variant`` so cold/late-arriving fields stay queryable
    without re-ingesting. The Parquet-writer analogue of Delta/Iceberg
    variant shredding: downstream filters and aggregates on the shredded
    columns get pushdown + codegen, the residual keeps schema freedom.
    Zero-shuffle scan-stage expressions."""
    v = F.parse_json(F.col(json_col))
    cols = [df["*"]] + [
        c.alias(name)
        for name, c in variant_extract(v, paths, strict=strict).items()
    ]
    if keep_residual:
        cols.append(v.alias(f"{json_col}_variant"))
    return df.select(*cols)


def variant_schema_profile(df: DataFrame, json_col: str) -> DataFrame:
    """Schema-drift report for a semi-structured column: parse every row
    to VARIANT, derive its exact structural type with
    ``schema_of_variant``, and roll up ``(variant_schema, n_rows,
    share_micro)`` ordered by frequency. One map-side-combined aggregate;
    a single dominant schema row means the column is ready to shred
    (:func:`shred_variant`), a long tail quantifies producer drift.
    ``share_micro`` floors (x * 1e6 // total) — exact integer."""
    sch = df.select(
        F.schema_of_variant(F.parse_json(F.col(json_col))).alias(
            "variant_schema"
        )
    )
    per = sch.groupBy("variant_schema").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    total = per.agg(F.sum("n_rows").alias("__t"))
    n = F.col("n_rows") * F.lit(1_000_000)
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "variant_schema",
            "n_rows",
            ((n - F.pmod(n, F.col("__t"))) / F.col("__t"))
            .cast("long")
            .alias("share_micro"),
        )
        .orderBy(F.desc("n_rows"), "variant_schema")
    )
