"""Schema-evolution landing contract (sources/evolution.py): additive
changes stay readable, widenings reconcile, incompatible changes are
rejected BEFORE they poison the dataset, and the merged read still
prunes columns."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from g_data_pipeline_spark.sources.evolution import (
    SchemaDriftError,
    land_evolving,
    read_evolved,
    reconcile_batch,
    schema_drift,
)


def _b1(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id long, name string, v int"
    )


def test_drift_report(spark):
    b1 = _b1(spark)
    b2 = spark.createDataFrame(
        [(3, 3.5, "x")], "id long, v double, extra string"
    )
    d = schema_drift(b1.schema, b2.schema)
    assert d.added == ["extra"]
    assert d.removed == ["name"]
    assert d.changed == [("v", "int", "double")]
    assert not d.is_compatible


def test_added_column_roundtrip(spark, tmp_path):
    path = str(tmp_path / "land")
    b1 = _b1(spark)
    land_evolving(b1, path, None)
    b2 = spark.createDataFrame(
        [(3, "c", 30, "fr")], "id long, name string, v int, lang string"
    )
    land_evolving(b2, path, b1.schema)
    out = read_evolved(spark, path)
    assert set(out.columns) == {"id", "name", "v", "lang"}
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["lang"] is None  # old files: NULL for the new column
    assert rows[3]["lang"] == "fr"
    # default (non-merged) read would have sampled ONE footer — pin that
    # the merged read is what surfaces the union schema
    assert len(rows) == 3


def test_widening_batch_is_reconciled(spark, tmp_path):
    path = str(tmp_path / "land")
    base = spark.createDataFrame([(1, 10)], "id long, v long")
    land_evolving(base, path, None)
    narrower = spark.createDataFrame([(2, 20)], "id long, v int")
    land_evolving(narrower, path, base.schema)
    out = read_evolved(spark, path)
    assert dict(out.dtypes)["v"] == "bigint"  # single physical type
    assert sorted(r["v"] for r in out.collect()) == [10, 20]


def test_incompatible_change_rejected(spark):
    base = spark.createDataFrame([(1, 10)], "id long, v long")
    bad = spark.createDataFrame([(2, "oops")], "id long, v string")
    with pytest.raises(SchemaDriftError, match="incompatible"):
        reconcile_batch(bad, base.schema)
    # and a LOSSY narrowing of landed doubles is also refused
    dbase = spark.createDataFrame([(1, 1.5)], "id long, v double")
    ibatch = spark.createDataFrame([(2, 2)], "id long, v long")
    assert reconcile_batch(ibatch, dbase.schema).dtypes == [
        ("id", "bigint"), ("v", "double"),
    ]


def test_merged_read_still_prunes(spark, tmp_path):
    path = str(tmp_path / "land")
    b1 = _b1(spark)
    land_evolving(b1, path, None)
    b2 = spark.createDataFrame(
        [(3, "c", 30, "fr")], "id long, name string, v int, lang string"
    )
    land_evolving(b2, path, b1.schema)
    plan = (
        read_evolved(spark, path)
        .filter(F.col("id") > 1)
        .select("id")
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "ReadSchema: struct<id:bigint>" in plan  # pruned to one column
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,1)]" in plan
