"""Spark-4 VARIANT semi-structured handling (functions/variant.py):
typed extraction semantics (missing paths, cast misfits, strict mode),
the schema-drift profile, shredding with a queryable residual, and the
zero-shuffle scan-stage plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from g_data_pipeline_spark.functions.variant import (
    shred_variant,
    variant_schema_profile,
)

ROWS = [
    (1, '{"a": {"b": 1}, "tag": "x", "xs": [10, 20]}'),
    (2, '{"a": {"b": 2}, "tag": "y", "xs": [30]}'),
    (3, '{"a": {"b": "not-an-int"}, "tag": "z", "xs": []}'),
]


def _shred(spark, strict=False, keep_residual=True):
    df = spark.createDataFrame(ROWS, "id long, payload string")
    return shred_variant(
        df,
        "payload",
        {
            "b": ("$.a.b", "bigint"),
            "tag": ("$.tag", "string"),
            "x0": ("$.xs[0]", "bigint"),
            "nope": ("$.does.not.exist", "string"),
        },
        keep_residual=keep_residual,
        strict=strict,
    )


def test_typed_extraction_missing_and_misfit_null(spark):
    got = {r.id: r for r in _shred(spark).collect()}
    assert (got[1].b, got[1].tag, got[1].x0) == (1, "x", 10)
    assert got[2].x0 == 30
    # empty array index and non-castable leaf -> NULL, not an error
    assert got[3].x0 is None and got[3].b is None
    assert all(got[i].nope is None for i in (1, 2, 3))


def test_strict_mode_raises_on_cast_misfit(spark):
    with pytest.raises(Exception, match="(?i)variant|cast|INVALID"):
        _shred(spark, strict=True).collect()


def test_residual_variant_stays_queryable(spark):
    # a field NOT shredded up front is still extractable from the residual
    late = _shred(spark).select(
        "id",
        F.try_variant_get(F.col("payload_variant"), "$.xs[1]", "bigint").alias(
            "x1"
        ),
    )
    got = {r.id: r.x1 for r in late.collect()}
    assert got == {1: 20, 2: None, 3: None}


def test_schema_profile_counts_and_share(spark):
    df = spark.createDataFrame(
        [(f'{{"a": {i}}}',) for i in range(3)]
        + [('{"a": 1, "b": "x"}',)],
        "payload string",
    )
    rows = variant_schema_profile(df, "payload").collect()
    assert [r.n_rows for r in rows] == [3, 1]
    assert rows[0].variant_schema == "OBJECT<a: BIGINT>"
    assert rows[0].share_micro == 750_000 and rows[1].share_micro == 250_000


def test_shred_plan_is_scan_stage_only(spark):
    from g_data_pipeline_spark.operators.planlint import plan_report

    rep = plan_report(_shred(spark))
    assert rep["shuffles"] == 0
    assert not rep["row_python_nodes"] and not rep["arrow_python_nodes"]
