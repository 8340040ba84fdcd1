"""Unit tests pinning IR-compiler semantics (SURVEY.md §2.2 / §4.3) on tiny
inline DataFrames: typed filter literals, skip-on-unparseable, COUNT(col)
null handling, null group keys, intent row caps, sequential composition."""

from __future__ import annotations

import pytest

from g_data_pipeline_spark.ir import (
    ColumnOperation,
    QueryIntent,
    StructuredQuery,
)
from g_data_pipeline_spark.plans import compile_query


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (1, 10.0, "a"),
        (2, 20.0, "b"),
        (3, None, "a"),
        (4, 40.0, None),
        (5, 50.0, "b"),
    ]
    return spark.createDataFrame(rows, "id bigint, v double, k string")


def q(intent, columns=(), ops=()):
    return StructuredQuery(
        intent=QueryIntent(intent), columns=list(columns), operations=list(ops)
    )


def test_typed_equality_literal_on_numeric_column(spark, tiny):
    # IR values are strings; "20" must compare as a number (SURVEY.md §4.3.4).
    ops = [ColumnOperation(type="filter", column="v", operator="=", value="20")]
    got = compile_query(tiny, q("filter", ["id"], ops)).collect()
    assert [r.id for r in got] == [2]


def test_unparseable_ordering_value_skips_op(spark, tiny):
    # Reference logs a warning and skips (query_translator.rs:365-404).
    ops = [ColumnOperation(type="filter", column="v", operator=">", value="oops")]
    got = compile_query(tiny, q("filter", ["id"], ops)).count()
    assert got == 5


def test_conjunctive_filters_and_semantics(spark, tiny):
    ops = [
        ColumnOperation(type="filter", column="v", operator=">", value="10"),
        ColumnOperation(type="filter", column="k", operator="=", value="b"),
    ]
    got = compile_query(tiny, q("filter", ["id"], ops)).collect()
    assert sorted(r.id for r in got) == [2, 5]


def test_count_is_non_null(spark, tiny):
    ops = [ColumnOperation(type="count", column="v")]
    row = compile_query(tiny, q("aggregate", [], ops)).collect()[0]
    assert row["count_v"] == 4  # one null excluded (SQL COUNT(col))


def test_mean_alias_and_null_handling(spark, tiny):
    ops = [ColumnOperation(type="mean", column="v")]
    row = compile_query(tiny, q("aggregate", [], ops)).collect()[0]
    assert row["mean_v"] == pytest.approx(30.0)  # nulls ignored


def test_group_by_count_null_key_group(spark, tiny):
    ops = [ColumnOperation(type="group_by_count", column="k")]
    got = {
        r["k"]: r["count_k"]
        for r in compile_query(tiny, q("aggregate", [], ops)).collect()
    }
    # NULL key forms its own group; COUNT(k) over it is 0 (non-null count).
    assert got == {"a": 2, "b": 2, None: 0}


def test_describe_cap_10(spark):
    df = spark.range(50).toDF("id")
    out = compile_query(df, q("describe"))
    assert out.count() == 10


def test_visualize_cap_100(spark):
    df = spark.range(500).toDF("id")
    out = compile_query(df, q("visualize"))
    assert out.count() == 100


def test_projection_applied_for_filter_intent(spark, tiny):
    got = compile_query(tiny, q("filter", ["k", "id"]))
    assert got.columns == ["k", "id"]


def test_sort_then_cap_composition(spark, tiny):
    ops = [ColumnOperation(type="sort", column="id", ascending=False)]
    got = compile_query(tiny, q("describe", ["id"], ops)).collect()
    assert [r.id for r in got] == [5, 4, 3, 2, 1]


def test_single_lazy_plan_no_eager_materialization(spark, tiny):
    # The whole point vs the reference: compile_query must not trigger jobs.
    ops = [
        ColumnOperation(type="filter", column="v", operator=">", value="10"),
        ColumnOperation(type="sum", column="v"),
    ]
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    df = compile_query(tiny, q("aggregate", [], ops))
    after = tracker.getJobIdsForGroup(None)
    assert before == after  # lazy: no Spark jobs ran during compilation
    assert df.collect()[0]["sum_v"] == pytest.approx(110.0)


def test_ir_json_roundtrip_and_validation():
    sq = StructuredQuery.from_json(
        '{"intent": "aggregate", "columns": [], '
        '"operations": [{"type": "mean", "column": "x"}]}'
    )
    assert sq.intent == QueryIntent.AGGREGATE
    with pytest.raises(ValueError):
        StructuredQuery.from_json(
            '{"intent": "filter", "operations": '
            '[{"type": "filter", "column": "x", "operator": "LIKE", "value": "a"}]}'
        )
    with pytest.raises(ValueError):
        sq2 = StructuredQuery.from_json(
            '{"intent": "aggregate", "operations": [{"type": "mean", "column": "nope"}]}'
        )
        sq2.validate(available_columns=["x"])


def test_grouped_aggregate_by_extension(spark, tiny):
    ops = [ColumnOperation(type="mean", column="v", by="k")]
    got = {
        r["k"]: r["mean_v"]
        for r in compile_query(tiny, q("aggregate", [], ops)).collect()
    }
    assert got["a"] == pytest.approx(10.0)  # (10 + null) -> 10
    assert got["b"] == pytest.approx(35.0)  # (20 + 50)/2


def test_grouped_by_unknown_column_rejected():
    sq = StructuredQuery.from_json(
        '{"intent": "aggregate", "operations": '
        '[{"type": "sum", "column": "v", "by": "nope"}]}'
    )
    with pytest.raises(ValueError):
        sq.validate(available_columns=["v", "k"])
