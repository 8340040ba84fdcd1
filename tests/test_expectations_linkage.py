"""Unit tests for operators/expectations.py and operators/linkage.py on
tiny literal frames (the gated queries a_expectations_report /
a_record_linkage cover the at-scale oracle parity; these pin the rule
semantics — NULL handling, violation counting, pair ordering — directly)."""

from __future__ import annotations

from pyspark.sql import functions as F

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
from g_data_pipeline_spark.operators.linkage import blocked_pairs


def _report_dict(df):
    return {r["rule"]: (r["n_checked"], r["n_violations"]) for r in df.collect()}


def test_row_level_rules_null_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "O", "1-URGENT"),
            (2, -3.0, "X", "9-bogus"),
            (None, None, None, None),
            (4, 700.0, "F", "5-LOW"),
        ],
        "k bigint, price double, status string, prio string",
    )
    rep = _report_dict(
        row_level_report(
            df,
            [
                not_null("k"),
                in_range("price", 0.0, 500.0),
                in_set("status", ["O", "F", "P"]),
                matches("prio", "^[1-5]-[A-Z]+$", label="prio_fmt"),
            ],
        )
    )
    assert rep["not_null(k)"] == (4, 1)
    # NULL passes range/set/regex (pair with not_null to catch nulls).
    assert rep["in_range(price,0.0,500.0)"] == (4, 2)  # -3 and 700
    assert rep["in_set(status)"] == (4, 1)  # only 'X'; NULL passes
    assert rep["prio_fmt"] == (4, 1)  # only '9-bogus'; NULL passes


def test_observed_row_level_matches_report_from_a_write(spark, tmp_path):
    """The one-pass Observation variant yields the SAME numbers as
    row_level_report, but collected from the job that writes the data —
    zero extra scans of the fact table."""
    from g_data_pipeline_spark.operators.expectations import (
        observation_report,
        observed_row_level,
    )

    df = spark.createDataFrame(
        [
            (1, 10.0, "O", "1-URGENT"),
            (2, -3.0, "X", "9-bogus"),
            (None, None, None, None),
            (4, 700.0, "F", "5-LOW"),
        ],
        "k bigint, price double, status string, prio string",
    )
    rules = [
        not_null("k"),
        in_range("price", 0.0, 500.0),
        in_set("status", ["O", "F", "P"]),
        matches("prio", "^[1-5]-[A-Z]+$", label="prio_fmt"),
    ]
    observed, obs = observed_row_level(df, rules)
    observed.write.mode("overwrite").parquet(str(tmp_path / "curated"))
    got = {
        name: (n, v) for name, n, v in observation_report(obs, rules)
    }
    want = _report_dict(row_level_report(df, rules))
    assert got == want
    # the written output is the unmodified passthrough
    assert spark.read.parquet(str(tmp_path / "curated")).count() == 4


def test_unique_and_fk_reports(spark):
    child = spark.createDataFrame(
        [(1, 100), (2, 100), (2, 200), (3, None), (4, 999)],
        "k bigint, fk bigint",
    )
    parent = spark.createDataFrame([(100,), (200,)], "pk bigint")
    rep = _report_dict(
        expectations_report(
            [
                unique_report(child, ["k"]),
                foreign_key_report(child, "fk", parent, "pk"),
            ]
        )
    )
    assert rep["unique(k)"] == (5, 1)  # k=2 twice -> one extra row
    # NULL fk and fk=999 are both orphans.
    assert rep["fk(fk->pk)"] == (5, 2)


def test_blocked_pairs_each_unordered_pair_once(spark):
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "y"), (3, "a", "z"), (4, "b", "w")],
        "id bigint, blk string, payload string",
    )
    pairs = blocked_pairs(
        df, id_col="id", block_cols=["blk"], payload_cols=["payload"]
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # block 'a' has 3C2 = 3 pairs, block 'b' none; always id_a < id_b.
    assert got == {(1, 2), (1, 3), (2, 3)}
    assert all(r["id_a"] < r["id_b"] for r in pairs)
    by_pair = {(r["id_a"], r["id_b"]): (r["payload_a"], r["payload_b"]) for r in pairs}
    assert by_pair[(1, 2)] == ("x", "y")


def test_unique_report_excludes_null_keys(spark):
    """NULL keys are excluded (COUNT(DISTINCT) semantics) so the report
    matches a COUNT(*)-COUNT(DISTINCT col) SQL twin; not_null flags them."""
    df = spark.createDataFrame(
        [(None,), (None,), (1,), (1,), (2,)], "k bigint"
    )
    rep = _report_dict(unique_report(df, ["k"]))
    assert rep["unique(k)"] == (3, 1)  # 3 non-null rows, one dup


def test_row_level_report_escapes_quoted_labels(spark):
    """Rule labels are spliced into a stack() SQL string — quotes must not
    break the expression."""
    df = spark.createDataFrame([("a",), ("b",)], "name string")
    rep = _report_dict(
        row_level_report(
            df, [matches("name", "^[a-z]$", label="o'brien check")]
        )
    )
    assert rep["o'brien check"] == (2, 0)


def test_validated_land_routes_and_counts(spark, tmp_path):
    """validated_land: good rows land clean, violators land in quarantine
    with the names of every rule they broke; counts come back from the
    writes' own Observations."""
    from g_data_pipeline_spark.operators.expectations import (
        in_range,
        not_null,
        validated_land,
    )

    df = spark.createDataFrame(
        [
            (1, 10.0),
            (2, None),       # not_null(v)
            (3, 999.0),      # in_range(v)
            (4, 20.0),
        ],
        "id long, v double",
    )
    good_p = str(tmp_path / "good")
    quar_p = str(tmp_path / "quar")
    n_good, n_quar = validated_land(
        df, [not_null("v"), in_range("v", 0, 100)], good_p, quar_p
    )
    assert (n_good, n_quar) == (2, 2)
    good = spark.read.parquet(good_p)
    assert sorted(r["id"] for r in good.collect()) == [1, 4]
    assert "__violated" not in good.columns
    quar = {r["id"]: r["__violated"] for r in spark.read.parquet(quar_p).collect()}
    assert quar[2] == "not_null(v)"
    assert quar[3] == "in_range(v,0,100)"
    # append-mode audit trail: re-landing accumulates quarantine rows
    validated_land(
        df, [not_null("v"), in_range("v", 0, 100)], good_p, quar_p
    )
    assert spark.read.parquet(quar_p).count() == 4
