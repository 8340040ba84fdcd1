"""Privacy auditing + DP release (operators/privacy.py).

k-anonymity / l-diversity reports are cross-checked against DuckDB on
the sf0.01 customer table; suppression is pinned by its postcondition
(min class size >= k, survivors exactly the rows of big-enough classes)
and a single-exchange plan shape; DP noise by determinism, seed/epsilon
behavior, and distribution sanity.
"""

from __future__ import annotations

import math

import pytest

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.operators import privacy
from g_data_pipeline_spark.operators.planlint import plan_report

SF = "/root/testdata/sf0.01"
QI = ["c_nationkey", "c_mktsegment"]


def test_k_anonymity_report_matches_duckdb(spark, duck):
    row = (
        privacy.k_anonymity_report(load_table(spark, SF, "customer"), QI)
        .collect()[0]
        .asDict()
    )
    want = duck.execute(
        """
        SELECT MIN(cs) AS k_min, COUNT(*) AS n_classes,
               SUM(CASE WHEN cs = 1 THEN 1 ELSE 0 END) AS n_singleton_classes,
               SUM(cs) AS n_rows,
               SUM(CASE WHEN cs < 2 THEN cs ELSE 0 END) AS rows_below_2,
               SUM(CASE WHEN cs < 5 THEN cs ELSE 0 END) AS rows_below_5,
               SUM(CASE WHEN cs < 10 THEN cs ELSE 0 END) AS rows_below_10
        FROM (SELECT COUNT(*) AS cs FROM customer
              GROUP BY c_nationkey, c_mktsegment)
        """
    ).fetchone()
    keys = [
        "k_min",
        "n_classes",
        "n_singleton_classes",
        "n_rows",
        "rows_below_2",
        "rows_below_5",
        "rows_below_10",
    ]
    assert [row[k] for k in keys] == [int(v) for v in want]


def test_l_diversity_report_matches_duckdb(spark, duck):
    row = (
        privacy.l_diversity_report(
            load_table(spark, SF, "customer"), ["c_nationkey"], "c_mktsegment"
        )
        .collect()[0]
        .asDict()
    )
    want = duck.execute(
        """
        SELECT MIN(l) AS l_min, COUNT(*) AS n_classes,
               SUM(CASE WHEN l = 1 THEN 1 ELSE 0 END) AS n_homogeneous
        FROM (SELECT COUNT(DISTINCT c_mktsegment) AS l FROM customer
              GROUP BY c_nationkey)
        """
    ).fetchone()
    assert [row["l_min"], row["n_classes"], row["n_homogeneous_classes"]] == [
        int(v) for v in want
    ]


def test_suppress_rare_classes_postcondition(spark):
    df = load_table(spark, SF, "customer")
    k = 12  # sf0.01: ~1500 customers / 125 (nation, segment) classes
    kept = privacy.suppress_rare_classes(df, QI, k)
    sizes = kept.groupBy(*QI).count().collect()
    assert sizes, "suppression must not empty the table at this k"
    assert min(r["count"] for r in sizes) >= k
    # survivors are exactly the rows of the originally-big-enough classes
    orig = {
        (r["c_nationkey"], r["c_mktsegment"]): r["count"]
        for r in df.groupBy(*QI).count().collect()
    }
    for r in sizes:
        assert orig[(r["c_nationkey"], r["c_mktsegment"])] == r["count"]
    assert kept.count() == sum(v for v in orig.values() if v >= k)


def test_suppress_rare_classes_single_exchange(spark):
    df = load_table(spark, SF, "customer")
    rep = plan_report(privacy.suppress_rare_classes(df, QI, 5))
    assert rep["shuffles"] == 1
    assert rep["cartesian_products"] == 0


def test_dp_counts_deterministic_and_seed_sensitive(spark):
    df = load_table(spark, SF, "customer")
    a = {
        r["c_mktsegment"]: r["n_noisy"]
        for r in privacy.dp_grouped_counts(
            df, ["c_mktsegment"], epsilon=1.0, seed=7
        ).collect()
    }
    b = {
        r["c_mktsegment"]: r["n_noisy"]
        for r in privacy.dp_grouped_counts(
            df, ["c_mktsegment"], epsilon=1.0, seed=7
        ).collect()
    }
    c = {
        r["c_mktsegment"]: r["n_noisy"]
        for r in privacy.dp_grouped_counts(
            df, ["c_mktsegment"], epsilon=1.0, seed=8
        ).collect()
    }
    assert a == b
    assert a != c
    # noise is bounded-ish at eps=1: Laplace(1) rarely exceeds 15 (P~3e-7)
    true = {
        r["c_mktsegment"]: r["count"]
        for r in df.groupBy("c_mktsegment").count().collect()
    }
    for seg, noisy in a.items():
        assert abs(noisy - true[seg]) < 15.0


def test_dp_noise_scale_tracks_epsilon(spark):
    """Mean |noise| over many groups ~ b = 1/epsilon; eps=10 noise must
    be far smaller than eps=0.1 noise."""
    df = load_table(spark, SF, "customer")
    true = {
        r["c_nationkey"]: r["count"]
        for r in df.groupBy("c_nationkey").count().collect()
    }

    def mean_abs_noise(eps):
        rows = privacy.dp_grouped_counts(
            df, ["c_nationkey"], epsilon=eps, seed=3
        ).collect()
        return sum(abs(r["n_noisy"] - true[r["c_nationkey"]]) for r in rows) / len(
            rows
        )

    tight, loose = mean_abs_noise(10.0), mean_abs_noise(0.1)
    assert tight < 1.0  # b = 0.1 -> E|noise| = 0.1
    assert loose > 5.0 * tight  # b = 10 -> two orders more in expectation


def test_dp_sum_clamps_before_summing(spark):
    df = load_table(spark, SF, "customer")
    out = {
        r["c_mktsegment"]: r["sum_noisy"]
        for r in privacy.dp_grouped_sum(
            df,
            ["c_mktsegment"],
            "c_acctbal",
            epsilon=1000.0,  # huge eps -> tiny noise, isolates the clamp
            clamp=(0.0, 1.0),
            seed=1,
        ).collect()
    }
    # with values clamped to [0, 1], each group's sum is <= its row count
    counts = {
        r["c_mktsegment"]: r["count"]
        for r in df.groupBy("c_mktsegment").count().collect()
    }
    for seg, s in out.items():
        assert -1.0 < s < counts[seg] + 1.0


def test_dp_sum_rejects_bad_clamp(spark):
    df = load_table(spark, SF, "customer")
    with pytest.raises(ValueError):
        privacy.dp_grouped_sum(
            df, ["c_mktsegment"], "c_acctbal", 1.0, clamp=(1.0, 0.0)
        )


def test_private_release_pipeline(spark):
    from g_data_pipeline_spark.pipelines import private_release

    df = load_table(spark, SF, "customer")
    released, audit = private_release(
        df,
        quasi_cols=QI,
        k=8,
        agg_keys=["c_mktsegment"],
        value_col="c_acctbal",
        epsilon=2.0,
        clamp=(0.0, 10000.0),
        seed=9,
    )
    a = audit.collect()[0]
    assert a["k_min"] >= 8          # suppression held
    assert a["rows_below_8"] == 0
    rows = released.collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_noisy"] > 0
        assert r["sum_noisy"] > 0
    # deterministic release for a fixed seed
    released2, _ = private_release(
        df,
        quasi_cols=QI,
        k=8,
        agg_keys=["c_mktsegment"],
        value_col="c_acctbal",
        epsilon=2.0,
        clamp=(0.0, 10000.0),
        seed=9,
    )
    assert {tuple(r) for r in rows} == {tuple(r) for r in released2.collect()}
