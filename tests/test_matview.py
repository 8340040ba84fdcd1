"""Incremental materialized rollup (operators/matview.py): the
maintained state must be BIT-EQUAL to a full recompute after every
refresh, snapshots must version monotonically, and the refresh plan must
read only state + batch — never fact history."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from g_data_pipeline_spark.operators.matview import (
    MatView,
    RollupSpec,
    aggregate_batch,
)

SF_DIR = "/root/testdata/sf0.001"

SPEC = RollupSpec(
    keys=["l_returnflag", "l_linestatus"],
    sums={"sum_qty": "l_quantity", "sum_price": "l_extendedprice"},
    mins={"min_price": "l_extendedprice"},
    maxs={"max_price": "l_extendedprice"},
)


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")


def _rows(df):
    return sorted(
        tuple(r) for r in df.select(sorted(df.columns)).collect()
    )


def test_incremental_equals_full_recompute(spark, lineitem, tmp_path):
    view = MatView(spark, str(tmp_path / "mv"), SPEC)
    assert view.read() is None
    cuts = ["1995-06-01", "1997-01-01"]
    batches = [
        lineitem.filter(F.col("l_shipdate") < cuts[0]),
        lineitem.filter(F.col("l_shipdate").between(cuts[0], cuts[1])),
        lineitem.filter(F.col("l_shipdate") > cuts[1]),
    ]
    seen = None
    for i, b in enumerate(batches):
        v = view.refresh(b)
        assert v == i
        seen = b if seen is None else seen.unionByName(b)
        # bit-equality: decimal sums are associative, min/max fold
        assert _rows(view.read()) == _rows(aggregate_batch(seen, SPEC))
    total = view.read().agg(F.sum("n")).collect()[0][0]
    assert total == lineitem.count()


def test_crash_safety_ignores_uncommitted_version(spark, lineitem, tmp_path):
    view = MatView(spark, str(tmp_path / "mv"), SPEC)
    view.refresh(lineitem.limit(100))
    before = _rows(view.read())
    # simulate a crashed refresh: a v=1 dir without _SUCCESS
    import os

    os.makedirs(str(tmp_path / "mv" / "v=1"))
    assert _rows(view.read()) == before  # still reads v=0
    v = view.refresh(lineitem.limit(0))  # next refresh commits over it
    assert v == 1
    assert _rows(view.read()) == before  # empty batch: no change


def test_refresh_reads_state_not_history(spark, lineitem, tmp_path):
    view = MatView(spark, str(tmp_path / "mv"), SPEC)
    view.refresh(lineitem.filter(F.col("l_shipdate") < "1996-01-01"))
    old = view.read()
    fresh = aggregate_batch(
        lineitem.filter(F.col("l_shipdate") >= "1996-01-01"), SPEC
    )
    from g_data_pipeline_spark.operators.matview import merge_states

    plan = (
        merge_states(old, fresh, SPEC)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    # exactly two parquet scans: the state snapshot and the batch —
    # history never appears
    tree = plan.split("(1) Scan")[0]
    assert tree.count("Scan parquet") == 2

def test_vacuum_keeps_latest_and_skips_uncommitted(spark, lineitem, tmp_path):
    """vacuum_snapshots reaps only aged-out COMMITTED versions: the
    newest keep_last survive, uncommitted dirs are untouched, reads are
    unchanged, and post-vacuum refreshes continue the version sequence."""
    import os

    from g_data_pipeline_spark.operators.matview import vacuum_snapshots

    view = MatView(spark, str(tmp_path / "mv"), SPEC)
    cuts = [None, "1994-01-01", "1996-01-01", "1998-01-01"]
    for lo, hi in zip(cuts[:-1], cuts[1:]):
        b = lineitem.filter(F.col("l_shipdate") < hi)
        if lo:
            b = b.filter(F.col("l_shipdate") >= lo)
        view.refresh(b)
    # plant crash garbage: an uncommitted (no _SUCCESS) old version dir
    os.makedirs(str(tmp_path / "mv" / "v=99"))
    before = _rows(view.read())

    assert vacuum_snapshots(str(tmp_path / "mv"), keep_last=2) == [0]
    left = sorted(os.listdir(str(tmp_path / "mv")))
    assert left == ["v=1", "v=2", "v=99"]  # uncommitted v=99 untouched
    assert _rows(view.read()) == before

    assert view.refresh(lineitem.limit(0)) == 3  # numbering continues
    # keep_last clamps to 1: the newest committed version always survives
    assert vacuum_snapshots(str(tmp_path / "mv"), keep_last=0) == [1, 2]
    assert _rows(view.read()) == before


def test_time_travel_reads(spark, lineitem, tmp_path):
    """read(version=N) returns the snapshot AS OF that refresh — the
    audit/debug primitive ('what did the rollup say yesterday?'). Vacuumed
    and never-committed versions raise with the available range instead of
    resurrecting partial directories."""
    import pytest as _pytest

    from g_data_pipeline_spark.operators.matview import vacuum_snapshots

    view = MatView(spark, str(tmp_path / "mv"), SPEC)
    with _pytest.raises(ValueError, match="no committed versions"):
        view.read(version=0)

    cuts = [None, "1994-01-01", "1996-01-01", "1998-01-01"]
    per_version = []
    for lo, hi in zip(cuts[:-1], cuts[1:]):
        b = lineitem.filter(F.col("l_shipdate") < hi)
        if lo:
            b = b.filter(F.col("l_shipdate") >= lo)
        view.refresh(b)
        per_version.append(_rows(view.read()))

    assert view.versions() == [0, 1, 2]
    # every historical version still reads exactly as it did when current
    for v, expect in enumerate(per_version):
        assert _rows(view.read(version=v)) == expect
    assert _rows(view.read()) == per_version[-1]  # default = latest

    with _pytest.raises(ValueError, match="available: \\[0, 1, 2\\]"):
        view.read(version=7)

    vacuum_snapshots(str(tmp_path / "mv"), keep_last=2)
    assert view.versions() == [1, 2]
    with _pytest.raises(ValueError, match="not committed"):
        view.read(version=0)  # vacuumed away — explicit, not a partial read
    assert _rows(view.read(version=1)) == per_version[1]


def test_change_data_feed_between_versions(spark, lineitem, tmp_path):
    """changes_between(v_from, v_to) must report exactly the keys whose
    state changed — inserts for keys first seen after v_from, updates for
    folded keys, nothing for untouched keys — from the two state tables
    alone (O(|state|), facts unread)."""
    from g_data_pipeline_spark.operators.matview import changes_between

    view = MatView(spark, str(tmp_path / "mv"), SPEC)
    # v0: only 'A' rows; v1: more 'A' (update) ; v2: 'N' rows (insert)
    a = lineitem.filter(F.col("l_returnflag") == "A")
    view.refresh(a.filter(F.col("l_orderkey") % 2 == 0))
    view.refresh(a.filter(F.col("l_orderkey") % 2 == 1))
    view.refresh(lineitem.filter(F.col("l_returnflag") == "N"))

    c01 = changes_between(view, 0, 1).collect()
    assert {r.change_type for r in c01} == {"update"}
    assert {r.l_returnflag for r in c01} == {"A"}

    c12 = changes_between(view, 1, 2).collect()
    assert {r.change_type for r in c12} == {"insert"}
    assert {r.l_returnflag for r in c12} == {"N"}

    c02 = {(r.l_returnflag, r.l_linestatus): r.change_type
           for r in changes_between(view, 0, 2).collect()}
    assert set(c02.values()) == {"update", "insert"}

    # self-diff is empty; CDF state matches the target snapshot
    assert changes_between(view, 2, 2).count() == 0
    v2 = {(r.l_returnflag, r.l_linestatus): r.n
          for r in view.read(version=2).collect()}
    for r in changes_between(view, 1, 2).collect():
        assert r.n == v2[(r.l_returnflag, r.l_linestatus)]
