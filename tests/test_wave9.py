"""Round-5 wave-9 pins: independent NumPy/pandas parity for the new
statistics (formulations DIFFERENT from both the Spark query and the DuckDB
oracle, so all three agree only if the math is right) plus the plan-shape
claims made in the wave's docstrings."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from g_data_pipeline_spark.queries import REGISTRY
from tests.conftest import SF_DIR_ORACLE, SF_DIR_SMOKE
from tests.test_plans import op_counts, plan_of, shuffle_count


def _rows(spark, name, sf_dir):
    return {
        tuple(r): None for r in REGISTRY[name].fn(spark, sf_dir).collect()
    }.keys()


@pytest.fixture(scope="module")
def duck_small():
    con = duckdb.connect()
    for t in ("orders", "customer", "lineitem", "events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR_SMOKE}/{t}.parquet'"
        )
    return con


# ---------------------------------------------------------------------------
# NumPy parity


def test_gini_matches_mean_abs_difference(spark, duck_small):
    """Rank-formula Gini == the O(n^2) mean-absolute-difference definition
    G = sum|xi-xj| / (2 n^2 mu) — algebraically identical for ANY tie
    structure, so the micro values must agree to the rounding ulp."""
    got = {
        r["c_mktsegment"]: r["gini_micro"]
        for r in REGISTRY["a_gini_coefficient"].fn(spark, SF_DIR_SMOKE).collect()
    }
    spend = duck_small.execute(
        """
        SELECT c_mktsegment, SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS c
        FROM orders JOIN customer ON o_custkey=c_custkey
        GROUP BY c_mktsegment, o_custkey
        """
    ).fetchall()
    by_seg: dict[str, list[int]] = {}
    for seg, c in spend:
        by_seg.setdefault(seg, []).append(c)
    assert set(got) == set(by_seg)
    for seg, xs in by_seg.items():
        x = np.array(xs, dtype=np.float64)
        n = len(x)
        mad = np.abs(x[:, None] - x[None, :]).sum()
        gini = mad / (2 * n * n * x.mean())
        assert abs(got[seg] - round(1e6 * gini)) <= 1, seg


def test_weighted_median_crossing_definition(spark, duck_small):
    """Lower weighted median: smallest v whose cumulative weight reaches
    half the total — recomputed directly in NumPy."""
    got = {
        r["l_returnflag"]: (r["total_weight"], r["wmedian_cents"])
        for r in REGISTRY["a_weighted_median"].fn(spark, SF_DIR_SMOKE).collect()
    }
    rows = duck_small.execute(
        """
        SELECT l_returnflag, CAST(ROUND(l_extendedprice*100) AS BIGINT),
               CAST(ROUND(l_quantity*100) AS BIGINT)
        FROM lineitem
        """
    ).fetchall()
    by_flag: dict[str, list[tuple[int, int]]] = {}
    for f, v, w in rows:
        by_flag.setdefault(f, []).append((v, w))
    for f, vw in by_flag.items():
        vw.sort()
        tot = sum(w for _, w in vw)
        cum = 0
        for v, w in vw:
            cum += w
            if 2 * cum >= tot:
                break
        assert got[f] == (tot, v), f


def test_autocorr_matches_numpy_corrcoef(spark, duck_small):
    got = {
        r["o_orderpriority"]: r["r1_micro"]
        for r in REGISTRY["a_autocorr_lag1"].fn(spark, SF_DIR_SMOKE).collect()
    }
    daily = duck_small.execute(
        """
        SELECT o_orderpriority, CAST(date_trunc('day', o_orderdate) AS DATE) d,
               COUNT(*) n
        FROM orders GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict[str, list[int]] = {}
    for pri, _, n in daily:
        series.setdefault(pri, []).append(n)
    for pri, ns in series.items():
        x = np.array(ns[:-1], dtype=np.float64)
        y = np.array(ns[1:], dtype=np.float64)
        if x.std() == 0 or y.std() == 0:
            assert got[pri] is None
            continue
        r = np.corrcoef(x, y)[0, 1]
        assert abs(got[pri] - round(1e6 * r)) <= 1, pri


def test_entropy_matches_direct_plogp(spark, duck_small):
    got = {
        r["c_mktsegment"]: r["entropy_micro"]
        for r in REGISTRY["a_entropy_mix"].fn(spark, SF_DIR_SMOKE).collect()
    }
    cnt = duck_small.execute(
        """
        SELECT c_mktsegment, o_orderpriority, COUNT(*) FROM orders
        JOIN customer ON o_custkey=c_custkey GROUP BY 1, 2
        """
    ).fetchall()
    by_seg: dict[str, list[int]] = {}
    for seg, _, n in cnt:
        by_seg.setdefault(seg, []).append(n)
    for seg, ns in by_seg.items():
        p = np.array(ns, dtype=np.float64)
        p /= p.sum()
        h = float(-(p * np.log2(p)).sum())
        # per-term micro-rounding inside the query can drift a few micro
        # from the direct double formula; bound it well inside signal size
        assert abs(got[seg] - round(1e6 * h)) <= len(ns) + 1, seg
        assert 0 <= got[seg] <= round(1e6 * np.log2(len(ns))) + len(ns)


def test_hhi_matches_share_squares(spark, duck_small):
    got = {
        r["n_name"]: (r["n_suppliers"], r["hhi_micro"])
        for r in REGISTRY["a_hhi_concentration"].fn(spark, SF_DIR_SMOKE).collect()
    }
    assert got, "no nations"
    rows = duck_small.execute(
        f"""
        SELECT n_name, l_suppkey,
               SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT))
        FROM lineitem
        JOIN '{SF_DIR_SMOKE}/supplier.parquet' ON l_suppkey = s_suppkey
        JOIN '{SF_DIR_SMOKE}/nation.parquet' ON s_nationkey = n_nationkey
        GROUP BY 1, 2
        """
    ).fetchall()
    by_nation: dict[str, list[int]] = {}
    for nn, _, rev in rows:
        by_nation.setdefault(nn, []).append(rev)
    for nn, revs in by_nation.items():
        share = np.array(revs, dtype=np.float64)
        share /= share.sum()
        hhi = float((share**2).sum() * 1e4)
        assert got[nn][0] == len(revs)
        assert abs(got[nn][1] - round(1e6 * hhi)) <= 1, nn
        # a monopoly nation scores exactly 1e10 micro-points
        if len(revs) == 1:
            assert got[nn][1] == 10_000_000_000


def test_concurrent_peak_brute_force(spark, duck_small):
    """Recompute peak concurrency by brute-force point sampling at every
    boundary instant over pandas-built sessions."""
    got = [
        (r["us"], r["concurrency"])
        for r in REGISTRY["e_concurrent_peak"].fn(spark, SF_DIR_SMOKE).collect()
    ]
    ev = duck_small.execute(
        "SELECT user_id, epoch_us(ts) FROM events ORDER BY user_id, ts, event_id"
    ).fetchall()
    gap = 30 * 60 * 1_000_000
    sessions = []
    cur_user, start, last = None, None, None
    for u, us in ev:
        if u != cur_user or us - last > gap:
            if cur_user is not None:
                sessions.append((start, last))
            cur_user, start = u, us
        last = us
    sessions.append((start, last))
    bounds = sorted({b for s in sessions for b in s})
    conc = {
        t: sum(1 for a, b in sessions if a <= t <= b) for t in bounds
    }
    want = sorted(conc.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == want


def test_bounce_rate_rates_consistent(spark):
    rows = REGISTRY["e_bounce_rate"].fn(spark, SF_DIR_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_bounce"] <= r["n_sessions"]
        assert r["bounce_micro"] == round(1e6 * r["n_bounce"] / r["n_sessions"])


def test_basket_lift_brute_force(spark, duck_small):
    got = [
        tuple(r)
        for r in REGISTRY["a_basket_lift"].fn(spark, SF_DIR_SMOKE).collect()
    ]
    ob = duck_small.execute(
        f"""
        SELECT DISTINCT l_orderkey, p_brand FROM lineitem
        JOIN '{SF_DIR_SMOKE}/part.parquet' ON l_partkey = p_partkey
        """
    ).fetchall()
    baskets: dict[int, set[str]] = {}
    for ok, b in ob:
        baskets.setdefault(ok, set()).add(b)
    from collections import Counter
    from itertools import combinations

    nb: Counter = Counter()
    nab: Counter = Counter()
    for bs in baskets.values():
        for b in bs:
            nb[b] += 1
        for a, c in combinations(sorted(bs), 2):
            nab[(a, c)] += 1
    n_orders = len(baskets)
    want = sorted(
        (
            (a, c, n, round(1e6 * n * n_orders / (nb[a] * nb[c])))
            for (a, c), n in nab.items()
            if n >= 5
        ),
        key=lambda t: (-t[2], t[0], t[1]),
    )[:20]
    assert got == want


def test_boilerplate_fractions_consistent(spark):
    rows = REGISTRY["d_boilerplate_lines"].fn(spark, SF_DIR_ORACLE).collect()
    assert rows
    assert any(r["n_boiler_instances"] > 0 for r in rows), (
        "fixture must contain cross-doc repeated lines"
    )
    for r in rows:
        assert 0 <= r["n_boiler_instances"] <= r["n_lines"]


def test_cluster_profile_mass_conservation(spark):
    rows = REGISTRY["d_cluster_size_profile"].fn(spark, SF_DIR_ORACLE).collect()
    assert sum(r["n_docs"] for r in rows) == 500  # every doc in one cluster
    assert any(r["cluster_size"] > 1 for r in rows), (
        "prefix fingerprint must cluster the planted near-dup families"
    )
    total = sum(r["n_docs"] for r in rows)
    for r in rows:
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]
        assert r["share_micro"] == round(1e6 * r["n_docs"] / total)


def test_readability_grade_range(spark):
    rows = REGISTRY["t_readability"].fn(spark, SF_DIR_SMOKE).collect()
    assert rows
    for r in rows:
        # FK grade of English-ish prose lands in a sane band; the pin is
        # wide on purpose (the fixture corpus is synthetic).
        assert -5_000_000 < r["mean_grade_micro"] < 40_000_000
        assert r["mean_wps_micro"] > 0 and r["mean_spw_micro"] > 0


# ---------------------------------------------------------------------------
# Plan shapes


def test_gini_window_over_customer_rollup(spark):
    """Round-6 shape: the rank index runs through the bucketed row-index
    kernel — (seg, cents-bucket)-partitioned local windows + the tiny
    offsets window; the customer rollup is derived twice (local + counts
    branches), so orders/customer scan twice each. No seg-only window
    anywhere (tests/test_plans6.py pins the spec)."""
    plan = plan_of(spark, "a_gini_coefficient")
    c = op_counts(plan)
    assert c.get("Window", 0) == 2  # bucket-local + bucket offsets
    assert c.get("Scan", 0) <= 4  # 2 branches x (orders + customer)
    assert "CartesianProduct" not in plan


def test_weighted_median_single_fact_shuffle(spark):
    """Round-6 shape: the weighted-selection kernel reduces the fact scan
    per (flag, price) first — the fact-sized stages shuffle on the
    HIGH-cardinality composite key; windows run per (flag, bucket) and
    over the tiny bucket totals. No fact-sized flag-only sort
    (tests/test_plans6.py pins the window spec)."""
    plan = plan_of(spark, "a_weighted_median")
    c = op_counts(plan)
    assert c.get("Scan", 0) <= 2  # per-value + bucket-totals branches
    assert c.get("SortMergeJoin", 0) == 0  # offsets broadcast back


def test_hhi_dims_broadcast(spark):
    plan = plan_of(spark, "a_hhi_concentration")
    c = op_counts(plan)
    assert c.get("BroadcastHashJoin", 0) == 2
    assert c.get("SortMergeJoin", 0) == 0


def test_basket_lift_no_cartesian_broadcast_marginals(spark):
    """Pairs come from an order-keyed equi-join; brand marginals and the
    1-row total broadcast (BNLJ only for the deliberate 1-row side)."""
    plan = plan_of(spark, "a_basket_lift")
    c = op_counts(plan)
    assert "CartesianProduct" not in plan
    assert c.get("BroadcastHashJoin", 0) >= 3  # part + two marginals
    assert c.get("BroadcastNestedLoopJoin", 0) <= 1  # the 1-row total


def test_concurrent_peak_single_sessionize(spark):
    """Boundaries EXPLODE from the session aggregate (never a union of two
    selects). Round-6 shape: the two-phase prefix sum derives the
    per-instant frame twice (local + bucket-totals branches), so the scan
    and the explode appear at most twice; no unpartitioned sweep window
    (tests/test_plans6.py pins the spec)."""
    plan = plan_of(spark, "e_concurrent_peak")
    c = op_counts(plan)
    assert c.get("Scan", 0) <= 2
    assert c.get("Generate", 0) <= 2
    assert "Union" not in plan


def test_bounce_rate_two_exchanges(spark):
    """User-keyed session pass + tiny day rollup — nothing else."""
    plan = plan_of(spark, "e_bounce_rate")
    assert shuffle_count(plan) == 2
    assert op_counts(plan).get("Scan", 0) == 1


def test_readability_single_aggregate_no_joins(spark):
    plan = plan_of(spark, "t_readability")
    c = op_counts(plan)
    assert shuffle_count(plan) == 1
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_boilerplate_content_keyed_join(spark):
    plan = plan_of(spark, "d_boilerplate_lines")
    assert "CartesianProduct" not in plan
    assert op_counts(plan).get("Scan", 0) <= 2  # doc scan per side, no more
