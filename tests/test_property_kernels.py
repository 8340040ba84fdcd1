"""Hypothesis property pins for deterministic kernels — randomized inputs
where a fixed fixture can miss the edge:

1. pack_sequences == a pure-Python reference fold (exact, any lengths /
   capacity / grouping).
2. exact_percentiles_distributed == numpy linear interpolation (exact,
   any values / percentiles / partitioning).
3. canonical_url: idempotent, and the Spark expression == the DuckDB SQL
   twin on randomized URL shapes (the gated-path parity that matters).
4. matview merge_states: any batch split folds to the same state as one
   aggregate over the union (bit-equal decimal sums).
5. CMS point estimates: one-sided (est >= true) for every key.
6. merged_heavy_hitters: cnt_lo <= true <= cnt_hi for every returned
   value; exact when k covers the alphabet.

Budgets follow tests/test_deterministic_property.py: small max_examples,
deadline=None (Spark job latency dominates, not the kernel).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


# ---------------------------------------------------------------- packing
@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 1), st.integers(1, 40)),  # (group, n_tokens)
        min_size=1,
        max_size=25,
    ),
    st.integers(4, 64),
)
def test_pack_sequences_matches_python_reference(spark, docs, capacity):
    from g_data_pipeline_spark.operators.packing import pack_sequences

    rows = [
        (i, f"g{g}", " ".join(["w"] * n)) for i, (g, n) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "id long, grp string, text string")
    got = {
        r["id"]: (r["n_tokens"], r["bin_id"], r["bin_offset"], r["spans_bins"])
        for r in pack_sequences(
            df, "id", "text", "grp", capacity=capacity
        ).collect()
    }
    # reference: sequential fold per group in id order
    want = {}
    cum: dict[str, int] = {}
    for i, (g, n) in enumerate(docs):
        start = cum.get(g, 0)
        cum[g] = start + n
        want[i] = (
            n,
            start // capacity,
            start % capacity,
            (start + n - 1) // capacity > start // capacity,
        )
    assert got == want


# ------------------------------------------------------------ percentiles
@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.integers(-10**6, 10**6).map(lambda k: k / 100.0),
        min_size=1,
        max_size=120,
    ),
    st.lists(st.floats(0.0, 1.0), min_size=1, max_size=4),
    st.integers(1, 6),
)
def test_distributed_percentiles_match_numpy(spark, values, pcts, parts):
    from g_data_pipeline_spark.operators.percentiles import (
        exact_percentiles_distributed,
    )

    df = spark.createDataFrame([(v,) for v in values], "v double")
    got = exact_percentiles_distributed(df, "v", pcts, num_partitions=parts)
    for p in pcts:
        want = float(np.percentile(values, p * 100, method="linear"))
        assert got[p] == pytest.approx(want, abs=1e-9), (p, values)


# ---------------------------------------------------------- canonical_url
_SEG = st.text(
    alphabet="abXY19", min_size=1, max_size=4
)


@st.composite
def _urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "HTTPS", "Https"]))
    host = ".".join(draw(st.lists(_SEG, min_size=1, max_size=3)))
    path = "".join("/" + draw(_SEG) for _ in range(draw(st.integers(0, 3))))
    if draw(st.booleans()):
        path += "/"
    params = []
    for _ in range(draw(st.integers(0, 3))):
        k = draw(_SEG)
        if draw(st.booleans()):
            k = "utm_" + k
        params.append(f"{k}={draw(_SEG)}")
    q = "?" + "&".join(params) if params else ""
    frag = "#" + draw(_SEG) if draw(st.booleans()) else ""
    return f"{scheme}://{host}{path}{q}{frag}"


@settings(max_examples=10, deadline=None)
@given(st.lists(_urls(), min_size=1, max_size=20))
def test_canonical_url_idempotent_and_sql_parity(spark, urls):
    import duckdb

    from g_data_pipeline_spark.query_defs.curation4 import (
        canonical_url,
        sql_canonical_url,
    )

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(
        "url", canonical_url(F.col("url")).alias("c1")
    ).select("url", "c1", canonical_url(F.col("c1")).alias("c2"))
    rows = once.collect()
    for r in rows:
        assert r["c2"] == r["c1"], f"not idempotent: {r['url']!r}"
    got = {r["url"]: r["c1"] for r in rows}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u in urls])
    for u, want in con.execute(
        f"SELECT url, {sql_canonical_url('url')} FROM t"
    ).fetchall():
        assert got[u] == want, f"Spark/DuckDB diverge on {u!r}"


# ------------------------------------------------------- matview algebra
@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),
            st.integers(-10**6, 10**6).map(lambda k: k / 100.0),
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(1, 4),
)
def test_matview_fold_equals_single_aggregate(spark, rows, n_batches):
    from g_data_pipeline_spark.operators.matview import (
        RollupSpec,
        aggregate_batch,
        merge_states,
    )

    spec = RollupSpec(
        keys=["k"], sums={"sx": "x"}, mins={"mn": "x"}, maxs={"mx": "x"}
    )
    df = spark.createDataFrame(
        [(f"k{k}", x) for k, x in rows], "k string, x double"
    )
    whole = aggregate_batch(df, spec)
    # fold the same rows batch-by-batch (round-robin split)
    state = None
    for i in range(n_batches):
        chunk = [(f"k{k}", x) for j, (k, x) in enumerate(rows) if j % n_batches == i]
        if not chunk:
            continue
        part = aggregate_batch(
            spark.createDataFrame(chunk, "k string, x double"), spec
        )
        state = part if state is None else merge_states(state, part, spec)

    def key_rows(frame):
        return sorted(
            tuple(r) for r in frame.select(sorted(frame.columns)).collect()
        )

    assert key_rows(state) == key_rows(whole)  # bit-equal decimal sums


# ------------------------------------------------------------------- CMS
@settings(max_examples=6, deadline=None)
@given(st.lists(st.integers(0, 30), min_size=1, max_size=300))
def test_cms_point_estimate_is_one_sided(spark, keys):
    from collections import Counter

    from g_data_pipeline_spark.operators.advisor import (
        cms_point_estimate,
        cms_sketch,
        cms_total_count,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    s = cms_sketch(df, "k", eps=0.01, confidence=0.95, seed=3)
    assert cms_total_count(s) == len(keys)
    true = Counter(keys)
    est = cms_point_estimate(s, list(range(31)))
    for k in range(31):
        assert est[k] >= true.get(k, 0), (k, est[k], true.get(k, 0))


# ---------------------------------------------------------- heavy hitters
@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 11)),  # (day, value)
        min_size=1,
        max_size=200,
    ),
    st.integers(2, 14),
)
def test_heavy_hitter_brackets_hold(spark, rows, k):
    from collections import Counter

    from g_data_pipeline_spark.operators.incremental_profile import (
        merged_heavy_hitters,
        partial_heavy_hitters,
    )

    df = spark.createDataFrame(
        [(d, f"v{v}") for d, v in rows], "day int, v string"
    )
    p = partial_heavy_hitters(df, "v", ["day"], k=k)
    top = merged_heavy_hitters(p, k=12).collect()
    true = Counter(f"v{v}" for _, v in rows)
    for r in top:
        assert r["cnt_lo"] <= true[r["value"]] <= r["cnt_hi"], (r, true)
    if k >= 12:  # alphabet fits every partial: fold is exact
        assert {r["value"]: r["cnt_lo"] for r in top} == dict(
            Counter(true).most_common(12)
        )
        assert all(r["cnt_lo"] == r["cnt_hi"] for r in top)


# ------------------------------------------------- merged-interval reassembly
@settings(max_examples=10, deadline=None)
@given(
    st.integers(1, 60),                       # n tokens
    st.integers(1, 12),                       # window w
    st.lists(st.integers(0, 59), max_size=10),  # raw cut starts
)
def test_reassembly_matches_set_semantics(spark, n, w, raw_starts):
    """The round-7 linear merged-interval reassembly == the set
    definition (keep token i iff NO start s has s+1 <= i <= s+w), for
    ANY window size and cut placement — including overlapping, adjacent,
    duplicate-adjacent, head/tail, and full-coverage cuts that a fixed
    fixture can miss."""
    from pyspark.sql import functions as F

    from g_data_pipeline_spark.operators.dedup import _reassemble_after_cuts

    starts = sorted({s for s in raw_starts if s <= max(n - w, 0)})
    toks = [f"t{i}" for i in range(n)]
    df = spark.createDataFrame(
        [(1, " ".join(toks), toks, starts)],
        "id long, __text string, __toks array<string>, __starts array<int>",
    )
    row = _reassemble_after_cuts(df, w).collect()[0]
    cut = {i for s in starts for i in range(s + 1, s + w + 1)}
    want = [t for i, t in enumerate(toks, start=1) if i not in cut]
    assert row.dedup_text == " ".join(want)
    assert row.n_tokens == n
    assert row.n_tokens_kept == len(want)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=6), min_size=1, max_size=12
    ),
    st.integers(min_value=0, max_value=20),
)
def test_truncate_to_context_is_maximal_suffix(spark, turn_tokens, budget):
    """truncate_to_context's row-local reverse fold == the spec: keep the
    MAXIMAL whole-turn suffix whose token total fits the budget (random
    per-turn sizes incl. empty turns, random budgets incl. zero)."""
    from g_data_pipeline_spark.operators.conversations import (
        truncate_to_context,
    )

    turns = [
        ("user" if i % 2 == 0 else "assistant",
         " ".join("w" for _ in range(n)))
        for i, n in enumerate(turn_tokens)
    ]
    convs = spark.createDataFrame(
        [(1, 1, turns)],
        "user long, conv_idx long, "
        "turns array<struct<role string, content string>>",
    )
    row = truncate_to_context(convs, max_tokens=budget).collect()[0]

    # Python spec: walk from the end while the budget holds
    kept = tot = 0
    for n in reversed(turn_tokens):
        if tot + n > budget:
            break
        tot += n
        kept += 1
    assert (row.turns_kept, row.tokens_kept) == (kept, tot)
    assert [t.content for t in row.turns] == [
        c for _, c in turns[len(turns) - kept:]
    ]
