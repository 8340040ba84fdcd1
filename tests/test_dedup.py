"""Dedup operator quality tests: MinHash-LSH recall vs the exact Jaccard
oracle, SimHash behavior on planted near-duplicates, survivor determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from tests.conftest import SF_DIR_ORACLE


def test_minhash_recall_against_exact(spark):
    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    mh = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=32, bands=8, threshold=0.5
        ).collect()
    }
    assert exact, "fixture should contain planted near-dups"
    # verification step makes precision exact
    assert mh <= exact
    recall = len(mh) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall:.2f} below 0.9"


def test_minhash_unverified_candidates_superset(spark):
    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    cands = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=32, bands=8, verify=False
        ).collect()
    }
    verified = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=32, bands=8, threshold=0.5
        ).collect()
    }
    assert verified <= cands


def test_simhash_near_dup_detection(spark):
    base = (
        "spark streams join the filter window batch value merge fast row key "
        "group query data slow small customer line hash order scan"
    )
    near = base.replace("window", "vindow")  # one token changed
    far = "completely different words entirely unrelated content here now"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id int, text string"
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_pairs(df, "doc_id", "text", max_hamming=16, bands=4).collect()
    }
    assert (1, 2) in pairs  # near-dup caught
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_exact_dedup_deterministic_survivor(spark):
    df = spark.createDataFrame(
        [("k", 3, "c"), ("k", 1, "a"), ("k", 2, "b"), ("x", 9, "z")],
        "key string, ord int, payload string",
    )
    out = exact_dedup(df, ["key"], "ord").collect()
    got = {r.key: r.payload for r in out}
    assert got == {"k": "a", "x": "z"}  # MIN(ord) survives, always


def test_jaccard_pairs_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),  # shingles: abc bcd cde def
            (2, "a b c d e g"),  # shingles: abc bcd cde deg -> common 3/5
            (3, "q r s t u v"),
        ],
        "doc_id int, text string",
    )
    rows = ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.jaccard == pytest.approx(3 / 5)


def test_jaccard_max_shingle_freq_cutoff(spark):
    # a shingle shared by every doc is dropped by the frequency cutoff
    df = spark.createDataFrame(
        [(i, f"common run here unique{i} tail{i} end{i}") for i in range(5)],
        "doc_id int, text string",
    )
    with_cut = ngram_jaccard_pairs(
        df, "doc_id", "text", threshold=0.01, max_shingle_freq=2
    ).count()
    without = ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.01).count()
    assert without == 10  # all pairs share "common run here"
    assert with_cut == 0


def test_dedup_clusters_union_find_parity(spark):
    """Label propagation must produce exactly the components a driver-side
    union-find computes on the same edges."""
    from g_data_pipeline_spark.operators.dedup import dedup_clusters

    edges = [(1, 2), (2, 3), (5, 6), (8, 9), (9, 10), (10, 11), (3, 4)]
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {r.id: r.cluster_id for r in dedup_clusters(df).collect()}

    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in edges:
        union(a, b)
    expected = {v: find(v) for v in parent}
    # normalize: representative = min of component (find after all unions)
    expected = {v: find(v) for v in parent}
    assert got == expected
    assert got[4] == 1 and got[11] == 8 and got[6] == 5


def test_dedup_clusters_raises_on_non_convergence(spark):
    """A path graph with diameter > max_iterations must raise rather than
    silently return partially-propagated labels."""
    from g_data_pipeline_spark.operators.dedup import dedup_clusters

    chain = [(i, i + 1) for i in range(8)]  # diameter 8
    df = spark.createDataFrame(chain, "id_a bigint, id_b bigint")
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_clusters(df, max_iterations=2)
    # and with enough iterations the same graph resolves to one cluster
    got = dedup_clusters(df, max_iterations=20)
    assert got.select("cluster_id").distinct().count() == 1


def test_dedup_clusters_on_planted_near_dups(spark):
    """End-to-end: minhash pairs -> clusters -> canonical survivor count."""
    from g_data_pipeline_spark.catalog import load_table
    from g_data_pipeline_spark.operators.dedup import (
        dedup_clusters,
        minhash_lsh_pairs,
    )

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)
    clusters = dedup_clusters(pairs)
    n_pair_docs = clusters.count()
    n_clusters = clusters.select("cluster_id").distinct().count()
    assert n_clusters < n_pair_docs  # at least one real merge
    # every cluster_id is a member of its own cluster
    ids = {r.id for r in clusters.collect()}
    reps = {r.cluster_id for r in clusters.collect()}
    assert reps <= ids


def test_decontaminate_flags_planted_copy(spark):
    """A corpus doc that verbatim-copies a benchmark doc is flagged; an
    unrelated doc is not, but still appears with n_overlap = 0 (total
    labeling); partial-overlap doc counts its shared distinct 3-grams."""
    from g_data_pipeline_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),   # verbatim copy
            (2, "alpha beta gamma unrelated words here"), # 1 shared 3-gram
            (3, "completely different text with nothing shared"),
            (4, "xy"),                                    # < n tokens
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: (r.n_overlap, r.contaminated)
        for r in decontaminate(
            corpus, bench, "doc_id", "text", n=3, min_overlap=4
        ).collect()
    }
    assert out[1] == (4, True)   # 6 tokens -> 4 distinct 3-grams, all shared
    assert out[2] == (1, False)
    assert out[3] == (0, False)
    assert out[4] == (0, False)
    assert len(out) == 4


def test_decontaminate_corpus_probe_is_broadcast(spark):
    """The benchmark shingle set must broadcast — the corpus side probes it
    without shuffling for the semi join (the only exchanges are the per-doc
    count and the zero-planting left join)."""
    from g_data_pipeline_spark.operators.dedup import decontaminate

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    plan = (
        decontaminate(
            docs.filter(F.col("doc_id") % 37 != 0),
            docs.filter(F.col("doc_id") % 37 == 0),
            "doc_id",
            "text",
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_span_dedup_planted_repeats(spark):
    """Doc 2 repeats doc 1's first span verbatim -> it loses that span but
    keeps its unique one; a fully-duplicated doc comes back with empty text
    and spans_kept=0 (total labeling); within-doc repeated spans collapse."""
    from g_data_pipeline_spark.operators.dedup import span_dedup

    df = spark.createDataFrame(
        [
            (1, "a b c d"),            # span: "a b c d"
            (2, "a b c d x y z w"),    # spans: ["a b c d" (dup), "x y z w"]
            (3, "a b c d"),            # fully duplicated
            (4, "p q r s p q r s"),    # within-doc repeat -> one survives
            (5, ""),                   # blank: 0 spans
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: (r.dedup_text, r.spans_kept, r.spans_total)
        for r in span_dedup(df, "doc_id", "text", span_tokens=4).collect()
    }
    assert out[1] == ("a b c d", 1, 1)
    assert out[2] == ("x y z w", 1, 2)
    assert out[3] == ("", 0, 1)
    assert out[4] == ("p q r s", 1, 2)
    assert out[5] == ("", 0, 0)
    assert len(out) == 5


def test_span_dedup_hot_span_skew(spark):
    """Skew stress: ONE span repeated across 20k docs all hashes to a single
    reducer partition pre-truncation — the WindowGroupLimit rank pushdown
    (pinned in tests/test_plans.py) must prune each group to its first row
    per partition BEFORE the final shuffle, so the hot group's reducer sees
    O(partitions) rows, not O(n). Behavioral contract checked here: first
    occurrence (min doc id) keeps the hot span, every other doc keeps only
    its unique tail, and the run completes at interactive speed."""
    from pyspark.sql import functions as F

    from g_data_pipeline_spark.operators.dedup import span_dedup

    n = 20_000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("hot hot hot hot "),
            F.format_string("u%d a b c", F.col("id")),
        ).alias("text"),
    )
    out = span_dedup(df, "doc_id", "text", span_tokens=4)
    agg = out.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("spans_kept").alias("kept"),
        F.sum("spans_total").alias("total"),
        F.sum(F.when(F.col("dedup_text").startswith("hot"), 1).otherwise(0)).alias(
            "hot_survivors"
        ),
    ).collect()[0]
    assert agg.rows == n  # total labeling
    assert agg.total == 2 * n
    assert agg.kept == n + 1  # every unique tail + exactly one hot span
    assert agg.hot_survivors == 1
    first = out.filter(F.col("doc_id") == 0).collect()[0]
    assert first.dedup_text == "hot hot hot hot u0 a b c"


def test_span_dedup_preserves_order_of_survivors(spark):
    """Surviving spans reassemble in original position order, not shuffle
    order."""
    from g_data_pipeline_spark.operators.dedup import span_dedup

    df = spark.createDataFrame(
        [(1, "dup1 dup1", ), (2, "k1 k1 dup1 dup1 k2 k2 k3 k3")],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r.dedup_text
        for r in span_dedup(df, "doc_id", "text", span_tokens=2).collect()
    }
    assert out[2] == "k1 k1 k2 k2 k3 k3"


def test_incremental_dedup_planted(spark):
    """Batch docs duplicating history are dropped; batch-internal dups keep
    MIN(doc_id); normalization makes the match case/punct-insensitive."""
    from g_data_pipeline_spark.operators.dedup import incremental_dedup

    history = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "older unique text")],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [
            (100, "The QUICK, brown fox!"),   # dup of history 1 (normalized)
            (101, "fresh new content"),
            (102, "fresh new content"),        # batch-internal dup of 101
            (103, "another fresh one"),
        ],
        ["doc_id", "text"],
    )
    kept = sorted(
        r.doc_id
        for r in incremental_dedup(batch, history, "text", "doc_id").collect()
    )
    assert kept == [101, 103]
