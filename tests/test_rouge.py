"""ROUGE-L dedup (operators/rouge.py): Arrow-kernel vs Python-twin LCS
parity (including hypothesis-random sequences), exact pair scores, the
Self-Instruct keep rule, and candidate blocking behavior."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from g_data_pipeline_spark.operators.rouge import (
    python_lcs,
    rouge_l_dedup,
    rouge_l_dedup_pairs,
)

DOCS = [
    (1, "write a short story about a dragon and a knight"),
    (2, "write a short story about a dragon and a brave knight"),  # near-dup of 1
    (3, "summarize the following article in two sentences"),
    (4, "translate the following sentence into french"),
    (5, "write a short poem about the sea and the sky"),
]


def _pairs(spark, rows, **kw):
    df = spark.createDataFrame(rows, "id long, text string")
    defaults = dict(shingle_n=2, max_shingle_freq=None, max_tokens=64)
    defaults.update(kw)
    return rouge_l_dedup_pairs(df, "id", "text", **defaults)


def test_exact_pair_scores(spark):
    got = {
        (r.id_a, r.id_b): r for r in _pairs(spark, DOCS).collect()
    }
    assert set(got) == {(1, 2)}
    r = got[(1, 2)]
    a = DOCS[0][1].split()
    b = DOCS[1][1].split()
    lcs = python_lcs(a, b)
    assert (r.len_a, r.len_b, r.lcs_len) == (len(a), len(b), lcs)
    assert r.rouge_l_micro == 2 * lcs * 1_000_000 // (len(a) + len(b))


def test_keep_rule_drops_larger_id(spark):
    df = spark.createDataFrame(DOCS, "id long, text string")
    kept = sorted(
        r.id
        for r in rouge_l_dedup(
            df, "id", "text", shingle_n=2, max_shingle_freq=None,
            max_tokens=64,
        ).collect()
    )
    assert kept == [1, 3, 4, 5]


def test_blocking_requires_shared_shingle(spark):
    # docs 3 and 4 share the bigram "the following" -> candidates, but
    # their ROUGE-L is far below threshold -> no pair emitted; docs with
    # no shared bigram never reach the kernel at all
    low = _pairs(spark, DOCS, threshold_micro=1).collect()
    assert (3, 4) in {(r.id_a, r.id_b) for r in low}


def test_hot_shingle_cap_prunes_candidates(spark):
    rows = [(i, f"common prefix words here tail{i}") for i in range(10)]
    # every pair shares the hot prefix bigrams; capping them to df<=5
    # kills all candidates
    assert _pairs(spark, rows, threshold_micro=1, max_shingle_freq=5).count() == 0
    assert _pairs(spark, rows, threshold_micro=1).count() == 45


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.sampled_from("abcdef"), max_size=24),
    st.lists(st.sampled_from("abcdef"), max_size=24),
)
def test_python_twin_is_a_true_lcs(a, b):
    """Property pin on the shared DP: symmetric, bounded by min length,
    and exact vs a brute-force subsequence check on small inputs."""
    got = python_lcs(a, b)
    assert got == python_lcs(b, a)
    assert got <= min(len(a), len(b))
    if a and got == len(a):
        # a must be a subsequence of b
        it = iter(b)
        assert all(tok in it for tok in a)


def test_kernel_matches_python_twin(spark):
    import random

    rng = random.Random(8)
    vocab = [f"w{k}" for k in range(12)]
    rows = []
    for i in range(20):
        n = rng.randint(0, 30)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    got = {
        (r.id_a, r.id_b): r.lcs_len
        for r in _pairs(spark, rows, threshold_micro=0).collect()
    }
    texts = dict(rows)
    for (ia, ib), lcs in got.items():
        assert lcs == python_lcs(texts[ia].split(), texts[ib].split())
    assert got, "random same-vocab docs must produce candidates"


@given(
    st.lists(st.sampled_from("abcd"), max_size=60),
    st.lists(st.sampled_from("abcd"), max_size=60),
)
@settings(max_examples=200, deadline=None)
def test_numpy_dp_bit_parity_with_python_twin(a, b):
    """The r9 numpy row-vectorized DP is bit-identical to the pure
    rolling loop on random sequences (the cummax reformulation's
    exactness pin) — including forced runs below/above the size cutoff."""
    from g_data_pipeline_spark.operators.grouped import (
        _lcs_rolling_np,
        _lcs_rolling_py,
    )

    la, lb = (a, b) if len(a) <= len(b) else (b, a)
    if not la:
        return
    assert _lcs_rolling_np(la, lb) == _lcs_rolling_py(la, lb) == python_lcs(a, b)


def test_numpy_dp_on_long_adversarial_pairs():
    """Above-cutoff shapes: identical long texts, disjoint texts, and a
    shared subsequence buried in noise."""
    from g_data_pipeline_spark.operators.grouped import (
        _LCS_NUMPY_MIN_CELLS,
        _lcs_rolling_np,
        _lcs_rolling_py,
    )

    same = ["tok%d" % (i % 7) for i in range(120)]
    other = ["z%d" % i for i in range(120)]
    woven = [x for pair in zip(same, other) for x in pair]
    for la, lb in ((same, same), (same, other), (same, woven)):
        la, lb = (la, lb) if len(la) <= len(lb) else (lb, la)
        assert len(la) * len(lb) >= _LCS_NUMPY_MIN_CELLS
        assert _lcs_rolling_np(la, lb) == _lcs_rolling_py(la, lb)
