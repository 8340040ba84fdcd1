"""Registry-WIDE physical-plan hygiene sweep: every entry's plan is built
(at sf0.001 — plan shape, not timing) and checked for the global scale
invariants, so a future registration can never silently introduce a
cartesian join or a row-at-a-time Python UDF. Complements the per-query
shape pins in tests/test_plans.py.

Eager entries (spec.eager — training loops / kernels that execute at
DataFrame-build time) run their build jobs here too; sf0.001 keeps that
cheap. The sweep is one test so the whole registry shares one pass."""

from __future__ import annotations

from g_data_pipeline_spark.queries import REGISTRY

# Entries allowed to carry Python-evaluation plan nodes, and why. The
# house rule (CLAUDE.md): NO BatchEvalPython anywhere (row-at-a-time
# Python is never acceptable); Arrow-batched pandas nodes only in the
# grouped-kernel gate, the multimodal family, and the BPE encoder.
ARROW_ALLOWED = {
    "p_grouped_median_pandas",  # applyInPandas kernel gate (operators/grouped.py)
    "m_image_features",         # mapInPandas multimodal decode plumbing
    "m_video_frame_stats",
    "m_audio_features",
    "m_image_phash_dedup",
    "m_image_text_filter",      # dims decode + fake-CLIP seam (imagetext.py)
    "m_phash_caption_clusters",  # aHash clusters x caption stats
    "m_phash_neardup",          # structured-image fabrication + aHash
    # decode (phash_neardup.py — banded labels after are relational)
    "t_bpe_tokenize",           # broadcast-vocab Arrow encode
    "t_unigram_tokenize",       # broadcast unigram-LM Viterbi encode
    "t_compression_signal",     # scalar pandas zlib kernel (operators/grouped.py)
    "d_rouge_dedup_pairs",      # scalar pandas LCS kernel (operators/grouped.py)
    "t_unicode_normalize",      # scalar pandas NFC kernel (operators/grouped.py)
    "t_hf_tokenizer_roundtrip",  # broadcast-vocab Arrow encode via the
    # reloaded tokenizer.json model (same bpe_encode path as
    # t_bpe_tokenize)
}
# node classes themselves live in operators/planlint.py (the public
# lint API this sweep delegates to)

# No entry may plan a CartesianProduct even at tiny scale. The two
# labeled O(n^2) exactness baselines (v_near_dup_pairs, the levenshtein
# demo inside t_levenshtein_fuzzy) keep one side broadcastable by
# construction, so they plan as BroadcastNestedLoopJoin — acceptable
# for a deliberately-small side, never CartesianProduct.
CARTESIAN_ALLOWED: set[str] = set()

# Entries allowed to plan an UNPARTITIONED window (single-task sort of
# its input) and why that input is provably bounded. Kernel offset
# windows over "__bkt*" frames are exempted inside planlint itself —
# they are bounded by construction. Everything else must either bucket
# the window (operators/windows.py two-phase kernels — the round-6
# conversions of gini/deciles/pareto/rfm/curriculum/concurrent-peak/
# weighted-median) or justify a row here.
GLOBAL_WINDOW_ALLOWED = {
    "e_cumulative_users": "runs over the per-day rollup (#days rows)",
    "e_power_users": "rank<=10 — WindowGroupLimit prunes before the sort",
    "t_oov_rate": "row_number<=50 over the token rollup — WindowGroupLimit",
    "v_hybrid_rrf": "both rank legs keep rn<=50 — TakeOrderedAndProject "
    "is pushed below the windows (verified r5)",
    "v_hybrid_rrf_pq": "the lexical leg keeps rn<=50 (same shape as "
    "v_hybrid_rrf); the dense leg's windows partition by q_id",
    "t_bestfit_packing": "the bin-id offset window runs over the "
    "(streams x length-classes) rollup — bounded at sources*(k_max+2) "
    "rows by construction (operators/packing.py::bestfit_pack)",
    # w_ntile_rank_dense left this list in round 7: its windows now
    # PARTITION by region over the nations-per-region rollup (the parity
    # point survives; the kernel twin for data-sized inputs is
    # a_decile_stats).
}


def test_registry_wide_plan_hygiene(spark):
    from g_data_pipeline_spark.operators.planlint import lint

    violations: list[str] = []
    for name, spec in REGISTRY.items():
        df = spec.fn(spark, "/root/testdata/sf0.001")
        allow_cartesian = name in CARTESIAN_ALLOWED
        findings = lint(
            df,
            allow_arrow=(name in ARROW_ALLOWED),
            allow_global_window=(name in GLOBAL_WINDOW_ALLOWED),
        )
        for f in findings:
            if allow_cartesian and "CartesianProduct" in f:
                continue
            violations.append(f"{name}: {f}")
    assert not violations, "\n".join(violations)
    # the allowlists themselves must not rot: every allowed entry exists
    missing = (
        ARROW_ALLOWED | GLOBAL_WINDOW_ALLOWED.keys()
    ) - REGISTRY.keys()
    assert not missing, f"allowlisted names not in registry: {missing}"
