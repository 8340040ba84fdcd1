"""Run EVERY registered query against its DuckDB oracle at sf0.01 — the local
twin of the driver's correctness gate. Adding a query to the registry
automatically adds it here.
"""

from __future__ import annotations

import pytest

from g_data_pipeline_spark.queries import REGISTRY
from tests.conftest import SF_DIR_ORACLE
from tests.oracle_utils import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR_ORACLE)
    if spec.oracle is None:
        # rows-only check (non-SQL-expressible op)
        assert df.count() >= 0
        return
    assert_matches_oracle(df, duck, spec.oracle, name=name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    names = set(e.queries())
    assert set(e.oracle_sql()) <= names


def test_survey_core_leads_registry():
    """The driver grades only the first 50 registry entries; the pinned
    _DRIVER_WINDOW (round-3 rotation: never-driver-graded oracle queries
    first, then the SURVEY §2 core — see ROTATION.md) must be exactly that
    window, in order — new registrations may never evict a pinned entry."""
    from g_data_pipeline_spark.queries import _DRIVER_WINDOW

    assert len(_DRIVER_WINDOW) == 50
    assert list(REGISTRY)[:50] == list(_DRIVER_WINDOW)


def test_driver_window_entries_all_have_oracles():
    """A rows-only (oracle=None) entry inside the driver window can never
    produce a green correctness row — round 2 burned 8 of the 50 slots that
    way. Window slots are scarce: oracle-gated queries only."""
    from g_data_pipeline_spark.queries import _DRIVER_WINDOW

    missing = [n for n in _DRIVER_WINDOW if REGISTRY[n].oracle is None]
    assert missing == []


def test_driver_window_outputs_are_scalar_only(spark):
    """The driver's pandas-based canonicalizer hashes sorted column values
    and crashes on unhashable cells (`TypeError: unhashable type: 'list'` —
    the round-2 v_mean_pool red row). No in-window query may output
    array/map/struct columns; flatten (posexplode) instead."""
    from g_data_pipeline_spark.queries import _DRIVER_WINDOW
    from tests.conftest import SF_DIR_SMOKE

    offenders = {}
    for name in _DRIVER_WINDOW:
        df = REGISTRY[name].fn(spark, SF_DIR_SMOKE)
        bad = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if bad:
            offenders[name] = bad
    assert offenders == {}


# Round-4 post-window registrations queued for the r5 driver window
# (ROTATION.md "Round-5 rotation queue"). Pinned here so every queue entry
# is promotion-eligible BEFORE the repack: oracle present + scalar-only
# output (the two window rules that burned slots in round 2).
R5_QUEUE = (
    "a_groupwise_regression",
    "e_cumulative_users",
    "t_oov_rate",
    "t_train_val_test_split",
    "a_salted_join",
    "e_event_dedup_first",
    "d_minhash_estimate_pairs",
    "p_distributed_percentiles",
    "p_grouped_median_pandas",
    "t_text_normalize",
    "a_yoy_growth",
    "e_item_cooccurrence",
    "d_simhash_estimate_pairs",
    "e_ab_test",
)


def test_r5_queue_entries_window_eligible(spark):
    """Every r5-queue entry must already satisfy both window rules, so the
    round-5 repack is a pure pin-list edit with no failure risk."""
    from tests.conftest import SF_DIR_SMOKE

    problems = {}
    for name in R5_QUEUE:
        spec = REGISTRY.get(name)
        if spec is None or spec.oracle is None:
            problems[name] = "missing or rows-only"
            continue
        df = spec.fn(spark, SF_DIR_SMOKE)
        bad = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if bad:
            problems[name] = f"non-scalar columns: {bad}"
    assert problems == {}
