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
    """The driver grades only the first 50 registry entries; every SURVEY §2
    core operator (r*, q1, p_*, v_*, d_*, m_*, t_*, e_*, curation pipeline,
    skew) must sit inside that window."""
    first50 = set(list(REGISTRY)[:50])
    core_prefixes = ("r", "q1", "p_", "v_", "d_", "m_", "t_", "e_", "pipeline", "a_")
    core = {n for n in REGISTRY if n.startswith(core_prefixes)}
    missing = core - first50
    assert not missing, f"SURVEY §2 core outside driver window: {sorted(missing)}"
