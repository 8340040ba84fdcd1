"""Mergeable incremental-profile query (round 5, post-goal depth wave).

Rows-only BY DESIGN: the exact half (cnt/nulls/mean/min/max/stddev) is
SQL-expressible, but the row's other half is datasketches HLL/KLL
estimates that no DuckDB expression reproduces bit-for-bit — mixing the
two in one gated row would hash-mismatch forever.
``tests/test_incremental_profile.py`` is the correctness pin instead:
exact fields equal a direct full-scan computation EXACTLY, sketch fields
sit inside their published error bounds, and split-batch merges equal the
single-pass result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.operators.incremental_profile import (
    merged_profile,
    partial_profile,
)
from g_data_pipeline_spark.queries import register

PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount"]


@register("p_incremental_profile")
def p_incremental_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile via the mergeable stats dataset, never a re-scan.

    Builds per-ship-month partial states (the "one row per ingest
    partition" stats dataset a 100 TB table would persist), then folds
    them into corpus-level stats: exact moments + HLL distinct + KLL
    quantiles. The fact table is scanned ONCE (partial pass); the merge
    reads only the partials. Scalar output columns only.
    """
    li = load_table(spark, sf_dir, "lineitem")
    partials = partial_profile(
        li,
        PROFILE_COLS,
        [F.date_trunc("month", "l_shipdate").alias("ingest_month")],
    )
    return merged_profile(partials, PROFILE_COLS).orderBy("column")
