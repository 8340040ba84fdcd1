"""Top-k per group — a pattern the reference lacks entirely (its only top-k
is the global head() cap, SURVEY.md §2.2 R11).

Implementation: ``row_number`` over a window partitioned by the group keys.
Scale notes: the window shuffles once on the group keys — same shuffle a
groupBy would need, no extra pass. For skewed groups Spark 3.1+'s
rank-limit pushdown (WindowGroupLimit) truncates each partition to k rows
*before* the shuffle when the filter is ``row_number() <= k``, so the
pattern below is scale-safe even when one group holds billions of rows.
Always include a unique tiebreaker in ``order_by`` if deterministic output
matters — ranking ties are otherwise partition-order dependent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_by: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rank",
    method: str = "row_number",
) -> DataFrame:
    """Keep the first k rows of each group under ``order_by``.

    ``method``: "row_number" (exactly k), "rank" / "dense_rank" (ties kept).
    """
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[
        method
    ]
    return (
        df.withColumn(rank_col, fn().over(w))
        .filter(F.col(rank_col) <= k)
    )
