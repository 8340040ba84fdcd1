"""Record linkage / entity resolution: blocking + pairwise field scoring.

The scale-correct ER shape: candidate pairs come from an equi-join on a
BLOCKING KEY (cheap, discriminative attributes), never an all-pairs cross
join — candidate volume is sum-of-block-sizes-squared, controlled by the
blocking function, exactly like the LSH band-bucket joins in
operators/dedup.py. Pairwise similarity (edit distance, numeric deltas)
runs only inside blocks.

The reference has no linkage surface (single-table queries only); this is
the standard dirty-data companion to the dedup family for entity tables
(customers, suppliers) rather than documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_pairs(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    payload_cols: list[str],
) -> DataFrame:
    """Candidate pairs within blocks: self-equi-join on the blocking key,
    ordered ``id_a < id_b`` so each unordered pair appears once. Output
    columns: ``id_a, id_b, <payload>_a, <payload>_b``.

    One shuffle on the blocking key per side (co-partitioned equi-join);
    a hot block degrades quadratically within itself only — pick blocking
    keys accordingly (or salt via an extra block col)."""
    sel = [F.col(id_col).alias("id")] + [
        F.col(c) for c in block_cols + payload_cols
    ]
    base = df.select(*sel)
    a = base.select(
        F.col("id").alias("id_a"),
        *[F.col(c) for c in block_cols],
        *[F.col(c).alias(f"{c}_a") for c in payload_cols],
    )
    b = base.select(
        F.col("id").alias("id_b"),
        *[F.col(c) for c in block_cols],
        *[F.col(c).alias(f"{c}_b") for c in payload_cols],
    )
    return a.join(b, on=block_cols, how="inner").filter(
        F.col("id_a") < F.col("id_b")
    )


def edit_distance_score(a: Column | str, b: Column | str) -> Column:
    """Levenshtein distance (JVM built-in, codegen'd)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.levenshtein(a, b)


def link_customers_demo(df: DataFrame, max_lev: int, max_cents: int) -> DataFrame:
    """Demo linkage ruleset used by the gated query: candidates blocked on
    (c_nationkey, last-3 of name), matched when the name edit distance and
    the account-balance cent delta are both small. Exact integer outputs."""
    pairs = blocked_pairs(
        df,
        id_col="c_custkey",
        block_cols=["c_nationkey", "name_sfx"],
        payload_cols=["c_name", "bal_cents"],
    )
    lev = edit_distance_score("c_name_a", "c_name_b")
    cents = F.abs(F.col("bal_cents_a") - F.col("bal_cents_b"))
    return (
        pairs.select(
            "id_a",
            "id_b",
            lev.cast("bigint").alias("name_lev"),
            cents.alias("cents_diff"),
        )
        .filter(
            (F.col("name_lev") <= F.lit(max_lev))
            & (F.col("cents_diff") <= F.lit(max_cents))
        )
    )
