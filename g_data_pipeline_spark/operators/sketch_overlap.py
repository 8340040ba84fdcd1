"""Cross-group distinct-overlap at SKETCH cost (datasketches Theta).

``query_defs/dedup.d_source_shingle_overlap`` computes the exact
cross-source shingle-overlap matrix via a distinct-posts self-join —
exact, but its shuffle carries every distinct (source, shingle) post and
the pair join re-keys them all. At 100 TB the sketch version here is the
first pass you actually run: ONE aggregate pass over the facts builds a
constant-size Theta sketch per group, and the pairwise |A∩B| / |A∪B| /
Jaccard matrix is computed from the tiny sketch table alone — set
INTERSECTION is the thing Theta sketches support that HLL cannot
(HLL unions only; intersection via inclusion-exclusion explodes the
error for small overlaps).

Estimate quality: a Theta sketch with nominal k entries is EXACT until a
group exceeds k distinct values (it retains every hash), then subsamples
to ~k with relative error ≈ 1/sqrt(k) (~0.8% at lg_k=14); intersections
inherit the union's theta, so tiny-overlap estimates are the least
precise — raise ``lg_k`` if the overlaps of interest are <1% of either
side. ``tests/test_sketch_overlap.py`` pins the exact regime bit-for-bit
against the posts self-join and documents the capacity premise.

Mergeable like everything in operators/incremental_profile.py:
``theta_union_agg`` folds per-partition sketches, so the sketch table can
be maintained incrementally per ingest batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

THETA_LG_K = 14


def distinct_sketches(
    df: DataFrame, group_col: str, value_col: str, lg_k: int = THETA_LG_K
) -> DataFrame:
    """(group, theta) — one aggregate pass, one shuffle on the group key,
    constant bytes per group."""
    return df.groupBy(group_col).agg(
        F.expr(f"theta_sketch_agg({value_col}, {lg_k})").alias("theta")
    )


def pairwise_overlap(sketches: DataFrame, group_col: str) -> DataFrame:
    """Pairwise overlap matrix from the sketch table ALONE (facts unread):
    for every group pair a < b, estimated shared / union distinct counts
    and Jaccard. The sketch table has one row per group, so the self-join
    broadcasts; cost is O(n_groups²) sketch combines, independent of the
    fact table entirely."""
    a = sketches.select(
        F.col(group_col).alias("grp_a"), F.col("theta").alias("ta")
    )
    b = sketches.select(
        F.col(group_col).alias("grp_b"), F.col("theta").alias("tb")
    )
    return (
        a.join(F.broadcast(b), F.col("grp_a") < F.col("grp_b"))
        .select(
            "grp_a",
            "grp_b",
            F.round(
                F.expr("theta_sketch_estimate(theta_intersection(ta, tb))")
            )
            .cast("bigint")
            .alias("shared_est"),
            F.round(F.expr("theta_sketch_estimate(theta_union(ta, tb))"))
            .cast("bigint")
            .alias("union_est"),
        )
        .withColumn(
            "jaccard_micro",
            F.round(
                F.col("shared_est") * 1000000.0 / F.col("union_est")
            ).cast("bigint"),
        )
    )
