"""Random projection (Johnson–Lindenstrauss) for embedding compression.

Before any ANN structure is built over 100 TB of embeddings, the cheapest
lever is the DIMENSION: a k-dim Rademacher (±1) random projection
preserves pairwise geometry within ε for k = O(log n / ε²) (JL lemma;
Achlioptas 2003 shows ±1 entries suffice), and every downstream operator
in operators/similarity.py — LSH, IVF, IVF-PQ, SemDeDup — gets a d/k
speedup and memory cut on its hot loops.

Spark-first implementation details:

- The projection matrix is NEVER materialized or stored: entry s(j, i) is
  the SIGN of ``xxhash64(seed, j, i)`` — a pure expression, identical on
  every executor, no broadcast, no state to version. Reprojecting a new
  batch months later with the same seed is bit-identical (the same
  layout-invariance contract as the md5 sampling family).
- Row-local: one ``transform(sequence(k))`` of ``aggregate`` folds over
  the input array — zero shuffles, zero UDFs, whole-stage codegen. Cost
  is k·d multiply-adds per row, the same FLOPs any projection pays.
- Output scaled by 1/√k so dot products / norms are unbiased estimates
  of the originals.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sign(seed: int, j: Column, i: Column) -> Column:
    return F.when(
        F.pmod(F.xxhash64(F.lit(seed), j, i), F.lit(2)) == 0, F.lit(1.0)
    ).otherwise(F.lit(-1.0))


def srp_vector(vec: Column, out_dim: int, seed: int = 42) -> Column:
    """array<double> of length ``out_dim``: (1/√k)·S·v with S the ±1
    hash matrix. Pure expression — composable inside any select."""
    scale = 1.0 / math.sqrt(out_dim)
    return F.transform(
        F.sequence(F.lit(0), F.lit(out_dim - 1)),
        lambda j: F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, i: x.cast("double") * _sign(seed, j, i),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        * F.lit(scale),
    )


def srp_project(
    df: DataFrame,
    vec_col: str,
    out_dim: int,
    seed: int = 42,
    out_col: str = "projected",
) -> DataFrame:
    """Append the projected vector column; original column untouched."""
    return df.withColumn(out_col, srp_vector(F.col(vec_col), out_dim, seed))
