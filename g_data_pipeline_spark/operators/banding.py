"""LSH banding planner — the parameter-selection tool in front of the
MinHash family (Leskovec/Rajaraman/Ullman, Mining of Massive Datasets
§3.4): for signature length n split into b bands of r rows, a pair with
Jaccard similarity s becomes a candidate with probability

    P(s; b, r) = 1 - (1 - s^r)^b

an S-curve whose midpoint sits near (1/b)^(1/r). Choosing (b, r) IS the
precision/recall dial of every banded operator in operators/dedup.py —
this module makes the choice auditable instead of folklore.

Driver-side pure arithmetic (like the token-budget planner): the inputs
are a handful of integers, never data. The measured-recall companion
lives in the dedup estimator tests (banded candidate recall on planted
pairs tracks these curves).
"""

from __future__ import annotations

from dataclasses import dataclass


def candidate_probability(s: float, bands: int, rows: int) -> float:
    """P(pair with Jaccard s is an LSH candidate) = 1 - (1 - s^r)^b."""
    if not 0.0 <= s <= 1.0:
        raise ValueError(f"similarity {s} outside [0, 1]")
    return 1.0 - (1.0 - s**rows) ** bands


def curve_midpoint(bands: int, rows: int) -> float:
    """The similarity where the S-curve rises steepest, ~(1/b)^(1/r) —
    the effective dedup threshold the (b, r) choice implements."""
    return (1.0 / bands) ** (1.0 / rows)


@dataclass(frozen=True)
class BandingChoice:
    bands: int
    rows: int
    midpoint: float
    p_at_threshold: float       # recall of true pairs AT the threshold
    p_at_low: float             # false-candidate rate at `low_sim`


def banding_plan(
    num_hashes: int,
    threshold: float,
    low_sim: float = 0.3,
) -> list[BandingChoice]:
    """Every exact (bands, rows) factorization of ``num_hashes``, scored
    at the target threshold and at a representative non-dup similarity —
    sorted by |midpoint - threshold| (the recommended choice first).
    Read it as: recall of true near-dups = ``p_at_threshold``; wasted
    candidate verifications scale with ``p_at_low``."""
    if num_hashes < 1:
        raise ValueError("num_hashes must be >= 1")
    out = []
    for rows in range(1, num_hashes + 1):
        if num_hashes % rows:
            continue
        bands = num_hashes // rows
        out.append(
            BandingChoice(
                bands=bands,
                rows=rows,
                midpoint=curve_midpoint(bands, rows),
                p_at_threshold=candidate_probability(threshold, bands, rows),
                p_at_low=candidate_probability(low_sim, bands, rows),
            )
        )
    return sorted(out, key=lambda c: (abs(c.midpoint - threshold), c.rows))


def recommend_banding(
    num_hashes: int,
    threshold: float,
    min_recall: float = 0.9,
    low_sim: float = 0.3,
) -> BandingChoice:
    """The sharpest factorization whose recall at the threshold still
    meets ``min_recall``: among qualifying choices, minimize the
    false-candidate rate at ``low_sim``; if none qualifies, fall back to
    the highest-recall choice (caller should raise num_hashes)."""
    plan = banding_plan(num_hashes, threshold, low_sim)
    ok = [c for c in plan if c.p_at_threshold >= min_recall]
    if ok:
        return min(ok, key=lambda c: (c.p_at_low, abs(c.midpoint - threshold)))
    return max(plan, key=lambda c: c.p_at_threshold)
