"""Stats-driven join-strategy advisor: broadcast vs sort-merge vs salted.

The repo ships three join executions — plain (Catalyst picks broadcast or
sort-merge from its size estimate), ``skew.salted_join`` (hand-salted for
hot keys), and AQE's runtime skew split (session default, pinned in
tests/test_aqe_skew.py). This module makes the CHOICE explicit and
testable, the way a pipeline author at 100 TB reasons before submitting:

1. read Catalyst's own size estimate for each side
   (``optimizedPlan().stats().sizeInBytes`` — plan-time, no job runs;
   includes whatever filters/pruning the plan already pushed down);
2. if the smaller side fits the broadcast budget → ``broadcast``;
3. else measure key skew on the FACT side with one cheap aggregate over
   the join key only (hottest-key share × partition count — the
   ``a_skew_report`` diagnostic, reduced to the one number that matters:
   the straggler multiple vs a uniform shuffle);
4. skew multiple over threshold → ``salted`` (pre-planned mitigation;
   AQE's split remains as the runtime backstop for skew this probe
   missed), else → ``sort_merge``.

``advise_join`` returns the decision WITH its evidence; ``apply_advice``
executes it. Deliberately no magic: the probe pass is one aggregate on
one column (at 100 TB: run it on the key histogram you profile anyway —
see operators/incremental_profile.py), and the decision thresholds are
arguments, not lore.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from g_data_pipeline_spark.operators.skew import salted_join

DEFAULT_BROADCAST_BYTES = 64 * 1024 * 1024  # matches session.py's threshold
DEFAULT_SKEW_MULTIPLE = 4.0


@dataclass(frozen=True)
class JoinAdvice:
    strategy: str  # 'broadcast' | 'sort_merge' | 'salted'
    reason: str
    left_bytes: int
    right_bytes: int
    skew_multiple: float | None  # None when the skew probe wasn't needed
    salt_buckets: int


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's plan-time size estimate (post filter/prune pushdown) —
    the same number its own broadcast decision uses. No job runs."""
    return int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )


def key_skew_multiple(df: DataFrame, key: str) -> float:
    """Straggler multiple of a shuffle on ``key``: hottest-key share ×
    shuffle partition count. 1.0 ≈ perfectly uniform; P means the hottest
    partition holds ≥ P× a uniform partition's rows, so the stage runs
    ~P× longer than balanced. One aggregate over the key column only."""
    row = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("hot"), F.sum("n").alias("total"))
        .collect()[0]
    )
    if not row["total"]:
        return 1.0
    parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return row["hot"] / row["total"] * parts


def advise_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    broadcast_bytes: int = DEFAULT_BROADCAST_BYTES,
    skew_multiple_threshold: float = DEFAULT_SKEW_MULTIPLE,
    salt_buckets: int = 16,
) -> JoinAdvice:
    lb, rb = plan_size_bytes(fact), plan_size_bytes(dim)
    if min(lb, rb) <= broadcast_bytes:
        return JoinAdvice(
            "broadcast",
            f"smaller side ~{min(lb, rb)}B fits the "
            f"{broadcast_bytes}B broadcast budget",
            lb, rb, None, salt_buckets,
        )
    skew = key_skew_multiple(fact, key)
    if skew >= skew_multiple_threshold:
        return JoinAdvice(
            "salted",
            f"hot key makes the straggler partition ~{skew:.1f}x a "
            f"uniform one (threshold {skew_multiple_threshold}x)",
            lb, rb, skew, salt_buckets,
        )
    return JoinAdvice(
        "sort_merge",
        f"both sides exceed the broadcast budget and skew multiple "
        f"{skew:.1f}x is under {skew_multiple_threshold}x",
        lb, rb, skew, salt_buckets,
    )


def apply_advice(
    fact: DataFrame, dim: DataFrame, key: str, advice: JoinAdvice,
    how: str = "inner",
) -> DataFrame:
    if advice.strategy == "broadcast":
        small_is_right = advice.right_bytes <= advice.left_bytes
        return (
            fact.join(F.broadcast(dim), key, how)
            if small_is_right
            else fact.hint("broadcast").join(dim, key, how)
        )
    if advice.strategy == "salted":
        return salted_join(
            fact, dim, key, salt_buckets=advice.salt_buckets, how=how
        )
    return fact.join(dim.hint("merge"), key, how)


def suggest_shuffle_partitions(
    df: DataFrame,
    target_partition_bytes: int = 128 * 1024 * 1024,
    min_partitions: int = 1,
    max_partitions: int = 200_000,
) -> int:
    """Shuffle-partition count sized from Catalyst's own estimate of the
    frame: ceil(plan bytes / target). The number that matters when AQE is
    OFF, and the sane UPPER bound to hand AQE's coalescing when it is on
    (initialPartitionNum). 128 MB targets match the default
    maxPartitionBytes so shuffle partitions land near scan partitions.
    Clamped: one empty-frame estimate must not configure 0 partitions,
    one petabyte estimate must not request 10^7 tasks."""
    est = plan_size_bytes(df)
    want = -(-est // target_partition_bytes)  # ceil div
    return int(max(min_partitions, min(max_partitions, want)))


# ---------------------------------------------------------------------------
# Count-min-sketch frequency / join-cardinality estimation
# (Cormode & Muthukrishnan 2005, "An improved data stream summary: the
# count-min sketch and its applications" — point query + inner product).
# ---------------------------------------------------------------------------

_CMS_PRIME = (1 << 31) - 1


def cms_sketch(
    df: DataFrame,
    key: str,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> bytes:
    """ONE aggregate pass over ``key`` → a count-min sketch binary of
    ~``depth × (2/eps)`` longs (8 KB at eps=0.01; 2 MB at eps=0.001).
    ``count_min_sketch`` is a true ImperativeAggregate — partials merge
    map-side, so at 100 TB this is a scan + tiny combine, no shuffle of
    the data. Same ``(eps, confidence, seed)`` on two tables ⇒ identical
    hash functions ⇒ their sketches are inner-product comparable
    (:func:`cms_join_size_estimate`)."""
    return df.agg(
        F.count_min_sketch(
            key, F.lit(float(eps)), F.lit(float(confidence)), F.lit(int(seed))
        ).alias("s")
    ).collect()[0]["s"]


def _cms_parse(b: bytes):
    """Spark serialization (org.apache.spark.util.sketch.CountMinSketchImpl
    version 1, big-endian): int version, long totalCount, int depth, int
    width, long hashA[depth], long table[depth][width]."""
    import struct

    ver, = struct.unpack_from(">i", b, 0)
    if ver != 1:
        raise ValueError(f"unsupported CountMinSketch version {ver}")
    total, = struct.unpack_from(">q", b, 4)
    depth, = struct.unpack_from(">i", b, 12)
    width, = struct.unpack_from(">i", b, 16)
    hash_a = struct.unpack_from(f">{depth}q", b, 20)
    off = 20 + depth * 8
    table = [
        struct.unpack_from(f">{width}q", b, off + i * width * 8)
        for i in range(depth)
    ]
    return total, depth, width, hash_a, table


def cms_total_count(sketch: bytes) -> int:
    return _cms_parse(sketch)[0]


def cms_point_estimate(sketch: bytes, keys: "list[int]") -> "dict[int, int]":
    """Upper-bound frequency estimates for INTEGRAL keys: true ≤ est, and
    est ≤ true + eps·N with probability ≥ confidence (per key). Mirrors
    the JVM's integral-key hashing (stream-lib lineage: h = hashA·x,
    folded high 32 bits, mod 2³¹-1, mod width) — pinned exact-on-planted
    by test so a format change fails loudly, not silently."""
    _, depth, width, hash_a, table = _cms_parse(sketch)
    out = {}
    for x in keys:
        vals = []
        for i in range(depth):
            h = (hash_a[i] * int(x)) & 0xFFFFFFFFFFFFFFFF
            h = (h + (h >> 32)) & _CMS_PRIME
            vals.append(table[i][h % width])
        out[int(x)] = min(vals)
    return out


def cms_join_size_estimate(a: bytes, b: bytes) -> int:
    """Inner-join OUTPUT-row estimate from two sketches built with the
    same (eps, confidence, seed): |A ⋈ B| = Σₖ fₐ(k)·f_b(k) ≈ min over
    rows of the row-wise table dot product. Always an UPPER bound;
    overshoot ≤ eps·|A|·|B| with probability ≥ confidence.

    The 100 TB use: decide — BEFORE submitting a multi-hour join — whether
    the output explodes (many-to-many hot keys) or stays bounded, from two
    scan-only sketch passes and a driver-side dot product. Works for ANY
    key type Spark's sketch accepts (the hash never needs re-deriving —
    both sides used the same one); complements :func:`advise_join`, which
    reasons about input sizes but not output cardinality."""
    ta, da, wa, ha, tab_a = _cms_parse(a)
    tb, db, wb, hb, tab_b = _cms_parse(b)
    if (da, wa, ha) != (db, wb, hb):
        raise ValueError(
            "sketches are not comparable: built with different "
            f"eps/confidence/seed (depth {da}x{wa} vs {db}x{wb}, "
            f"hash families {'match' if ha == hb else 'differ'})"
        )
    return min(
        sum(x * y for x, y in zip(ra, rb))
        for ra, rb in zip(tab_a, tab_b)
    )
