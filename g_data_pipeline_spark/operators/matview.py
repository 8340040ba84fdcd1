"""Incremental materialized-view maintenance for algebraic rollups.

A 100 TB fact table's standing rollup (daily revenue per nation, events
per user per week, …) must not be recomputed from history on every
ingest. For ALGEBRAIC aggregates — count, sum, min, max, and anything
derivable from them (mean, stddev via moments) — the state itself is
mergeable: ``state ⊎ agg(batch)`` re-aggregated BY KEY equals the
aggregate over all facts ever seen. This module maintains exactly that:

- :func:`aggregate_batch` — one keyed aggregate over the new batch only.
- :func:`merge_states` — union of old state + batch partial, re-folded
  by key: sums add, counts add, min/max fold. Cost is O(|state| +
  |batch partial|), independent of fact history.
- :class:`MatView` — the on-disk loop: versioned snapshot directories
  (``v=N``), refresh reads latest + folds + writes ``v=N+1`` (never
  overwrites what it reads — the self-overwrite hazard of parquet), and
  readers always see a complete snapshot.

Sums accumulate as DECIMAL(38,6): exact, associative, so the maintained
view is BIT-EQUAL to a full recompute at any point (pinned by test) —
the same determinism contract as functions/deterministic.py. Deletes/
updates are out of scope by design (append-only facts); route mutable
keys through operators/cdc.py first and treat its output as the batch.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SUM_T = "decimal(27,6)"
_ACC_T = "decimal(38,6)"


@dataclass(frozen=True)
class RollupSpec:
    keys: list[str]
    sums: dict[str, str] = field(default_factory=dict)  # alias -> input col
    mins: dict[str, str] = field(default_factory=dict)
    maxs: dict[str, str] = field(default_factory=dict)
    count_alias: str = "n"


def aggregate_batch(batch: DataFrame, spec: RollupSpec) -> DataFrame:
    aggs = [F.count(F.lit(1)).alias(spec.count_alias)]
    aggs += [
        F.sum(F.col(c).cast(_SUM_T)).cast(_ACC_T).alias(a)
        for a, c in spec.sums.items()
    ]
    aggs += [F.min(c).alias(a) for a, c in spec.mins.items()]
    aggs += [F.max(c).alias(a) for a, c in spec.maxs.items()]
    return batch.groupBy(*spec.keys).agg(*aggs)


def merge_states(old: DataFrame, fresh: DataFrame, spec: RollupSpec) -> DataFrame:
    both = old.unionByName(fresh)
    aggs = [F.sum(spec.count_alias).cast("bigint").alias(spec.count_alias)]
    aggs += [F.sum(a).cast(_ACC_T).alias(a) for a in spec.sums]
    aggs += [F.min(a).alias(a) for a in spec.mins]
    aggs += [F.max(a).alias(a) for a in spec.maxs]
    return both.groupBy(*spec.keys).agg(*aggs)


def vacuum_snapshots(path: str, keep_last: int = 2) -> list[int]:
    """Retention for a versioned snapshot store (``v=N`` dirs with parquet
    ``_SUCCESS`` commit markers — the layout shared by :class:`MatView`,
    ``streaming_merge_sink`` and ``streaming_rollup_sink``): delete all
    but the newest ``keep_last`` COMMITTED versions; return the versions
    removed.

    Safety contract:
    - the newest committed version is never deleted (``keep_last`` is
      clamped to ≥ 1), so readers taking max-committed never lose their
      snapshot;
    - UNCOMMITTED dirs (no ``_SUCCESS``) are left untouched — one may be
      an in-flight write or an epoch replay about to commit; deleting
      under it would race. Crash garbage is bounded (a replay of the same
      version overwrites its own dir) and a later vacuum reaps it once
      committed and aged out.

    Version numbering is monotonic across vacuums: discovery takes the
    max surviving committed version, so a refresh after vacuum continues
    at N+1, never reuses a reaped number.
    """
    import shutil

    if keep_last < 1:
        keep_last = 1
    committed = sorted(
        int(d.split("=", 1)[1])
        for d in (os.listdir(path) if os.path.isdir(path) else [])
        if re.fullmatch(r"v=\d+", d)
        and os.path.exists(os.path.join(path, d, "_SUCCESS"))
    )
    reaped = committed[:-keep_last]
    for v in reaped:
        shutil.rmtree(os.path.join(path, f"v={v}"))
    return reaped


class MatView:
    """Versioned on-disk rollup. ``refresh(batch)`` folds the batch in
    and commits a new snapshot version; ``read()`` returns the latest
    committed snapshot."""

    def __init__(self, spark: SparkSession, path: str, spec: RollupSpec):
        self.spark = spark
        self.path = path
        self.spec = spec

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.path):
            return []
        out = []
        for d in os.listdir(self.path):
            m = re.fullmatch(r"v=(\d+)", d)
            # only versions with a parquet _SUCCESS marker are committed
            if m and os.path.exists(
                os.path.join(self.path, d, "_SUCCESS")
            ):
                out.append(int(m.group(1)))
        return sorted(out)

    def versions(self) -> list[int]:
        """Committed snapshot versions, oldest first — the time-travel
        axis. Only ``_SUCCESS``-marked versions appear (an in-flight or
        crashed refresh is invisible here)."""
        return self._versions()

    def read(self, version: int | None = None) -> DataFrame | None:
        """Latest committed snapshot, or — time travel — the committed
        snapshot at ``version``. Old versions stay readable until
        :func:`vacuum_snapshots` reaps them; reading a vacuumed or
        never-committed version raises with the available range rather
        than resurrecting a partial directory."""
        vs = self._versions()
        if not vs:
            if version is not None:
                raise ValueError(f"no committed versions at {self.path}")
            return None
        if version is None:
            version = vs[-1]
        elif version not in vs:
            raise ValueError(
                f"version {version} not committed at {self.path}; "
                f"available: {vs}"
            )
        return self.spark.read.parquet(f"{self.path}/v={version}")

    def refresh(self, batch: DataFrame) -> int:
        """Fold ``batch`` into the view; returns the committed version.
        Reads v=N, writes v=N+1 — the read and the write never share a
        directory, so a crashed refresh leaves the old snapshot intact
        (no _SUCCESS → next refresh ignores the partial write)."""
        fresh = aggregate_batch(batch, self.spec)
        old = self.read()
        merged = fresh if old is None else merge_states(old, fresh, self.spec)
        next_v = (self._versions() or [-1])[-1] + 1
        merged.write.mode("overwrite").parquet(f"{self.path}/v={next_v}")
        return next_v


def changes_between(
    view: "MatView", v_from: int, v_to: int
) -> DataFrame:
    """Change data feed between two committed snapshots — which rollup
    keys appeared, changed state, or (impossible under append-only facts,
    but surfaced defensively) disappeared between ``v_from`` and ``v_to``.
    Downstream consumers (alerting, cache invalidation, reverse ETL) read
    this instead of diffing full snapshots themselves — and because it
    composes `read(version=…)` time travel with one keyed full-outer join
    of two STATE tables, its cost is O(|state|), independent of how many
    fact batches landed between the versions.

    Returns the v_to state columns plus ``change_type`` ∈
    ('insert', 'update', 'delete'); unchanged keys are omitted. For
    'delete' rows the v_from state columns are returned instead (there is
    no v_to row to show)."""
    old = view.read(version=v_from)
    new = view.read(version=v_to)
    keys = view.spec.keys
    vals = [c for c in new.columns if c not in keys]
    o = old.select(
        *keys, *[F.col(c).alias(f"__o_{c}") for c in vals]
    )
    n = new.select(*keys, *vals)
    joined = n.join(o, keys, "full_outer")
    # count_alias is non-null in every state row, so its side-presence
    # distinguishes insert/delete without a separate marker column
    has_old = F.col(f"__o_{view.spec.count_alias}").isNotNull()
    has_new = F.col(view.spec.count_alias).isNotNull()
    changed = F.lit(False)
    for c in vals:
        changed = changed | ~F.col(c).eqNullSafe(F.col(f"__o_{c}"))
    out = joined.withColumn(
        "change_type",
        F.when(~has_old, F.lit("insert"))
        .when(~has_new, F.lit("delete"))
        .when(changed, F.lit("update")),
    ).filter(F.col("change_type").isNotNull())
    # delete rows: surface the v_from state in the value columns
    final_vals = [
        F.when(
            F.col("change_type") == "delete", F.col(f"__o_{c}")
        )
        .otherwise(F.col(c))
        .alias(c)
        for c in vals
    ]
    return out.select(*keys, *final_vals, "change_type")
