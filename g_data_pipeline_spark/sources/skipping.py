"""File/row-group skipping report: measure what clustering buys a scan.

Parquet readers (Spark's included) prune row groups whose footer min/max
statistics cannot satisfy a predicate — the mechanism Z-order /
range-clustered compaction (sources/compact.py) exists to feed. This
module makes that effect MEASURABLE instead of anecdotal: read only the
FOOTERS (pyarrow; bytes read ~KB per file, never data pages) and report,
for a given single-column range predicate, how many row groups / rows /
bytes a min/max-pruning reader must touch.

Use it to answer, with numbers, "did this layout help": run the same
report against the unclustered and clustered copies and compare
``selected_fraction``. tests/test_skipping.py pins the expected outcome
(random layout → every row group overlaps a narrow range → fraction ~1;
range-clustered layout → fraction collapses toward the selectivity).

Driver-side cost: one footer read per file — O(#files) metadata ops, no
Spark job. At 100 TB table scale run it on a file SAMPLE or keep the
per-file min/max in a manifest table (the stats-dataset pattern again).
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass(frozen=True)
class SkippingReport:
    predicate: str
    total_files: int
    total_row_groups: int
    total_rows: int
    total_bytes: int  # compressed data-page bytes across all row groups
    selected_files: int
    selected_row_groups: int
    selected_rows: int
    selected_bytes: int

    @property
    def selected_fraction(self) -> float:
        """Fraction of ROWS a min/max-pruning reader must scan."""
        return self.selected_rows / self.total_rows if self.total_rows else 0.0


def _parquet_files(path: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        out += [
            os.path.join(root, f)
            for f in files
            if f.endswith(".parquet") and not f.startswith("_")
        ]
    return sorted(out)


def range_skipping_report(path: str, col: str, lo, hi) -> SkippingReport:
    """Row groups whose [min, max] envelope intersects ``[lo, hi]`` —
    exactly the pruning decision a stats-aware reader makes. Null-only or
    stats-less row groups count as selected (a reader cannot skip what it
    cannot bound)."""
    import pyarrow.parquet as pq

    tf = trg = trows = tbytes = sf = srg = srows = sbytes = 0
    for fpath in _parquet_files(path):
        meta = pq.ParquetFile(fpath).metadata
        file_hit = False
        tf += 1
        for g in range(meta.num_row_groups):
            rg = meta.row_group(g)
            idx = {
                rg.column(i).path_in_schema: i for i in range(rg.num_columns)
            }
            stats = (
                rg.column(idx[col]).statistics if col in idx else None
            )
            trg += 1
            trows += rg.num_rows
            gbytes = sum(
                rg.column(i).total_compressed_size
                for i in range(rg.num_columns)
            )
            tbytes += gbytes
            selected = (
                stats is None
                or not stats.has_min_max
                or (stats.min <= hi and stats.max >= lo)
            )
            if selected:
                file_hit = True
                srg += 1
                srows += rg.num_rows
                sbytes += gbytes
        if file_hit:
            sf += 1
    return SkippingReport(
        predicate=f"{lo} <= {col} <= {hi}",
        total_files=tf,
        total_row_groups=trg,
        total_rows=trows,
        total_bytes=tbytes,
        selected_files=sf,
        selected_row_groups=srg,
        selected_rows=srows,
        selected_bytes=sbytes,
    )


@dataclass(frozen=True)
class FileBalanceReport:
    """Output-layout health: how evenly a dataset's bytes/rows spread
    across its files. ``skew_factor`` (max/mean rows) is the write-side
    twin of the key-skew factor in a_skew_report — a 50× file means one
    task reads 50× the data of the average task downstream."""

    n_files: int
    total_rows: int
    total_bytes: int  # compressed data-page bytes
    max_rows: int
    mean_rows: float
    skew_factor: float  # max_rows / mean_rows (1.0 = perfectly even)
    cv_rows: float  # stddev/mean of per-file rows (population)
    n_small_files: int  # files below small_bytes
    small_bytes_threshold: int


def file_balance_report(
    path: str, small_bytes: int = 1 << 20
) -> FileBalanceReport:
    """Per-file row/byte balance from parquet FOOTERS only (same O(#files)
    metadata-cost contract as range_skipping_report — no data pages, no
    Spark job). Diagnoses the two classic write pathologies compact.py
    exists to fix: SKEWED files (one giant part from a hot partition →
    straggler tasks downstream) and SMALL files (metadata overhead, seen
    as n_small_files). Run after large writes; alert on skew_factor or
    n_small_files drift."""
    import statistics

    import pyarrow.parquet as pq

    rows_per_file: list[int] = []
    bytes_per_file: list[int] = []
    for fpath in _parquet_files(path):
        meta = pq.ParquetFile(fpath).metadata
        rows_per_file.append(meta.num_rows)
        bytes_per_file.append(
            sum(
                meta.row_group(g).column(i).total_compressed_size
                for g in range(meta.num_row_groups)
                for i in range(meta.row_group(g).num_columns)
            )
        )
    n = len(rows_per_file)
    total_rows = sum(rows_per_file)
    mean_rows = total_rows / n if n else 0.0
    return FileBalanceReport(
        n_files=n,
        total_rows=total_rows,
        total_bytes=sum(bytes_per_file),
        max_rows=max(rows_per_file, default=0),
        mean_rows=mean_rows,
        skew_factor=(
            max(rows_per_file) / mean_rows if n and mean_rows > 0 else 0.0
        ),
        cv_rows=(
            statistics.pstdev(rows_per_file) / mean_rows
            if n and mean_rows > 0
            else 0.0
        ),
        n_small_files=sum(1 for b in bytes_per_file if b < small_bytes),
        small_bytes_threshold=small_bytes,
    )
