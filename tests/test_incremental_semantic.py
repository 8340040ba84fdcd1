"""Incremental semantic dedup (operators/incremental_semantic.py):
planted cross-dump and within-batch duplicates, boundary recall via
n_probe, replay stability against an absorbed delta, a pure-Python
(numpy) decision twin, and the exactly-once streaming form."""

from __future__ import annotations

import math

from g_data_pipeline_spark.operators.incremental_semantic import (
    embedding_cell_archive,
    incremental_semantic_dedup,
    semantic_dedup_stream,
)

TAU = 0.95
SCHEMA = "vec_id long, embedding array<float>"


def _mk(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], SCHEMA
    )


def _cents(spark):
    return spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "cell long, c_vec array<float>",
    )


B0 = [(1, [1.0, 0.05, 0.0, 0.0]), (2, [0.05, 1.0, 0.0, 0.0])]
B1 = [
    (10, [1.0, 0.06, 0.0, 0.0]),    # near-dup of archived 1
    (11, [0.707, 0.707, 0.0, 0.0]),  # boundary vector, clean
    (12, [0.70, 0.714, 0.0, 0.0]),   # within-batch dup of 11
    (13, [0.0, 0.0, 1.0, 0.0]),      # orthogonal to everything
]


def _labels(df):
    return sorted(
        (r.id, r.n_dup_neighbors, r.is_dup) for r in df.collect()
    )


def test_planted_cross_dump_and_batch_dups(spark):
    cents = _cents(spark)
    empty = spark.createDataFrame(
        [], "cell long, vec_id long, embedding array<float>"
    )
    l0, d0 = incremental_semantic_dedup(
        _mk(spark, B0), empty, cents, TAU, n_probe=2
    )
    assert _labels(l0) == [(1, 0, False), (2, 0, False)]
    archive = empty.unionByName(d0)
    l1, d1 = incremental_semantic_dedup(
        _mk(spark, B1), archive, cents, TAU, n_probe=2
    )
    assert _labels(l1) == [
        (10, 1, True),
        (11, 0, False),
        (12, 1, True),
        (13, 0, False),
    ]
    # only survivors extend the archive
    assert {r.vec_id for r in d1.collect()} == {11, 13}


def test_replay_against_absorbed_delta_labels_identically(spark):
    cents = _cents(spark)
    empty = spark.createDataFrame(
        [], "cell long, vec_id long, embedding array<float>"
    )
    _, d0 = incremental_semantic_dedup(
        _mk(spark, B0), empty, cents, TAU, n_probe=2
    )
    archive = empty.unionByName(d0)
    l1, d1 = incremental_semantic_dedup(
        _mk(spark, B1), archive, cents, TAU, n_probe=2
    )
    first = _labels(l1)
    absorbed = archive.unionByName(d1)
    l2, d2 = incremental_semantic_dedup(
        _mk(spark, B1), absorbed, cents, TAU, n_probe=2
    )
    assert _labels(l2) == first
    assert d2.count() == 0


def test_replay_stable_when_probe_sets_diverge(spark):
    """3 cells, n_probe=2, near-dup pairs whose centroid rankings
    DIVERGE — the edge a round-7 advisory claimed breaks replay
    stability (it does not: a survivor's top-1 cell is always a SHARED
    probed cell of any batch doc that probes it, so the shared-cell
    batch pass covers every neighbor the absorbed archive can later
    reveal — see the module docstring's proof). Case A also proves the
    advisory's suggested fix (key batch neighbors by top-1 cell only)
    would itself break: doc 2's top-1 cell c1 IS in doc 1's probes
    while doc 1's top-1 cell c0 is NOT in doc 2's — under top-1-only
    visibility both docs survive round one and doc 1 flips on replay.
    Case B shares only both docs' SECOND-ranked cell (neither top-1 in
    the other's probes), exercising pure probes-x-probes visibility."""
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]), (2, [0.0, 0.0, 1.0])],
        "cell long, c_vec array<float>",
    )
    schema = "vec_id long, embedding array<float>"
    cases = [
        # (batch rows, tau, expected sorted labels)
        (
            [(1, [0.72, 0.70, 0.05]),   # top1 c0, probes {c0,c1}
             (2, [0.60, 0.72, 0.65])],  # top1 c1, probes {c1,c2}; cos=0.8445
            0.8,
            [(1, 0, False), (2, 1, True)],
        ),
        (
            [(1, [0.75, 0.62, 0.40]),   # probes {c0,c1}
             (2, [0.40, 0.62, 0.75])],  # probes {c2,c1}; cos=0.8893
            0.85,
            [(1, 0, False), (2, 1, True)],
        ),
    ]
    for rows, tau, expected in cases:
        batch = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in rows], schema
        )
        empty = spark.createDataFrame(
            [], "cell long, vec_id long, embedding array<float>"
        )
        l0, d0 = incremental_semantic_dedup(
            batch, empty, cents, tau, n_probe=2
        )
        assert _labels(l0) == expected
        # only doc 1 survives; archived under its top-1 cell
        assert [(r.cell, r.vec_id) for r in d0.collect()] == [(0, 1)]
        absorbed = empty.unionByName(d0)
        l1, d1 = incremental_semantic_dedup(
            batch, absorbed, cents, tau, n_probe=2
        )
        assert _labels(l1) == expected  # labels replay bit-identically
        assert d1.count() == 0          # replayed delta is empty


def _twin(batch, archive, cents, tau, n_probe):
    """Pure-Python decision twin: same probing and neighbor rules."""

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(
            sum(x * x for x in b)
        )
        return num / den

    def probes(v):
        ranked = sorted(
            ((cos(v, cv), -c) for c, cv in cents), key=lambda t: (-t[0], -t[1])
        )
        return [-t[1] for t in ranked[:n_probe]]

    arch_cells = {}
    for c, vid, v in archive:
        arch_cells.setdefault(c, []).append((vid, v))
    out = {}
    for i, v in batch:
        nbrs = set()
        cells = probes(v)
        for c in cells:
            for vid, av in arch_cells.get(c, []):
                if vid != i and cos(v, av) >= tau:
                    nbrs.add(vid)
        for j, w in batch:
            if j < i and set(probes(w)) & set(cells) and cos(v, w) >= tau:
                nbrs.add(j)
        out[i] = (len(nbrs), bool(nbrs))
    return sorted((i, n, d) for i, (n, d) in out.items())


def test_matches_python_twin(spark):
    # deterministic spread: a ring of directions in the (x, y) plane plus
    # jittered copies every third vector (the planted near-dups)
    batch = []
    for i in range(12):
        a = 2.0 * math.pi * i / 12.0
        v = [math.cos(a), math.sin(a), 0.1 * (i % 3), 0.05 * i]
        batch.append((20 + i, v))
        if i % 3 == 0:
            batch.append((40 + i, [x * 1.01 + 0.001 for x in v]))
    cents_rows = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])]
    archive_rows = [(0, 1, [0.99, 0.01, 0.0, 0.0])]
    cents = spark.createDataFrame(
        cents_rows, "cell long, c_vec array<float>"
    )
    archive = spark.createDataFrame(
        [(c, i, [float(x) for x in v]) for c, i, v in archive_rows],
        "cell long, vec_id long, embedding array<float>",
    )
    labeled, _ = incremental_semantic_dedup(
        _mk(spark, batch), archive, cents, 0.99, n_probe=2
    )
    # float32 storage: recompute the twin on float32-rounded vectors
    import struct

    f32 = lambda v: [struct.unpack("f", struct.pack("f", x))[0] for x in v]  # noqa: E731
    twin = _twin(
        [(i, f32(v)) for i, v in batch],
        [(c, i, f32(v)) for c, i, v in archive_rows],
        [(c, f32(v)) for c, v in cents_rows],
        0.99,
        2,
    )
    assert _labels(labeled) == twin


def test_streaming_twin_exactly_once(spark, tmp_path):
    from g_data_pipeline_spark.sources import txn

    cents = _cents(spark)
    src = tmp_path / "src"
    _mk(spark, B0).write.mode("overwrite").parquet(str(src / "batch=0"))
    arch_table = str(tmp_path / "embedding_archive")
    out_table = str(tmp_path / "labeled")
    ckpt = str(tmp_path / "ckpt")

    def _run():
        stream = spark.readStream.schema(SCHEMA).parquet(str(src / "batch=*"))
        return semantic_dedup_stream(
            stream, cents, arch_table, out_table, ckpt,
            threshold=TAU, n_probe=2, timeout_s=240,
        )

    apply_batch = _run()
    _mk(spark, B1).write.mode("overwrite").parquet(str(src / "batch=1"))
    apply_batch = _run()

    labeled = {
        r.id: r.is_dup for r in txn.read_committed(spark, out_table).collect()
    }
    assert labeled == {1: False, 2: False, 10: True, 11: False, 12: True, 13: False}
    v_arch = txn.latest_version(spark, arch_table)
    v_out = txn.latest_version(spark, out_table)
    # simulated replays: byte-stable, version-stable
    apply_batch(_mk(spark, B1), 1)
    apply_batch(_mk(spark, B0), 0)
    assert txn.latest_version(spark, arch_table) == v_arch
    assert txn.latest_version(spark, out_table) == v_out
    assert len(txn.read_committed(spark, out_table).collect()) == 6


def test_embedding_archive_maintenance_preserves_dedup(spark, tmp_path):
    """The embedding archive is an ever-growing manifest table like the
    band/window directories: after several dumps, maintain_table
    compacts + retains without changing any future labeling decision."""
    from g_data_pipeline_spark.sources import txn

    cents = _cents(spark)
    arch_table = str(tmp_path / "embedding_archive")
    # seed several appends so the snapshot fragments across versions
    empty = spark.createDataFrame(
        [], "cell long, vec_id long, embedding array<float>"
    )
    archive = empty
    for k, batch in enumerate((B0, B1)):
        labeled, delta = incremental_semantic_dedup(
            _mk(spark, batch), archive, cents, TAU, n_probe=2
        )
        txn.commit_write(
            spark, delta, arch_table, run_id=f"dump-{k}", mode="append"
        )
        archive = txn.read_committed(spark, arch_table)

    before = sorted(
        (r.cell, r.vec_id) for r in txn.read_committed(spark, arch_table).collect()
    )
    rep = txn.maintain_table(
        spark, arch_table, retain_versions=1, max_files=1
    )
    after_tbl = txn.read_committed(spark, arch_table)
    after = sorted((r.cell, r.vec_id) for r in after_tbl.collect())
    assert after == before, rep

    # a probe batch labels identically against the maintained archive
    probe = [(99, [1.0, 0.055, 0.0, 0.0])]  # near-dup of archived 1
    labeled, _ = incremental_semantic_dedup(
        _mk(spark, probe), after_tbl, cents, TAU, n_probe=2
    )
    assert _labels(labeled) == [(99, 1, True)]
