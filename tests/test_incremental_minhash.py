"""incremental_minhash_dedup: new crawl dumps vs a growing MinHash-LSH
band-bucket archive — planted near-dup recall, a pure-Python twin of the
one-pass decision rule (archive hit / bucket-min survivorship), the
delta append algebra, replay idempotence of the labels, and the
exactly-once streaming twin over manifest tables."""

from __future__ import annotations

from g_data_pipeline_spark.operators.dedup import (
    _minhash_band_rows,
    incremental_minhash_dedup,
    minhash_band_directory,
    shingle_sets,
)

NH, NB = 16, 8  # 8 bands of r=2: high candidate recall at 0.5 similarity


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _labels(df):
    return {
        r.id: (r.n_buckets, r.n_dup_buckets, r.is_dup) for r in df.collect()
    }


def _band_rows(spark, rows):
    sets = shingle_sets(_mk(spark, rows), "doc_id", "text", 3).filter(
        "set_size > 0"
    )
    out = {}
    for r in _minhash_band_rows(sets, NH, NB).collect():
        out.setdefault(r.id, set()).add((r.band, r.bucket))
    return out


def _python_twin(band_rows_by_doc, directory):
    """The operator's decision rule, sequentially in Python: archive hit
    = bucket in directory with another owner; batch hit = bucket's min
    batch id < own id (over ALL batch docs). Returns labels + the
    survivor delta."""
    bucket_min: dict[tuple, int] = {}
    for i, bks in band_rows_by_doc.items():
        for bk in bks:
            bucket_min[bk] = min(bucket_min.get(bk, i), i)
    labels, delta = {}, {}
    for i, bks in band_rows_by_doc.items():
        hits = sum(
            1
            for bk in bks
            if (bk in directory and directory[bk] != i)
            or bucket_min[bk] < i
        )
        labels[i] = (len(bks), hits, hits > 0)
    for i, bks in band_rows_by_doc.items():
        if labels[i][2]:
            continue
        for bk in bks:
            if bk not in directory:
                delta[bk] = min(delta.get(bk, i), i)
    return labels, delta


def _doc(words):
    return " ".join(words)


def _corpus_words(seed, n):
    return [f"w{seed}x{k}" for k in range(n)]


def test_planted_near_dup_across_dumps_flagged(spark):
    base = _corpus_words("a", 40)
    near = list(base)
    near[3] = "CHANGED"  # ~97% shingle overlap with base
    novel = _corpus_words("z", 40)
    dump1 = [(1, _doc(base)), (2, _doc(_corpus_words("b", 40)))]
    dump2 = [(10, _doc(near)), (11, _doc(novel))]
    directory = minhash_band_directory(
        _mk(spark, dump1), "doc_id", "text", 3, NH, NB
    )
    labeled, delta = incremental_minhash_dedup(
        _mk(spark, dump2), directory, "doc_id", "text", 3, NH, NB
    )
    got = _labels(labeled)
    assert got[10][2] is True, "near-dup of an archived doc must flag"
    assert got[11][2] is False, "novel doc must survive"
    # delta carries only the survivor's buckets, none already archived
    dir_keys = {(r.band, r.bucket) for r in directory.collect()}
    delta_rows = delta.collect()
    assert delta_rows, "survivor must extend the archive"
    assert all((r.band, r.bucket) not in dir_keys for r in delta_rows)
    assert all(r.owner_id == 11 for r in delta_rows)


def test_matches_python_twin_on_two_real_dumps(spark):
    from g_data_pipeline_spark.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    rows = [(r.doc_id, r.text) for r in docs.limit(120).collect()]
    dump1 = [t for t in rows if t[0] % 2 == 0]
    dump2 = [t for t in rows if t[0] % 2 == 1]

    directory = minhash_band_directory(
        _mk(spark, dump1), "doc_id", "text", 3, NH, NB
    )
    labeled, delta = incremental_minhash_dedup(
        _mk(spark, dump2), directory, "doc_id", "text", 3, NH, NB
    )

    dir_py = {
        (r.band, r.bucket): r.owner_id for r in directory.collect()
    }
    want_labels, want_delta = _python_twin(
        _band_rows(spark, dump2), dir_py
    )
    got = _labels(labeled)
    # total labeling: every dump2 doc present; short docs 0/0/False
    assert set(got) == {i for i, _ in dump2}
    for i, lab in want_labels.items():
        assert got[i] == lab, f"doc {i}: {got[i]} != twin {lab}"
    got_delta = {
        (r.band, r.bucket): r.owner_id for r in delta.collect()
    }
    assert got_delta == want_delta


def test_replay_against_absorbed_delta_labels_identically(spark):
    """History-wins idempotence: re-running a dump against a directory
    that already absorbed its own delta must produce byte-identical
    labels (self-owned buckets are ignored; first-run batch hits become
    archive hits with the same count)."""
    base = _corpus_words("a", 40)
    near = list(base)
    near[5] = "EDIT"
    dump = [(20, _doc(base)), (21, _doc(near)), (22, _doc(_corpus_words("q", 40)))]
    empty = minhash_band_directory(
        _mk(spark, []), "doc_id", "text", 3, NH, NB
    )
    labeled1, delta1 = incremental_minhash_dedup(
        _mk(spark, dump), empty, "doc_id", "text", 3, NH, NB
    )
    first = _labels(labeled1)
    absorbed = empty.unionByName(delta1)
    labeled2, delta2 = incremental_minhash_dedup(
        _mk(spark, dump), absorbed, "doc_id", "text", 3, NH, NB
    )
    assert _labels(labeled2) == first
    # and the replay's delta adds nothing new
    assert delta2.count() == 0


def test_directory_grows_only_by_survivors(spark):
    dup_of_1 = _corpus_words("a", 40)
    dump1 = [(1, _doc(dup_of_1))]
    dump2 = [(30, _doc(dup_of_1)), (31, _doc(_corpus_words("n", 40)))]
    directory = minhash_band_directory(
        _mk(spark, dump1), "doc_id", "text", 3, NH, NB
    )
    labeled, delta = incremental_minhash_dedup(
        _mk(spark, dump2), directory, "doc_id", "text", 3, NH, NB
    )
    got = _labels(labeled)
    assert got[30][2] is True  # exact dup -> every bucket hits
    assert got[30][1] == got[30][0]
    # dropped doc's buckets never enter the archive
    owners = {r.owner_id for r in delta.collect()}
    assert owners == {31}


def test_streaming_twin_exactly_once(spark, tmp_path):
    """Two micro-batches through manifest tables, then a simulated replay
    of each: commits no-op on their run_ids, the directory version stays
    put, and the labeled output holds exactly one row per doc."""
    from g_data_pipeline_spark.sources import txn
    from g_data_pipeline_spark.streaming.pipelines import (
        minhash_dedup_stream,
    )

    base = _corpus_words("a", 40)
    near = list(base)
    near[7] = "EDITED"
    b0 = [(1, _doc(base)), (2, _doc(_corpus_words("b", 40)))]
    b1 = [(10, _doc(near)), (11, _doc(_corpus_words("z", 40)))]

    src = tmp_path / "src"
    _mk(spark, b0).write.mode("overwrite").parquet(str(src / "batch=0"))
    dir_table = str(tmp_path / "band_directory")
    out_table = str(tmp_path / "labeled")
    ckpt = str(tmp_path / "ckpt")

    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src / "batch=*")
    )
    apply_batch = minhash_dedup_stream(
        stream, dir_table, out_table, ckpt,
        num_hashes=NH, bands=NB, timeout_s=240,
    )
    _mk(spark, b1).write.mode("overwrite").parquet(str(src / "batch=1"))
    stream2 = spark.readStream.schema("doc_id long, text string").parquet(
        str(src / "batch=*")
    )
    apply_batch = minhash_dedup_stream(
        stream2, dir_table, out_table, ckpt,
        num_hashes=NH, bands=NB, timeout_s=240,
    )

    labeled = {
        r.id: r.is_dup
        for r in txn.read_committed(spark, out_table).collect()
    }
    assert labeled == {1: False, 2: False, 10: True, 11: False}
    v_dir = txn.latest_version(spark, dir_table)
    v_out = txn.latest_version(spark, out_table)

    # simulated replays of both epochs: byte-stable, version-stable
    apply_batch(_mk(spark, b1), 1)
    apply_batch(_mk(spark, b0), 0)
    assert txn.latest_version(spark, dir_table) == v_dir
    assert txn.latest_version(spark, out_table) == v_out
    rows = txn.read_committed(spark, out_table).collect()
    assert len(rows) == 4


# ---- SimHash twin (shared decision core) ----------------------------------

def _sim_band_rows(spark, rows, bands=8, bits=32):
    from g_data_pipeline_spark.operators.dedup import _simhash_band_rows

    out = {}
    for r in _simhash_band_rows(
        _mk(spark, rows), "doc_id", "text", bands, bits
    ).collect():
        out.setdefault(r.id, set()).add((r.band, r.bucket))
    return out


def test_simhash_incremental_flags_hamming_close_docs(spark):
    from g_data_pipeline_spark.operators.dedup import (
        incremental_simhash_dedup,
        simhash_band_directory,
    )

    base = _corpus_words("a", 60)
    near = list(base)
    near[5] = "EDITONE"  # one token: fingerprint moves a few bits at most
    dump1 = [(1, _doc(base)), (2, _doc(_corpus_words("b", 60)))]
    dump2 = [(10, _doc(near)), (11, _doc(_corpus_words("z", 60)))]
    directory = simhash_band_directory(
        _mk(spark, dump1), "doc_id", "text", bands=8, bits=32
    )
    labeled, delta = incremental_simhash_dedup(
        _mk(spark, dump2), directory, "doc_id", "text", bands=8, bits=32
    )
    got = _labels(labeled)
    assert got[10][2] is True, "Hamming-close doc must flag"
    assert got[11][2] is False
    assert {r.owner_id for r in delta.collect()} == {11}


def test_simhash_incremental_matches_python_twin_and_replays(spark):
    from g_data_pipeline_spark.operators.dedup import (
        incremental_simhash_dedup,
        simhash_band_directory,
    )
    from g_data_pipeline_spark.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    rows = [(r.doc_id, r.text) for r in docs.limit(100).collect()]
    dump1 = [t for t in rows if t[0] % 2 == 0]
    dump2 = [t for t in rows if t[0] % 2 == 1]
    directory = simhash_band_directory(
        _mk(spark, dump1), "doc_id", "text", bands=8, bits=32
    )
    labeled, delta = incremental_simhash_dedup(
        _mk(spark, dump2), directory, "doc_id", "text", bands=8, bits=32
    )
    dir_py = {(r.band, r.bucket): r.owner_id for r in directory.collect()}
    want_labels, want_delta = _python_twin(
        _sim_band_rows(spark, dump2), dir_py
    )
    got = _labels(labeled)
    for i, lab in want_labels.items():
        assert got[i] == lab, f"doc {i}: {got[i]} != twin {lab}"
    got_delta = {(r.band, r.bucket): r.owner_id for r in delta.collect()}
    assert got_delta == want_delta
    # replay against the absorbed delta: identical labels, empty delta
    labeled2, delta2 = incremental_simhash_dedup(
        _mk(spark, dump2),
        directory.unionByName(delta),
        "doc_id",
        "text",
        bands=8,
        bits=32,
    )
    assert _labels(labeled2) == got
    assert delta2.count() == 0
