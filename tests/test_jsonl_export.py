"""JSONL shard export (pipelines.export_jsonl_shards): deterministic
shard assignment, one compressed part per shard directory, loader-side
readability, and manifest/landed parity."""

from __future__ import annotations

import glob
import gzip
import json

from pyspark.sql import functions as F

from g_data_pipeline_spark.pipelines import export_jsonl_shards

SF_DIR = "/root/testdata/sf0.001"
N_SHARDS = 8


def _export(spark, dest):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    manifest = export_jsonl_shards(
        docs, dest, n_shards=N_SHARDS, meta_cols=["source", "lang"]
    )
    return docs, manifest.collect()


def test_export_layout_and_manifest(spark, tmp_path):
    dest = str(tmp_path / "out")
    docs, manifest = _export(spark, dest)
    assert sum(r["n_docs"] for r in manifest) == docs.count()
    for r in manifest:
        parts = glob.glob(f"{dest}/shard={r['shard']}/part-*.json.gz")
        assert len(parts) == 1, r  # one part per shard directory
        with gzip.open(parts[0], "rt", encoding="utf-8") as f:
            rows = [json.loads(line) for line in f]
        assert len(rows) == r["n_docs"]
        assert set(rows[0]) == {"doc_id", "text", "source", "lang"}
        assert sum(len(x["text"]) for x in rows) == r["n_chars"]


def test_sharding_is_deterministic_and_spark_readable(spark, tmp_path):
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    _export(spark, d1)
    docs, _ = _export(spark, d2)
    a = spark.read.json(d1).select("doc_id", "shard")
    b = spark.read.json(d2).select("doc_id", "shard")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # round-trip completeness
    back = spark.read.json(d1)
    assert back.count() == docs.count()
    assert (
        back.join(docs.select("doc_id", "text"), "doc_id")
        .filter(back["text"] != docs["text"])
        .count()
        == 0
    )