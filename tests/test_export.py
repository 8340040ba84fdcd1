"""End-to-end training-export pipeline: curate -> span-dedup -> BPE ->
pack -> shard -> partitioned parquet, with manifest consistency and
partition pruning on the shard key."""

from __future__ import annotations

from pyspark.sql import functions as F

from g_data_pipeline_spark.pipelines import export_training_shards
from tests.conftest import SF_DIR_SMOKE


def test_export_training_shards_end_to_end(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet")
    dest = str(tmp_path / "shards")
    n_shards = 8
    manifest = export_training_shards(
        docs, dest, n_shards=n_shards, bpe_merges=50, seq_len=256
    ).collect()

    assert 1 <= len(manifest) <= n_shards
    assert all(0 <= r.shard < n_shards for r in manifest)

    landed = spark.read.parquet(dest)
    # manifest is consistent with what landed
    assert sum(r.n_docs for r in manifest) == landed.count()
    assert (
        sum(r.total_tokens for r in manifest)
        == landed.agg(F.sum("n_tokens")).collect()[0][0]
    )
    # every landed doc has a valid pack assignment
    bad = landed.filter(
        (F.col("bin_offset") < 0) | (F.col("bin_offset") >= 256)
        | (F.col("n_tokens") <= 0)
    ).count()
    assert bad == 0

    # shard is a real parquet partition key -> partition pruning applies
    one = landed.filter(F.col("shard") == manifest[0].shard)
    plan = one._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pf_line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "shard" in pf_line

    # determinism: a second export to a new path produces the same manifest
    manifest2 = export_training_shards(
        docs, str(tmp_path / "shards2"), n_shards=n_shards, bpe_merges=50,
        seq_len=256,
    ).collect()
    assert [tuple(r) for r in manifest] == [tuple(r) for r in manifest2]
