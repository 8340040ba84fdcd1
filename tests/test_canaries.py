"""Memorization canaries (operators/canaries.py): deterministic
planting, audit-table derivability without text, detection round-trip
(incl. hallucinated lookalike rejection), and the exposure summary."""

from __future__ import annotations

from pyspark.sql import functions as F

from g_data_pipeline_spark.operators.canaries import (
    canary_table,
    detect_canaries,
    exposure_report,
    plant_canaries,
)


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body "), F.col("id").cast("string")).alias(
            "text"
        ),
    )


def test_planting_is_deterministic_and_fractional(spark):
    docs = _docs(spark)
    planted = plant_canaries(docs, fraction=0.10).collect()
    tagged = [r for r in planted if r.canary is not None]
    # md5-bucket fraction: close to 10% of 200, exactly reproducible
    assert 8 <= len(tagged) <= 32
    again = {
        r.doc_id: r.canary
        for r in plant_canaries(_docs(spark).repartition(7), fraction=0.10)
        .collect()
    }
    for r in planted:
        assert again[r.doc_id] == r.canary
    for r in tagged:
        assert r.text.endswith(" " + r.canary)
    # the audit table derives from ids alone and matches the planted set
    tbl = {r.doc_id: r.canary for r in canary_table(docs, fraction=0.10).collect()}
    assert tbl == {r.doc_id: r.canary for r in tagged}


def test_detection_round_trip_and_lookalike_rejection(spark):
    docs = _docs(spark)
    tbl = canary_table(docs, fraction=0.10)
    two = tbl.limit(2).collect()
    outputs = spark.createDataFrame(
        [
            (f"the model emitted {two[0].canary} verbatim, twice: "
             f"{two[0].canary}",),
            (f"another leak {two[1].canary} here",),
            ("a hallucinated zq-canary-0123456789abcdef lookalike",),
            ("clean generation with no markers",),
        ],
        "text string",
    )
    got = {r.canary: r.n_occurrences for r in detect_canaries(outputs, tbl).collect()}
    assert got[two[0].canary] == 2 and got[two[1].canary] == 1
    # the lookalike is canary-shaped but not planted -> dropped
    assert len(got) == 2 or "zq-canary-0123456789abcdef" not in got

    rep = exposure_report(outputs, tbl).collect()[0]
    n_planted = tbl.count()
    assert rep.n_planted == n_planted
    assert rep.n_emitted == 2 and rep.total_emissions == 3
    assert rep.emitted_share_micro == 2 * 1_000_000 // n_planted


def test_zero_exposure_on_clean_outputs(spark):
    docs = _docs(spark)
    tbl = canary_table(docs, fraction=0.10)
    clean = spark.createDataFrame([("nothing here",)], "text string")
    rep = exposure_report(clean, tbl).collect()[0]
    assert rep.n_emitted == 0 and rep.total_emissions == 0
    assert rep.emitted_share_micro == 0
