"""Unicode NFC normalization kernel (operators/grouped.py
unicode_normalize_udf): decomposed/precomposed collapse, NFKC
compatibility folding, null-safety, and DuckDB nfc_normalize parity."""

from __future__ import annotations

import unicodedata

import pytest
from pyspark.sql import functions as F

from g_data_pipeline_spark.operators.grouped import unicode_normalize_udf

DECOMPOSED = "café résumé"
PRECOMPOSED = "café résumé"


def _norm(spark, texts, form="NFC"):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    return [
        r.v for r in df.select(unicode_normalize_udf(form)(F.col("t")).alias("v")).collect()
    ]


def test_nfc_collapses_combining_sequences(spark):
    got = _norm(spark, [DECOMPOSED, PRECOMPOSED, "plain ascii", None])
    assert got[0] == PRECOMPOSED
    assert got[1] == PRECOMPOSED          # already-normal is identity
    assert got[2] == "plain ascii"
    assert got[3] is None


def test_nfkc_folds_compatibility_chars(spark):
    # ligature fi and circled one fold under NFKC, survive NFC
    got_nfc = _norm(spark, ["ﬁle ①"], "NFC")
    got_nfkc = _norm(spark, ["ﬁle ①"], "NFKC")
    assert got_nfc == ["ﬁle ①"]
    assert got_nfkc == ["file 1"]


def test_invalid_form_raises():
    with pytest.raises(ValueError, match="normalization form"):
        unicode_normalize_udf("NFX")


def test_duckdb_nfc_parity(spark):
    """The oracle claim: unicodedata NFC == DuckDB nfc_normalize on the
    same inputs (both UAX #15)."""
    import duckdb

    samples = [DECOMPOSED, PRECOMPOSED, "ñ ö ú",
               "Ӑ ascii", "ḍ̇"]
    spark_side = _norm(spark, samples)
    for s, got in zip(samples, spark_side):
        duck = duckdb.sql(
            "SELECT nfc_normalize(?)", params=[s]
        ).fetchone()[0]
        assert got == duck == unicodedata.normalize("NFC", s)
