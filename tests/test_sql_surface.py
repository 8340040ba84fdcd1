"""The SQL UDF surface (functions/sql_surface.py) must be EXACTLY the
Column kernels, just reachable from pure SQL: every gdp_* function is
pinned to bit-identical output vs its functions/text.py (or
curation4.canonical_url) twin over the documents corpus plus adversarial
literals, and the bodies must inline (no Python eval nodes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from g_data_pipeline_spark.functions import text as Tx
from g_data_pipeline_spark.functions.sql_surface import (
    register_sql_functions,
    sql_function_defs,
)

SF_DIR = "/root/testdata/sf0.001"

EDGE = [
    "",
    "   ",
    "the quick brown fox. it is a test, that it is!",
    "der und die das ist nicht",
    "1234 5678 90 12.5%",
    "UPPER case MIX 你好 一二三",
    "no-stopwords-here xyzzy plugh",
]


@pytest.fixture(scope="module")
def corpus(spark):
    register_sql_functions(spark)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("text").alias("s")
    )
    edge = spark.createDataFrame([(s,) for s in EDGE], "s string")
    return docs.unionByName(edge)


def _mismatches(corpus, sql_call: str, col):
    return (
        corpus.select(
            F.expr(sql_call).alias("got"), col.alias("want")
        )
        .where(
            ~(
                (F.col("got") == F.col("want"))
                | (F.col("got").isNull() & F.col("want").isNull())
            )
        )
        .count()
    )


@pytest.mark.parametrize(
    "fn,twin",
    [
        ("gdp_token_count(s)", lambda: Tx.token_count("s")),
        ("gdp_bpe_token_count(s)", lambda: Tx.bpe_token_count("s")),
        ("gdp_normalize_text(s)", lambda: Tx.normalize_text("s")),
        ("gdp_fingerprint_md5(s)", lambda: Tx.fingerprint_md5("s")),
        ("gdp_lang_id(s)", lambda: Tx.lang_id("s")),
        ("gdp_quality_score(s)", lambda: Tx.quality_score("s")),
    ],
)
def test_sql_udfs_match_column_kernels(spark, corpus, fn, twin):
    assert _mismatches(corpus, fn, twin()) == 0, fn


def test_canonical_url_sql_udf_matches_column(spark, corpus):
    from g_data_pipeline_spark.query_defs.curation4 import canonical_url

    urls = spark.createDataFrame(
        [
            ("HTTPS://WWW.Ex.COM/Path/?utm_source=f&id=1&utm_campaign=c#x",),
            ("http://a.b/only/path/",),
            ("https://h?utm_only=1",),
        ],
        "s string",
    )
    register_sql_functions(spark)
    assert _mismatches(urls, "gdp_canonical_url(s)", canonical_url(F.col("s"))) == 0


def test_sql_udfs_inline_no_python(spark, corpus):
    """The surface must stay JVM-side: a query through every gdp_* function
    plans with zero Python eval nodes and one scan.

    Plan source is the parquet frame WITHOUT the edge-literal union:
    Spark 4.1's RemoveRedundantAliases trips its own plan validation
    (PLAN_VALIDATION_FAILED_RULE_IN_BATCH) when explaining ≥2 SQL UDF
    calls over a union — execution itself is fine (the parity tests above
    run exactly that shape); only explainString raises."""
    register_sql_functions(spark)
    calls = ", ".join(
        f"{name}(s) AS c{i}"
        for i, name in enumerate(n for n in sql_function_defs() if n != "gdp_canonical_url")
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("text").alias("s")
    )
    docs.limit(10).createOrReplaceTempView("__sqlsurf")
    df = spark.sql(f"SELECT {calls} FROM __sqlsurf")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "EvalPython" not in plan
    assert df.count() == 10


def test_registration_is_idempotent(spark):
    names = register_sql_functions(spark)
    assert register_sql_functions(spark) == names  # CREATE OR REPLACE
    assert spark.sql("SELECT gdp_token_count('a b')").collect()[0][0] == 2
