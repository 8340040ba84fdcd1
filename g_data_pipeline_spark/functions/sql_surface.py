"""Pure-SQL surface for the text/url kernels: `CREATE OR REPLACE TEMPORARY
FUNCTION` declarations (Spark SQL scalar UDFs, SPARK-28264) mirroring the
Column builders in functions/text.py and query_defs/curation4.py, so a
SQL-only consumer (`spark.sql`, thrift/JDBC, SQL notebooks) can call the
same kernels without touching the Python API:

    register_sql_functions(spark)
    spark.sql("SELECT gdp_lang_id(text) AS lang, count(*) FROM docs ...")

SQL UDF bodies are EXPRESSIONS, not Python — they inline into the plan and
whole-stage-codegen exactly like the Column versions (zero BatchEvalPython;
pinned by test), so this surface costs nothing at 100 TB.

Drift guard: `tests/test_sql_surface.py` pins every function to exact
equality with its Column twin over the documents corpus plus adversarial
literals — the bodies below cannot silently diverge from functions/text.py.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from g_data_pipeline_spark.functions.text import STOPWORDS

_TOKS = r"split(trim(lower({s})), '\\s+')"
_NTOK = (
    "CASE WHEN trim({s}) = '' THEN 0 ELSE size(" + _TOKS + ") END"
)
_SW = {
    lang: r"\\b(" + "|".join(words) + r")\\b"
    for lang, words in STOPWORDS.items()
}
_NORM = (
    "trim(regexp_replace(regexp_replace(lower({s}), "
    r"'[^a-z0-9\\s]', ''), '\\s+', ' '))"
)


def _quality_score_sql(s: str) -> str:
    # Literals carry the D suffix: a bare `100.0` parses as DECIMAL(4,1)
    # in Spark SQL (vs F.lit(100.0)'s DOUBLE), and mixed decimal/double
    # arithmetic rounds differently in the last ulp — the drift-guard test
    # catches exactly this.
    n_tokens = _NTOK.format(s=s)
    stop_ratio = (
        f"CASE WHEN {n_tokens} > 0 THEN "
        f"regexp_count(lower({s}), '{_SW['en']}') / {n_tokens} "
        "ELSE 0.0D END"
    )
    digit_ratio = (
        f"CASE WHEN length({s}) > 0 THEN "
        f"regexp_count({s}, '[0-9]') / length({s}) ELSE 0.0D END"
    )
    punct_ratio = (
        f"CASE WHEN length({s}) > 0 THEN "
        f"regexp_count({s}, '[.!?,;:]') / length({s}) ELSE 0.0D END"
    )
    return (
        f"0.4D * least({n_tokens} / 100.0D, 1.0D)"
        f" + 0.4D * least(({stop_ratio}) * 4, 1.0D)"
        f" + 0.2D * (1.0D - least(({digit_ratio}) + ({punct_ratio}), 1.0D))"
    )


def _lang_id_sql(s: str) -> str:
    # same scores + fixed tie-break order as functions/text.lang_id
    scores = {
        lang: f"regexp_count(lower({s}), '{rx}')" for lang, rx in _SW.items()
    }
    scores["zh"] = f"regexp_count({s}, '[一-鿿]')"
    order = ["en", "de", "fr", "es", "zh"]
    best = "greatest(" + ", ".join(scores[k] for k in order) + ")"
    expr = "'unknown'"
    for lang in reversed(order):
        expr = (
            f"CASE WHEN {best} > 0 AND {scores[lang]} = {best} "
            f"THEN '{lang}' ELSE {expr} END"
        )
    return expr


def _canonical_url_sql(u: str) -> str:
    # Spark regexp_replace is replace-ALL with 3 args (no /g flag — that is
    # the DuckDB twin's dialect, query_defs/curation4.sql_canonical_url).
    x = f"regexp_replace({u}, '#.*$', '')"
    x = f"regexp_replace({x}, '&utm_[^&#]*', '')"
    x = f"regexp_replace({x}, '\\\\?utm_[^&#]*&', '?')"
    x = f"regexp_replace({x}, '\\\\?utm_[^&#]*$', '')"
    host = (
        f"lower(regexp_extract({x}, "
        "'^[Hh][Tt][Tt][Pp][Ss]?://([^/?#]*)', 1))"
    )
    rest = f"regexp_replace({x}, '^[Hh][Tt][Tt][Pp][Ss]?://[^/?#]*', '')"
    rest = f"regexp_replace({rest}, '/\\\\?', '?')"
    rest = f"regexp_replace({rest}, '/$', '')"
    return f"concat('https://', {host}, {rest})"


def sql_function_defs() -> dict[str, str]:
    """name -> full CREATE statement; exposed for inspection/testing."""
    bodies = {
        "gdp_token_count": ("(s STRING) RETURNS INT", _NTOK.format(s="s")),
        "gdp_bpe_token_count": (
            "(s STRING) RETURNS INT",
            r"regexp_count(s, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')",
        ),
        "gdp_normalize_text": (
            "(s STRING) RETURNS STRING",
            _NORM.format(s="s"),
        ),
        "gdp_fingerprint_md5": (
            "(s STRING) RETURNS STRING",
            f"md5(cast({_NORM.format(s='s')} AS BINARY))",
        ),
        "gdp_quality_score": (
            "(s STRING) RETURNS DOUBLE",
            _quality_score_sql("s"),
        ),
        "gdp_lang_id": ("(s STRING) RETURNS STRING", _lang_id_sql("s")),
        "gdp_canonical_url": (
            "(u STRING) RETURNS STRING",
            _canonical_url_sql("u"),
        ),
    }
    return {
        name: (
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} "
            f"RETURN {body}"
        )
        for name, (sig, body) in bodies.items()
    }


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register the whole surface; returns the registered names."""
    defs = sql_function_defs()
    for stmt in defs.values():
        spark.sql(stmt)
    return sorted(defs)
