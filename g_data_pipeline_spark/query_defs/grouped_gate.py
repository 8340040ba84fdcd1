"""Wave 8 (round 4): putting the Python/Arrow extension surface under the
driver's hash gate, plus text normalization.

Every previously-gated query is pure JVM expressions; the pandas
(`applyInPandas`) paths were pytest-only. `p_grouped_median_pandas` closes
that gap: a grouped-map pandas kernel whose output must hash-match DuckDB —
proving the Arrow round-trip (batch shape, dtype mapping, group semantics)
preserves exact values, not just shapes.

Registered post-window (r5 rotation queue, ROTATION.md).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.queries import register


@register(
    "p_grouped_median_pandas",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(ROUND(QUANTILE_CONT(l_extendedprice, 0.5) * 1e6) AS BIGINT)
             AS median_micro
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def p_grouped_median_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped exact median computed in a PANDAS grouped-map kernel
    (applyInPandas) and hash-gated against DuckDB — the proof that the
    Arrow batch path preserves exact float values end-to-end. The
    interpolation is written EXPLICITLY as lo + frac*(hi-lo) (DuckDB's
    QUANTILE_CONT formula) instead of np.percentile, whose lerp uses a
    different FP expression in the upper half and can differ in the last
    bit. Same shuffle as any groupBy; per-task memory is one group
    (operators/grouped.py contract). Output micro-scaled integers."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_extendedprice").cast("double").alias("x")
    )
    schema = T.StructType(
        [
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("n_rows", T.LongType()),
            T.StructField("median_micro", T.LongType()),
        ]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        v = pdf["x"].sort_values().to_numpy()
        n = len(v)
        h = (n - 1) * 0.5
        lo = float(v[int(h)])
        hi = float(v[min(int(h) + 1, n - 1)])
        med = lo + (h - int(h)) * (hi - lo)
        # Half-away-from-zero, NOT Python round(): round() is banker's
        # (round(2.5) == 2) while DuckDB ROUND is half-away-from-zero.
        # floor(|x|*1e6 + 0.5) with the sign restored matches DuckDB for
        # BOTH signs (bare floor(x + 0.5) is half-UP and diverges at
        # negative .5 boundaries if this kernel is reused on signed data).
        scaled = abs(med) * 1e6
        micro = int(math.copysign(math.floor(scaled + 0.5), med))
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "n_rows": [n],
                "median_micro": [micro],
            }
        )

    return li.groupBy("l_returnflag").applyInPandas(fn, schema=schema)


@register(
    "t_text_normalize",
    oracle=r"""
    SELECT doc_id,
           md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))
             AS norm_fingerprint,
           CAST(length(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))
                AS BIGINT) AS norm_len
    FROM documents
    """,
)
def t_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (lowercase, trim, whitespace collapse)
    with an md5 fingerprint of the normalized form — the preprocessing
    step exact dedup keys on so that case/spacing variants collapse to one
    fingerprint. Pure JVM expressions, embarrassingly parallel, zero
    shuffle. (Unicode NFC/accent-stripping is deliberately NOT applied
    here: Spark and DuckDB normalize non-ASCII differently — the
    documented BMP/ASCII-corpus assumption from t_char_diversity applies;
    a production corpus would pre-normalize at ingest with a single
    library owning the Unicode tables.)"""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    return docs.select(
        "doc_id",
        F.md5(norm).alias("norm_fingerprint"),
        F.length(norm).cast("bigint").alias("norm_len"),
    )
