"""Quality-classifier scoring: a fasttext-shaped linear text classifier
seam with a pure-Spark trainable implementation.

The reference has no classifier (its curation surface stops at profiling —
SURVEY.md §2); this is the standard LLM-curation component the engine adds:
score every document with a cheap linear model trained on a small labeled
sample, keep documents above a threshold (the CCNet / GPT-3 quality-filter
recipe). Two implementations behind one seam, mirroring ``llm.py``'s
LLM-client pattern:

- :func:`naive_bayes_hashed_weights` + :func:`quality_scores` — a linear
  bag-of-HASHED-tokens model (fasttext's hashing trick: tokens hash into a
  fixed bucket table, so the model is O(n_buckets) regardless of corpus
  vocabulary — always broadcastable, even against a 100 TB corpus). Naive
  Bayes log-odds weights learned distributed from a labeled sample; scoring
  is one broadcast join + one keyed aggregation. Pure ``pyspark.sql``
  expressions, bit-deterministic (see the micro-rounding note below).
- :func:`_require_fasttext` — the plug point for a real fasttext ``.bin``
  model (the library is not in this container); import-gated exactly like
  the image/audio codecs in ``multimodal/media.py``.

Determinism recipe (same policy as ``t_unigram_logprob`` /
``t_dsir_weights`` in ``query_defs/text2.py``): each bucket's log-odds is
computed as ONE ``ln`` of a single double quotient (never ``ln(a)-ln(b)``,
whose pre-subtraction last bits could differ across libm implementations),
rounded ONCE to an integer micro-weight; per-document totals are exact
integer sums; only the final mean is a double division.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from g_data_pipeline_spark.functions.text import tokens

#: fasttext defaults to a 2M-bucket hash table; 32768 keeps the broadcast
#: table tiny while leaving collisions negligible for test-sized vocabs.
DEFAULT_BUCKETS = 32_768


def hashed_token_bucket(token_col: Column | str, n_buckets: int = DEFAULT_BUCKETS) -> Column:
    """Token -> bucket in [0, n_buckets) via md5 (engine-mirrorable: the
    DuckDB twin is ``sql_hashed_token_bucket``). 15 hex chars = 60 bits,
    exact in BIGINT."""
    c = F.col(token_col) if isinstance(token_col, str) else token_col
    return (
        F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint") % n_buckets
    )


def sql_hashed_token_bucket(token_expr: str, n_buckets: int = DEFAULT_BUCKETS) -> str:
    """DuckDB twin of :func:`hashed_token_bucket`."""
    return (
        f"CAST(('0x' || substring(md5({token_expr}), 1, 15)) AS BIGINT)"
        f" % {n_buckets}"
    )


def token_occurrences(
    df: DataFrame, id_cols: list[str], text_col: str, n_buckets: int = DEFAULT_BUCKETS
) -> DataFrame:
    """Explode ``text_col`` into one row per token occurrence, carrying
    ``id_cols`` plus the hashed bucket column ``b``."""
    return (
        df.select(*id_cols, F.explode(tokens(text_col)).alias("token"))
        .filter(F.col("token") != "")
        .select(*id_cols, hashed_token_bucket("token", n_buckets).alias("b"))
    )


def naive_bayes_hashed_weights(
    sample: DataFrame,
    text_col: str,
    label_col: str,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Learn per-bucket log-odds micro-weights from a labeled sample.

    ``label_col`` must be 0/1 (1 = positive / high quality). Returns
    ``[b bigint, w_micro bigint]`` where

        w_micro = round(1e6 * ln( ((c_pos+1) * (T_neg+V))
                                / ((c_neg+1) * (T_pos+V)) ))

    — add-one-smoothed naive-Bayes log-odds over the hashed-token space
    (V = n_buckets), the linear-model weights fasttext would learn up to
    its softmax. The model table has at most ``n_buckets`` rows however
    large the corpus — the broadcast in :func:`quality_scores` is safe by
    construction. Shuffle: one groupBy on bucket id; the occurrence totals
    are a broadcast 1-row aggregate.
    """
    occ = token_occurrences(sample, [label_col], text_col, n_buckets)
    lab = F.col(label_col).cast("long")
    totals = occ.agg(
        F.sum(lab).alias("pos_tot"), F.sum(1 - lab).alias("neg_tot")
    )
    return (
        occ.groupBy("b")
        .agg(F.sum(lab).alias("c_pos"), F.sum(1 - lab).alias("c_neg"))
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.round(
                F.log(
                    ((F.col("c_pos") + 1.0) * (F.col("neg_tot") + F.lit(float(n_buckets))))
                    / ((F.col("c_neg") + 1.0) * (F.col("pos_tot") + F.lit(float(n_buckets))))
                )
                * 1e6
            )
            .cast("long")
            .alias("w_micro"),
        )
    )


def quality_scores(
    df: DataFrame,
    weights: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = DEFAULT_BUCKETS,
    threshold_micro: int = 0,
) -> DataFrame:
    """Score every document against a learned weight table and apply the
    keep/drop threshold (logistic decision at logit > threshold — the
    sigmoid itself is monotone, so the gate never needs to evaluate it).

    Returns ``[id_col, n_tokens bigint, sum_w_micro bigint,
    avg_logit double, keep bigint]``. The weight table is explicitly
    broadcast — bounded at ``n_buckets`` rows by the hashing trick, it can
    never outgrow an executor no matter the corpus size. One shuffle:
    the per-document aggregation.
    """
    occ = token_occurrences(df, [id_col], text_col, n_buckets)
    return (
        occ.join(F.broadcast(weights), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w_micro").cast("long").alias("sum_w_micro"),
            (
                F.sum("w_micro").cast("double") / F.lit(1e6) / F.count(F.lit(1))
            ).alias("avg_logit"),
        )
        .withColumn(
            "keep",
            F.when(F.col("sum_w_micro") > threshold_micro, 1)
            .otherwise(0)
            .cast("long"),
        )
    )


def _require_fasttext():
    """Plug point for scoring with a real fasttext model (`model.predict`
    over mapInPandas batches — same plumbing as quality_scores but weights
    come from the .bin file). The library is not installed in this
    container; the Spark-side seam is what this module provides."""
    try:
        import fasttext  # type: ignore  # noqa: F401

        return fasttext
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "fasttext is not installed; use naive_bayes_hashed_weights + "
            "quality_scores (pure-Spark path) or install fasttext for "
            ".bin-model scoring"
        ) from exc
