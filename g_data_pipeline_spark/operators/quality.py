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


def classifier_calibration(
    scored: DataFrame,
    score_col: str,
    weight_col: str,
    label_col: str,
    thr_avg_micros: tuple[int, ...] = (
        -400_000, -300_000, -200_000, -100_000, 0,
        100_000, 200_000, 300_000, 400_000,
    ),
    score_bucket_width: int = 10_000_000,
) -> DataFrame:
    """Exact ROC/AUC calibration report for a quality-classifier gate —
    the label-aware half of ``t_quality_threshold_sweep``'s keep-rate
    curve: the number that justifies a chosen threshold (verdict r9 #5).

    Input: one row per held-out labeled document with an INTEGER score
    (``score_col`` — the deployed gate's ``sum_w_micro``), a length
    ``weight_col`` (token count, so thresholds can be stated per-token),
    and a 0/1 ``label_col``.

    Output: one row per candidate per-token threshold (micro-logit units)
    with the exact confusion counts at ``score > thr * n_tokens`` (the
    length-normalized form of the classifier's raw-sum gate — integer
    multiply, never a division) plus the global exact AUC repeated on
    every row. AUC is the Mann-Whitney statistic with the tie midrank
    correction, computed WITHOUT per-row ranks:

        auc_num_x2 = sum over distinct scores s of
                       pos_at(s) * (2 * neg_below(s) + neg_at(s))
        AUC        = auc_num_x2 / (2 * n_pos * n_neg)

    — every term an exact integer; the one double division happens once
    at the end (micro-rounded identically on both engines).

    Scale AND plan shape: everything funnels through ONE content-keyed
    rollup to distinct ``(score, n_tokens)`` pairs (bounded by the
    eval-set size, usually far smaller). Every downstream branch — the
    distinct-score frame, its prefix sum's two derivations, the ROC
    grid — consumes that SAME aggregate subtree, byte-identical in each
    branch (every branch needs all four of its columns), so
    ReuseExchange collapses them and the scoring pipeline (token
    explode, weight join, per-doc aggregation) executes ONCE however
    many branches read it. The first draft branched on the per-DOC
    frame instead and planned 18 scans of the corpus; this shape plans
    5 (the scoring subtree once). The prefix sum runs through
    :func:`~g_data_pipeline_spark.operators.windows.
    bucketed_running_sum` (value-derived buckets — never a
    single-partition global window); the ROC grid is a row-local
    literal explode over the tiny rollup.
    """
    from g_data_pipeline_spark.operators.windows import bucketed_running_sum

    y = F.col(label_col).cast("long")
    base = scored.select(
        F.col(score_col).cast("long").alias("__s"),
        F.col(weight_col).cast("long").alias("__n"),
        y.alias("__y"),
    )
    # THE shared rollup: distinct (score, length) pairs with class mass.
    per_sn = base.groupBy("__s", "__n").agg(
        F.sum("__y").alias("__pos_at"),
        F.sum(F.lit(1) - F.col("__y")).alias("__neg_at"),
    )
    per_score = per_sn.groupBy("__s").agg(
        F.sum("__pos_at").alias("__pos_at"),
        F.sum("__neg_at").alias("__neg_at"),
    )
    cum = bucketed_running_sum(
        per_score, "__s", "__neg_at", "__cum_neg", score_bucket_width
    )
    auc = cum.agg(
        F.sum("__pos_at").alias("n_pos"),
        F.sum("__neg_at").alias("n_neg"),
        F.sum(
            F.col("__pos_at")
            * (
                F.lit(2) * (F.col("__cum_neg") - F.col("__neg_at"))
                + F.col("__neg_at")
            )
        )
        .cast("long")
        .alias("__auc_num_x2"),
    )
    thr = F.explode(
        F.array(*[F.lit(int(t)).cast("long") for t in thr_avg_micros])
    ).alias("thr_avg_micro")
    fan = per_sn.select("__s", "__n", "__pos_at", "__neg_at", thr)
    pred = F.col("__s") > F.col("thr_avg_micro") * F.col("__n")
    conf = fan.groupBy("thr_avg_micro").agg(
        F.sum(F.when(pred, F.col("__pos_at")).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(F.when(pred, F.col("__neg_at")).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum(F.when(~pred, F.col("__pos_at")).otherwise(0))
        .cast("long")
        .alias("fn"),
        F.sum(F.when(~pred, F.col("__neg_at")).otherwise(0))
        .cast("long")
        .alias("tn"),
    )
    return conf.crossJoin(F.broadcast(auc)).select(
        "thr_avg_micro",
        "n_pos",
        "n_neg",
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(F.lit(1e6) * F.col("tp").cast("double") / F.col("n_pos"))
        .cast("long")
        .alias("tpr_micro"),
        F.round(F.lit(1e6) * F.col("fp").cast("double") / F.col("n_neg"))
        .cast("long")
        .alias("fpr_micro"),
        F.round(
            (F.lit(1e6) * F.col("__auc_num_x2").cast("double"))
            / (
                F.lit(2.0)
                * F.col("n_pos").cast("double")
                * F.col("n_neg").cast("double")
            )
        )
        .cast("long")
        .alias("auc_micro"),
    )


def calibration_bins(
    scored: DataFrame,
    score_col: str,
    weight_col: str,
    label_col: str,
    band_micro: int = 25_000,
    band_clamp: int = 50,
) -> DataFrame:
    """Reliability-diagram companion to :func:`classifier_calibration`
    (ROC/AUC answers "can the scorer rank?"; this answers "do its scores
    MEAN what they say?"): documents band by per-token micro-logit —
    ``band = clamp(floor(score / (band_micro * n_tokens)), ±band_clamp)``
    (defaults: 25k-micro bands clamped to ±50 — ±1.25 logit/token)
    — and each band reports its empirical positive rate. A calibrated
    scorer's rate rises monotonically through the bands; a flat profile
    says the magnitude carries no information beyond the sign.

    All-integer gate math: the floor-division runs on one mirrored
    double op whose operands keep it exact (|s/d - m| >= 1/d >> ulp for
    these magnitudes), and the clamp is LEAST/GREATEST. One shuffle (the
    band rollup; map-side combinable).
    """
    y = F.col(label_col).cast("long")
    s = F.col(score_col).cast("long")
    n = F.col(weight_col).cast("long")
    band = F.greatest(
        F.lit(-int(band_clamp)),
        F.least(
            F.lit(int(band_clamp)),
            F.floor(
                s.cast("double") / (F.lit(float(band_micro)) * n)
            ).cast("long"),
        ),
    )
    base = scored.select(band.alias("band"), y.alias("__y"))
    return (
        base.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__y").cast("long").alias("n_pos"),
        )
        .select(
            "band",
            "n_docs",
            "n_pos",
            F.round(
                F.lit(1e6) * F.col("n_pos").cast("double") / F.col("n_docs")
            )
            .cast("long")
            .alias("pos_rate_micro"),
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
