"""Dedup-modality scorecard: precision/recall of every near-dup pair
family against a known ground truth — the decision artifact behind
"which dedup modality at which threshold do we deploy" (round 10; the
dedup twin of the ANN quality scorecard, ``v_ann_quality_scorecard``).

Each modality answers the same question — "which document pairs are
duplicates?" — through a different lens (byte identity, normalized
fingerprint, shingle-set Jaccard, banded MinHash, SimHash Hamming), and
each has tunable knobs. Given a corpus with planted ground-truth pairs
(re-encoded copies, trailing-edit variants), this operator runs every
modality's REAL pair path and reports exact confusion counts per method
— so threshold/banding choices are made against measured precision and
recall, not vibes.

Scale: each modality's pair generation is its production shape (inverted
index / banded groupBy — never all-pairs); the metric join per method
touches |pred| + |truth| pair rows. Methods run as independent branches
of one union — an evaluation harness runs N corpus scans BY DESIGN (the
standalone gates stay the per-signal oracle path; see
operators/scorecard.py for the fused production pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from g_data_pipeline_spark.functions.text import fingerprint_md5
from g_data_pipeline_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)


def _norm_pairs(df: DataFrame, a: str, b: str) -> DataFrame:
    """Normalize to distinct (id_a < id_b) pairs."""
    lo = F.least(F.col(a), F.col(b))
    hi = F.greatest(F.col(a), F.col(b))
    return (
        df.filter(F.col(a) != F.col(b))
        .select(lo.alias("id_a"), hi.alias("id_b"))
        .distinct()
    )


def exact_fingerprint_pairs(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(survivor, duplicate) pairs from normalized-fingerprint identity
    — the pair view of ``fingerprint_dedup``'s groups (each group's MIN
    id pairs with every other member; the transitive closure adds
    nothing for identity relations)."""
    fp = df.select(
        F.col(id_col).alias("id"), fingerprint_md5(text_col).alias("__fp")
    )
    w = Window.partitionBy("__fp")
    return _norm_pairs(
        fp.withColumn("__min", F.min("id").over(w))
        .filter(F.col("id") != F.col("__min")),
        "__min",
        "id",
    )


def pair_confusion(
    pred: DataFrame, truth: DataFrame, method: str
) -> DataFrame:
    """One row of exact confusion counts + micro P/R/F1 for a predicted
    pair set vs the ground truth (both (id_a < id_b) keyed)."""
    joined = pred.withColumn("__p", F.lit(1)).join(
        truth.withColumn("__t", F.lit(1)), ["id_a", "id_b"], "full_outer"
    )
    return joined.agg(
        F.lit(method).alias("method"),
        F.count_if(F.col("__p").isNotNull() & F.col("__t").isNotNull())
        .cast("long")
        .alias("tp"),
        F.count_if(F.col("__p").isNotNull() & F.col("__t").isNull())
        .cast("long")
        .alias("fp"),
        F.count_if(F.col("__p").isNull() & F.col("__t").isNotNull())
        .cast("long")
        .alias("fn"),
    ).select(
        "method",
        (F.col("tp") + F.col("fn")).alias("n_true_pairs"),
        (F.col("tp") + F.col("fp")).alias("n_pred_pairs"),
        "tp",
        "fp",
        "fn",
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.round(
                F.lit(1e6)
                * F.col("tp").cast("double")
                / (F.col("tp") + F.col("fp"))
            ).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("precision_micro"),
        F.when(
            F.col("tp") + F.col("fn") > 0,
            F.round(
                F.lit(1e6)
                * F.col("tp").cast("double")
                / (F.col("tp") + F.col("fn"))
            ).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("recall_micro"),
        F.when(
            F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn") > 0,
            F.round(
                F.lit(1e6)
                * (F.lit(2) * F.col("tp")).cast("double")
                / (F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn"))
            ).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("f1_micro"),
    )


def dedup_scorecard(
    corpus: DataFrame,
    truth_pairs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    jaccard_threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    max_hamming: int = 8,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Run the four pair modalities over ``corpus`` and score each
    against ``truth_pairs`` (columns id_a < id_b). Returns one row per
    method: exact_fingerprint, ngram_jaccard, minhash_lsh, simhash.

    Expected shape of a healthy scorecard on planted copies + near
    variants: exact_fingerprint at precision 1 with recall = the
    byte-identical share; ngram_jaccard as the exact shingle
    upper-bound; minhash_lsh within its banding S-curve of the jaccard
    row; simhash catching Hamming-close variants. Pinned in
    tests/test_dedup_scorecard.py."""
    truth = truth_pairs.select("id_a", "id_b").distinct()
    methods = {
        "exact_fingerprint": exact_fingerprint_pairs(
            corpus, id_col, text_col
        ),
        "ngram_jaccard": _norm_pairs(
            ngram_jaccard_pairs(
                corpus, id_col, text_col, n=n, threshold=jaccard_threshold
            ),
            "id_a",
            "id_b",
        ),
        "minhash_lsh": _norm_pairs(
            minhash_lsh_pairs(
                corpus,
                id_col,
                text_col,
                n=n,
                num_hashes=num_hashes,
                bands=bands,
                threshold=jaccard_threshold,
                hash_family=hash_family,
            ),
            "id_a",
            "id_b",
        ),
        "simhash": _norm_pairs(
            simhash_pairs(
                corpus,
                id_col,
                text_col,
                max_hamming=max_hamming,
                hash_family=hash_family,
            ),
            "id_a",
            "id_b",
        ),
    }
    out = None
    for name, pred in methods.items():
        row = pair_confusion(pred, truth, name)
        out = row if out is None else out.unionByName(row)
    return out
