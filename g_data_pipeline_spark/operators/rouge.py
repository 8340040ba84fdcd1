"""ROUGE-L near-duplicate detection for instruction corpora — the
Self-Instruct dedup rule (Wang et al. '22 §3.2: a new instruction is
dropped when its ROUGE-L similarity to any existing instruction is
>= 0.7). ROUGE-L's LCS basis catches reorderings and partial rewrites
that shingle-Jaccard misses on SHORT texts, which is why instruction
datasets use it over MinHash.

Spark-first shape:

- candidate PAIRING is pure JVM: word-shingle inverted index ->
  content-keyed self-join (the d_ngram_jaccard/MinHash blocking
  discipline — never all-pairs; ``max_shingle_freq`` caps hot
  shingles so a boilerplate phrase cannot explode f^2 candidates);
- the exact LCS dynamic program runs ONLY on blocked candidate pairs
  through the Arrow-batched scalar kernel in operators/grouped.py
  (the house-rule home for pandas UDFs), with a documented
  ``max_tokens`` bound;
- scoring is integer micro: rouge_l_micro = 2 * LCS * 1e6 //
  (len_a + len_b) — the F-measure with precision == recall weights,
  exact in integers.

No SQL twin: LCS is not expressible in DuckDB — rows-only registry
entry + exact Python-twin parity pins (tests/test_rouge.py), the
documented contract for non-SQL-expressible ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from g_data_pipeline_spark.functions.text import token_count, tokens, word_shingles
from g_data_pipeline_spark.operators.grouped import lcs_length_udf


def python_lcs(a: list[str], b: list[str]) -> int:
    """Reference twin of the Arrow kernel (same rolling-row DP)."""
    if len(a) > len(b):
        a, b = b, a
    if not a:
        return 0
    prev = [0] * (len(a) + 1)
    for tok in b:
        cur = [0]
        for j, t in enumerate(a, 1):
            cur.append(prev[j - 1] + 1 if t == tok else max(cur[-1], prev[j]))
        prev = cur
    return prev[-1]


def rouge_l_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold_micro: int = 700_000,
    shingle_n: int = 2,
    max_shingle_freq: int | None = 100,
    max_tokens: int = 256,
    token_mode: str = "whitespace",
) -> DataFrame:
    """Candidate-blocked exact ROUGE-L pairs above ``threshold_micro``:
    ``(id_a, id_b, len_a, len_b, lcs_len, rouge_l_micro)`` with
    id_a < id_b. Shape: one shingle explode + content-keyed self-join
    for candidates, one (id, id) distinct, two token-array joins, the
    Arrow LCS kernel on candidates only."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.slice(tokens(text_col, token_mode), 1, int(max_tokens)).alias(
            "toks"
        ),
        F.least(
            token_count(text_col, token_mode).cast("long"),
            F.lit(int(max_tokens)),
        ).alias("n_tok"),
    )
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(word_shingles(text_col, shingle_n, token_mode))
        ).alias("sh"),
    )
    if max_shingle_freq is not None:
        freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df_"))
        sh = sh.join(
            freq.filter(F.col("df_") <= int(max_shingle_freq)).select("sh"),
            "sh",
        )
    cand = (
        sh.select(F.col("id").alias("id_a"), "sh")
        .join(sh.select(F.col("id").alias("id_b"), "sh"), "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = toks.select(
        F.col("id").alias("id_a"),
        F.col("toks").alias("toks_a"),
        F.col("n_tok").alias("len_a"),
    )
    b = toks.select(
        F.col("id").alias("id_b"),
        F.col("toks").alias("toks_b"),
        F.col("n_tok").alias("len_b"),
    )
    lcs = lcs_length_udf(max_tokens)
    num = F.lit(2) * F.col("lcs_len") * F.lit(1_000_000)
    den = F.greatest(F.col("len_a") + F.col("len_b"), F.lit(1))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("lcs_len", lcs(F.col("toks_a"), F.col("toks_b")))
        .select(
            "id_a",
            "id_b",
            "len_a",
            "len_b",
            "lcs_len",
            ((num - F.pmod(num, den)) / den)
            .cast("long")
            .alias("rouge_l_micro"),
        )
        .filter(F.col("rouge_l_micro") >= F.lit(int(threshold_micro)))
    )


def rouge_l_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold_micro: int = 700_000,
    **kw,
) -> DataFrame:
    """Survivor frame: drop every doc whose ROUGE-L to a SMALLER-id doc
    clears the threshold (the Self-Instruct keep rule — the pool keeps
    first-seen). One anti-join on the pair frame."""
    pairs = rouge_l_dedup_pairs(
        df, id_col, text_col, threshold_micro, **kw
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")
