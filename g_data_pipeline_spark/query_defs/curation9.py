"""Round-8 oracle wave 1: script-aware (CJK) tokenization — the
round-7 verdict's #2 directive (the one text-stack gap a multilingual
100 TB crawl hits immediately: whitespace tokenization counts an
entire CJK sentence as ONE token, corrupting every token-based signal
downstream).

- t_cjk_token_stats: whitespace vs script-aware token counts over a
  planted CJK/Latin mixed corpus derived deterministically from the
  documents table (vowels -> Han chars + spaces removed on every third
  doc — the same literal-recipe planting style as d_url_filter). The
  gate proves the CJK docs stop counting as ~1 token under
  ``mode="script"`` while Latin docs count byte-identically in both
  modes, with DuckDB reproducing the script-class regex split exactly
  (explicit code-point ranges, engine-identical by construction —
  functions/text.CJK_CHAR_CLASS).
- v_retrieval_eval (verdict #5): recall@10 / nDCG@10 for two planted
  ranking systems over a relevance recipe derived from the documents
  table — the ranked-retrieval quality report a user tunes n_probe /
  BM25 / banding against (operators/retrieval_eval.py). All-integer
  micros with Python-precomputed log2 discounts shared verbatim by
  both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.functions.text import CJK_CHAR_CLASS, token_count
from g_data_pipeline_spark.queries import register

# ---------------------------------------------------------------------------
# t_cjk_token_stats: script-aware tokenization report on planted CJK
# ---------------------------------------------------------------------------

# Every third doc becomes "CJK-shaped": vowels map to Han ideographs and
# spaces are removed, yielding the whitespace-free mixed-script text a
# real zh/ja crawl produces. Identical literal recipe on both engines.
_HAN = "一二三四五"  # 一二三四五


def _floordiv_sql(num: str, den: str) -> str:
    return f"CAST({num} // GREATEST({den}, 1) AS BIGINT)"


@register(
    "t_cjk_token_stats",
    oracle=f"""
    WITH mixed AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN replace(translate(text, 'aeiou', '{_HAN}'), ' ', '')
                  ELSE text END AS t
      FROM documents
    ), counted AS (
      SELECT CASE WHEN doc_id % 3 = 0 THEN 'cjk_planted' ELSE 'latin' END
               AS bucket,
             CASE WHEN trim(t) = '' THEN 0
                  ELSE len(string_split_regex(trim(lower(t)), '\\s+'))
             END AS ws,
             CASE WHEN trim(regexp_replace(t, '{CJK_CHAR_CLASS}', ' ', 'g'))
                       = '' THEN 0
                  ELSE len(string_split_regex(
                         trim(regexp_replace(t, '{CJK_CHAR_CLASS}', ' ',
                                             'g')), '\\s+'))
             END + len(regexp_extract_all(t, '{CJK_CHAR_CLASS}')) AS sc
      FROM mixed
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ws) AS BIGINT) AS ws_tokens,
           CAST(SUM(sc) AS BIGINT) AS script_tokens,
           {_floordiv_sql("SUM(sc) * 1000000", "SUM(ws)")}
             AS tokens_ratio_micro
    FROM counted GROUP BY bucket
    """,
)
def t_cjk_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Script-aware vs whitespace token accounting
    (functions/text.tokens ``mode="script"``) over a planted CJK/Latin
    mix: every third document is rewritten into whitespace-free
    mixed-script text (vowels -> Han, spaces removed). Per bucket —
    doc count, total whitespace tokens, total script-aware tokens, and
    their micro ratio. The planted bucket's ratio is large (whitespace
    sees ~one token per doc, script mode sees one per CJK char + Latin
    run); the latin bucket's ratio is exactly 1_000_000 (the two modes
    are byte-identical without CJK — the default-path parity claim,
    also pinned in tests/test_script_tokens.py). Zero-shuffle scan
    stage + one 2-group aggregate; the script pass is two regexps per
    doc, whole-stage-codegen'd (no UDFs). DuckDB twin reproduces the
    split with the same explicit code-point class."""
    docs = load_table(spark, sf_dir, "documents")
    planted = F.col("doc_id") % 3 == 0
    mixed = F.when(
        planted,
        F.regexp_replace(
            F.translate(F.col("text"), "aeiou", _HAN), " ", ""
        ),
    ).otherwise(F.col("text"))
    ws = token_count(mixed).cast("long")
    sc = token_count(mixed, mode="script").cast("long")
    counted = docs.select(
        F.when(planted, F.lit("cjk_planted")).otherwise(F.lit("latin")).alias(
            "bucket"
        ),
        ws.alias("ws"),
        sc.alias("sc"),
    )
    num = F.sum("sc") * F.lit(1_000_000)
    den = F.greatest(F.sum("ws"), F.lit(1))
    return counted.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ws").alias("ws_tokens"),
        F.sum("sc").alias("script_tokens"),
        ((num - F.pmod(num, den)) / den).cast("long").alias(
            "tokens_ratio_micro"
        ),
    )


# ---------------------------------------------------------------------------
# v_retrieval_eval: recall@k / nDCG@k over planted systems + relevance
# ---------------------------------------------------------------------------

_K = 10


def _disc_case(rank_expr: str) -> str:
    from g_data_pipeline_spark.operators.retrieval_eval import (
        sql_case_discount,
    )

    return sql_case_discount(rank_expr, _K)


def _retrieval_oracle() -> str:
    return f"""
    WITH q AS (
      SELECT doc_id AS qid, source, n_chars AS q_chars
      FROM documents WHERE doc_id % 25 = 0
    ), cand AS (
      SELECT q.qid, d.doc_id AS d, q.q_chars, d.n_chars,
             CASE WHEN d.n_chars % 16 = q.q_chars % 16 THEN 2
                  WHEN d.n_chars % 8 = q.q_chars % 8 THEN 1
                  ELSE 0 END AS rel
      FROM q JOIN documents d
        ON d.source = q.source AND d.doc_id <> q.qid
    ), results AS (
      SELECT 'md5_rand' AS system, qid, d,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
               md5(CAST(qid AS VARCHAR) || ':' || CAST(d AS VARCHAR)), d)
               AS rank
      FROM cand
      UNION ALL
      SELECT 'len_match', qid, d,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
               abs(n_chars - q_chars), d) AS rank
      FROM cand
    ), rel_pos AS (
      SELECT qid, d, rel FROM cand WHERE rel > 0
    ), ideal AS (
      SELECT qid, COUNT(*) AS n_rel,
             SUM(CASE WHEN ir <= {_K}
                      THEN ((1 << rel) - 1) * ({_disc_case("ir")})
                      ELSE 0 END) AS idcg
      FROM (SELECT qid, rel, ROW_NUMBER() OVER (PARTITION BY qid
                     ORDER BY rel DESC, d) AS ir
            FROM rel_pos)
      GROUP BY qid
    ), topk AS (
      SELECT * FROM results WHERE rank <= {_K}
    ), scored AS (
      SELECT t.system, t.qid, COUNT(r.rel) AS hits,
             SUM(CASE WHEN r.rel IS NOT NULL
                      THEN ((1 << r.rel) - 1) * ({_disc_case("t.rank")})
                      ELSE 0 END) AS dcg
      FROM topk t LEFT JOIN rel_pos r ON r.qid = t.qid AND r.d = t.d
      GROUP BY t.system, t.qid
    ), per_query AS (
      SELECT s.system,
             COALESCE(sc.hits, 0) * 1000000 // i.n_rel AS recall_micro,
             COALESCE(sc.dcg, 0) * 1000000 // i.idcg AS ndcg_micro
      FROM ideal i
      CROSS JOIN (SELECT DISTINCT system FROM topk) s
      LEFT JOIN scored sc ON sc.system = s.system AND sc.qid = i.qid
    )
    SELECT system,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(recall_micro) // COUNT(*) AS BIGINT)
             AS recall_at_k_micro,
           CAST(SUM(ndcg_micro) // COUNT(*) AS BIGINT)
             AS ndcg_at_k_micro
    FROM per_query GROUP BY system
    """


@register("v_retrieval_eval", oracle=_retrieval_oracle())
def v_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked-retrieval quality report (operators/retrieval_eval):
    macro recall@10 and nDCG@10 for two planted systems — 'md5_rand'
    (content-hash shuffle, the do-no-better-than-chance floor) and
    'len_match' (rank by |n_chars - query n_chars|, correlated with the
    planted relevance) — against a graded relevance recipe (rel 2 on
    matching n_chars mod 16, rel 1 on mod 8) over same-source candidate
    pools from the documents table. Every arithmetic step is integer
    micro with Python-precomputed log2 discounts embedded as literals
    on BOTH engines (no cross-engine log2 ulp risk). Scale shape:
    candidates join on source (content-keyed), ranking windows
    partition per query, results join relevance on (query, doc); the
    only non-equi join is the 2-row system list broadcast
    (BroadcastNestedLoopJoin, never CartesianProduct)."""
    from pyspark.sql import Window

    from g_data_pipeline_spark.operators.retrieval_eval import (
        retrieval_eval,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    q = docs.filter(F.col("doc_id") % 25 == 0).select(
        F.col("doc_id").alias("qid"),
        "source",
        F.col("n_chars").alias("q_chars"),
    )
    cand = (
        q.join(docs, "source")
        .filter(F.col("doc_id") != F.col("qid"))
        .select(
            "qid",
            F.col("doc_id").alias("d"),
            "q_chars",
            "n_chars",
            F.when(
                F.col("n_chars") % 16 == F.col("q_chars") % 16, F.lit(2)
            )
            .when(F.col("n_chars") % 8 == F.col("q_chars") % 8, F.lit(1))
            .otherwise(F.lit(0))
            .alias("rel"),
        )
    )
    w_md5 = Window.partitionBy("qid").orderBy(
        F.md5(
            F.concat(
                F.col("qid").cast("string"),
                F.lit(":"),
                F.col("d").cast("string"),
            )
        ),
        "d",
    )
    w_len = Window.partitionBy("qid").orderBy(
        F.abs(F.col("n_chars") - F.col("q_chars")), "d"
    )
    results = (
        cand.select(
            F.lit("md5_rand").alias("system"),
            F.col("qid").alias("query_id"),
            F.col("d").alias("doc_id"),
            F.row_number().over(w_md5).alias("rank"),
        )
        .unionByName(
            cand.select(
                F.lit("len_match").alias("system"),
                F.col("qid").alias("query_id"),
                F.col("d").alias("doc_id"),
                F.row_number().over(w_len).alias("rank"),
            )
        )
    )
    relevance = cand.select(
        F.col("qid").alias("query_id"), F.col("d").alias("doc_id"), "rel"
    )
    return retrieval_eval(results, relevance, k=_K)


# ---------------------------------------------------------------------------
# e_preference_audit: composed DPO-pair gate report (verdict #6)
# ---------------------------------------------------------------------------

# Planted preference pairs from the documents table: prompt/response
# CLASSES are modular in doc_id so genuine duplicates (same class
# triple, same orientation) and label conflicts (same unordered pair,
# both orientations — doc_id % 3 flips) occur by construction; response
# token lengths vary with the class ((d%7)+1 vs (d%5)+1 tokens) for the
# length-bias audit; scores (d%11)/10 vs (d%13)/12 produce negative and
# zero margins. Identical literal recipe on both engines.
_SQL_FPN = (
    "md5(trim(regexp_replace(regexp_replace(lower({x}), "
    "'[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')))"
)


def _fpn(x: str) -> str:
    return _SQL_FPN.format(x=x)


def _pref_oracle() -> str:
    ntok = "len(string_split_regex(trim(lower({x})), '\\s+'))"
    return f"""
    WITH raw AS (
      SELECT doc_id AS pair_id, source,
             'q ' || CAST(doc_id % 50 AS VARCHAR) AS prompt,
             substr('a a a a a a a', 1,
                    2 * CAST(doc_id % 7 AS INT) + 1) AS resp_a,
             substr('b b b b b', 1,
                    2 * CAST(doc_id % 5 AS INT) + 1) AS resp_b,
             (doc_id % 11) / 10.0 AS score_a,
             (doc_id % 13) / 12.0 AS score_b,
             doc_id % 3 = 0 AS flip
      FROM documents
    ), pairs AS (
      SELECT pair_id, source, prompt,
             CASE WHEN flip THEN resp_b ELSE resp_a END AS chosen,
             CASE WHEN flip THEN resp_a ELSE resp_b END AS rejected,
             CASE WHEN flip THEN score_b ELSE score_a END AS cscore,
             CASE WHEN flip THEN score_a ELSE score_b END AS rscore
      FROM raw
    ), bench AS (
      SELECT DISTINCT {_fpn("'q ' || CAST(doc_id % 50 AS VARCHAR)")} AS bfp
      FROM documents WHERE doc_id % 10 = 0
    ), keyed AS (
      SELECT *,
             md5({_fpn('prompt')} || chr(31) || {_fpn('chosen')}
                 || chr(31) || {_fpn('rejected')}) AS fpo,
             md5({_fpn('prompt')} || chr(31)
                 || least({_fpn('chosen')}, {_fpn('rejected')}) || chr(31)
                 || greatest({_fpn('chosen')}, {_fpn('rejected')})) AS fpu
      FROM pairs
    ), flags AS (
      SELECT source,
             pair_id <> MIN(pair_id) OVER (PARTITION BY fpo) AS is_dup,
             MIN(fpo) OVER (PARTITION BY fpu)
               <> MAX(fpo) OVER (PARTITION BY fpu) AS is_conflict,
             {_fpn('prompt')} IN (SELECT bfp FROM bench)
               AS is_contaminated,
             {ntok.format(x='chosen')} AS lc,
             {ntok.format(x='rejected')} AS lr,
             CAST(ROUND(cscore * 1000000) AS BIGINT)
               - CAST(ROUND(rscore * 1000000) AS BIGINT) AS m
      FROM keyed
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dups,
           CAST(SUM(CASE WHEN is_conflict THEN 1 ELSE 0 END) AS BIGINT)
             AS n_conflicts,
           CAST(SUM(CASE WHEN is_contaminated THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated,
           CAST(SUM(CASE WHEN lc > lr THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS chosen_longer_micro,
           CAST(SUM(abs(lc - lr)) * 1000000 // COUNT(*) AS BIGINT)
             AS mean_abs_token_delta_micro,
           CAST(SUM(CASE WHEN m < 0 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS negative_margin_micro,
           CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS zero_margin_micro
    FROM flags GROUP BY source
    """


@register("e_preference_audit", oracle=_pref_oracle())
def e_preference_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed preference-pair (DPO/RLHF) curation gate
    (operators/preferences.preference_audit) on planted pairs: per
    source — pair count, exact duplicates, label conflicts (same
    unordered pair rated in both orientations), eval-prompt
    contamination hits, chosen-longer fraction and mean |token delta|
    (the length-bias audit), and negative/zero score-margin fractions.
    All counts and nonnegative floor-div micros — engine-exact. Shape:
    two fingerprint-keyed windows, one broadcast bench join, one
    rollup; the planting is scan-stage expressions."""
    from g_data_pipeline_spark.operators.preferences import (
        preference_audit,
    )

    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    resp_a = F.substring(
        F.lit("a a a a a a a"), 1, (d % 7).cast("int") * 2 + 1
    )
    resp_b = F.substring(
        F.lit("b b b b b"), 1, (d % 5).cast("int") * 2 + 1
    )
    flip = d % 3 == 0
    pairs = docs.select(
        d.alias("pair_id"),
        "source",
        F.concat(F.lit("q "), (d % 50).cast("string")).alias("prompt"),
        F.when(flip, resp_b).otherwise(resp_a).alias("chosen"),
        F.when(flip, resp_a).otherwise(resp_b).alias("rejected"),
        F.when(flip, (d % 13) / F.lit(12.0))
        .otherwise((d % 11) / F.lit(10.0))
        .alias("cscore"),
        F.when(flip, (d % 11) / F.lit(10.0))
        .otherwise((d % 13) / F.lit(12.0))
        .alias("rscore"),
    )
    bench = (
        docs.filter(d % 10 == 0)
        .select(
            F.concat(F.lit("q "), (d % 50).cast("string")).alias("prompt")
        )
        .distinct()
    )
    return preference_audit(
        pairs,
        bench,
        group_cols=["source"],
        chosen_score="cscore",
        rejected_score="rscore",
    )
