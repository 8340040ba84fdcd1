"""Distributed BPE tokenizer: corpus-statistics training + Arrow-batched
encoding.

The standard byte-pair-encoding training recipe (Sennrich et al. 2016;
GPT-2's tokenizer trains the same way) is a hybrid:

1. **Distributed pass** — word frequency table. One groupBy over the
   corpus; the result is vocabulary-sized, orders of magnitude smaller
   than the corpus. A ``top_words`` cap keeps the driver table bounded at
   any corpus size (rank by count, ties by word — deterministic); BPE
   statistics are dominated by frequent words, so the cap costs little.
2. **Driver-side merge learning** — classic BPE over the compact
   (word -> count) dict: repeatedly merge the most frequent adjacent
   symbol pair. Pure Python over ~10⁴ rows; the corpus is never touched
   again. Ties break lexicographically, so the learned merge list is a
   deterministic function of the word counts.
3. **Distributed encode** — broadcast the merge ranks; apply to every
   document via ``mapInPandas`` (Arrow-batched, per-batch word cache so
   each distinct word in a batch is segmented once). Tokenization is the
   canonical Python-library stage of real pipelines (HF tokenizers); the
   plumbing here — broadcast model, batched apply, scalar outputs — is the
   part that must be Spark-correct.

End-of-word marker ``</w>`` distinguishes "low" in "lowest" from final
"low", per the original paper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from g_data_pipeline_spark.functions.text import tokens

EOW = "</w>"


def word_counts(df: DataFrame, text_col: str, top_words: int = 50_000) -> list[tuple[str, int]]:
    """Distributed pass: (word, count) rows, capped at ``top_words`` by
    (count desc, word asc) — deterministic under any partitioning."""
    wc = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(top_words)
    )
    return [(r.w, r.c) for r in wc.collect()]


def _pair_stats(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    stats: dict[tuple[str, str], int] = {}
    for syms, cnt in vocab.items():
        for i in range(len(syms) - 1):
            pair = (syms[i], syms[i + 1])
            stats[pair] = stats.get(pair, 0) + cnt
    return stats


def _merge_vocab(
    vocab: dict[tuple[str, ...], int], pair: tuple[str, str]
) -> dict[tuple[str, ...], int]:
    merged = pair[0] + pair[1]
    out: dict[tuple[str, ...], int] = {}
    for syms, cnt in vocab.items():
        new: list[str] = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == pair[0] and syms[i + 1] == pair[1]:
                new.append(merged)
                i += 2
            else:
                new.append(syms[i])
                i += 1
        out[tuple(new)] = out.get(tuple(new), 0) + cnt
    return out


def _initial_symbols(word: str, eow_mode: str) -> list[str]:
    """A word's initial BPE symbol sequence under the given end-of-word
    convention. ``standalone`` (subword-nmt, the repo default): chars +
    a separate ``</w>`` symbol. ``suffix`` (huggingface/tokenizers
    ``end_of_word_suffix``): the LAST char carries the suffix — no
    standalone symbol ever exists, so models trained in this mode export
    to a tokenizer.json a real HF consumer reproduces exactly (the two
    conventions learn genuinely different merge lists; a merge list is
    NOT translatable between them — see hf_tokenizer.py)."""
    if eow_mode == "standalone":
        return list(word) + [EOW]
    if eow_mode == "suffix":
        return list(word[:-1]) + [word[-1] + EOW]
    raise ValueError(f"unknown eow_mode {eow_mode!r}")


def learn_bpe(
    counts: list[tuple[str, int]],
    num_merges: int = 200,
    eow_mode: str = "standalone",
) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a (word, count) table. Returns the
    ordered merge list. Deterministic: best pair by (count desc, pair asc).
    Stops early when no pair occurs twice. ``eow_mode="suffix"`` trains
    under the HF end_of_word_suffix convention (see _initial_symbols)."""
    vocab = {tuple(_initial_symbols(w, eow_mode)): c for w, c in counts}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        stats = _pair_stats(vocab)
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        merges.append(best[0])
        vocab = _merge_vocab(vocab, best[0])
    return merges


def segment_word(
    word: str,
    ranks: dict[tuple[str, str], int],
    eow_mode: str = "standalone",
) -> list[str]:
    """Apply learned merges to one word (greedy lowest-rank-first — the
    standard BPE inference loop). ``eow_mode`` must match the mode the
    merges were LEARNED under."""
    syms = _initial_symbols(word, eow_mode)
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
    eow_mode: str = "standalone",
) -> DataFrame:
    """Encode documents -> (id, n_words, n_bpe_tokens, n_unmerged):
    per-document BPE token counts (the token-budget numbers that drive
    packing/sharding). ``n_unmerged`` counts single-character symbols — a
    high share means the merge table does not cover the document's script
    (the out-of-domain signal). Broadcast model; Arrow-batched; per-batch
    word cache."""
    if eow_mode not in ("standalone", "suffix"):
        raise ValueError(f"unknown eow_mode {eow_mode!r}")
    ranks = {pair: i for i, pair in enumerate(merges)}
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("n_words", T.LongType()),
            T.StructField("n_bpe_tokens", T.LongType()),
            T.StructField("n_unmerged", T.LongType()),
        ]
    )

    def batches(it):
        import re as _re

        import pandas as pd

        # Tokenize EXACTLY like the training pass (functions.text.tokens:
        # Java \s+ over lowercased text — ASCII whitespace only). Python's
        # str.split() uses Unicode whitespace and would segment words the
        # merge table never saw (e.g. around U+00A0).
        ws = _re.compile(r"\s+", _re.ASCII)
        # Cache the COUNTS per unique word, not the segment list: the
        # "unmerged" scan is then paid once per distinct word instead of
        # once per occurrence (r10 — the per-occurrence genexpr dominated
        # this kernel).
        cache: dict[str, tuple[int, int]] = {}
        for pdf in it:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in ws.split(str(text or "").lower()) if w]
                n_tok = n_unm = 0
                for w in words:
                    tu = cache.get(w)
                    if tu is None:
                        seg = segment_word(w, ranks, eow_mode)
                        # "unmerged" = still an initial single-char
                        # symbol; in suffix mode the word-final initial
                        # symbol is char + EOW (len 1 + len(EOW))
                        tu = (
                            len(seg),
                            sum(
                                1
                                for s in seg
                                if len(s) == 1
                                or (
                                    eow_mode == "suffix"
                                    and s.endswith(EOW)
                                    and len(s) == 1 + len(EOW)
                                )
                            ),
                        )
                        cache[w] = tu
                    n_tok += tu[0]
                    n_unm += tu[1]
                rows.append((int(did), len(words), n_tok, n_unm))
            yield pd.DataFrame(
                rows, columns=["id", "n_words", "n_bpe_tokens", "n_unmerged"]
            )

    return df.select(id_col, text_col).mapInPandas(batches, schema)


def save_merges(merges: list[tuple[str, str]], path: str) -> None:
    """Write the merge list in the subword-nmt ``merges.txt`` interchange
    format (``#version`` header, one space-separated symbol pair per
    line, rank = line order) — the format ``subword-nmt learn-bpe`` and
    GPT-2-style ``merges.txt`` files use, so a model trained here can be
    consumed elsewhere and vice versa."""
    with open(path, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            if " " in a or " " in b:
                raise ValueError(f"symbol contains a space: {(a, b)!r}")
            f.write(f"{a} {b}\n")


def load_merges(path: str) -> list[tuple[str, str]]:
    """Read a subword-nmt-format merges file (bring-your-own-tokenizer
    seam): comment/blank lines ignored, each line a space-separated
    symbol pair in rank order. The result plugs straight into
    :func:`bpe_encode` (broadcast model, no retraining pass)."""
    merges: list[tuple[str, str]] = []
    with open(path, encoding="utf-8") as f:
        for ln, line in enumerate(f, 1):
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            parts = line.split(" ")
            if len(parts) != 2:
                raise ValueError(
                    f"{path}:{ln}: expected 'sym1 sym2', got {line!r}"
                )
            merges.append((parts[0], parts[1]))
    return merges


def vocab_coverage_curve(
    df: DataFrame,
    text_col: str = "text",
    pcts: tuple[float, ...] = (0.5, 0.9, 0.95, 0.99),
) -> DataFrame:
    """How many top-frequency tokens cover each share of corpus
    occurrences — the vocabulary-sizing diagnostic run before committing
    to a tokenizer budget (Zipf corpora typically cover 90% with a tiny
    head and pay the long tail for the rest).

    Output, one row per requested share: (pct_micro, vocab_size —
    smallest prefix of the (count DESC, token ASC) ranking whose
    cumulative occurrences reach the share, coverage_micro — the floored
    share that prefix actually covers, n_distinct_tokens,
    total_occurrences).

    Scale shape: one token-count aggregate (shuffle keyed on token
    content), then rank + cumulative occurrences via the two-phase
    bucketed kernel (operators/windows.bucketed_row_index with
    running_sum_of) — the exact count is its own leading bucket (Zipf
    tails make counts low-cardinality) refined by a token-prefix bucket,
    so no single-partition sort of the vocabulary ever happens; the
    thresholds reduce in ONE aggregate over the ranked frame.
    """
    from g_data_pipeline_spark.functions.text import tokens
    from g_data_pipeline_spark.operators.windows import bucketed_row_index

    tok = df.select(F.explode(tokens(F.col(text_col))).alias("tk"))
    counts = tok.groupBy("tk").agg(F.count(F.lit(1)).alias("cnt"))
    ranked = bucketed_row_index(
        counts,
        [("cnt", False), ("tk", True)],
        # exact count (desc) as the leading bucket; 2-char token prefix
        # (asc, a monotone coarsening of the tk order) splits the huge
        # cnt=1 tie block across tasks
        [(F.col("cnt"), False), (F.substring("tk", 1, 2), True)],
        running_sum_of="cnt",
    )
    # decimal(38,0) before the 1e6 scale-up multiplications: cumulative
    # occurrence counts are int64, and cum * 1_000_000 overflows a long
    # under ANSI once total occurrences pass ~9.2e12 — inside the 100 TB
    # envelope (the xxhash64 checksum-sum convention, CLAUDE.md).
    cum_dec = F.col("__cum").cast("decimal(38,0)")
    tot_dec = F.col("__sum_total").cast("decimal(38,0)")
    per_pct = []
    for p in pcts:
        micro = int(round(p * 1_000_000))
        hit = F.when(
            cum_dec * F.lit(1_000_000) >= F.lit(micro) * tot_dec,
            F.struct(F.col("__rn").alias("rn"), F.col("__cum").alias("cum")),
        )
        per_pct.append(
            F.min(hit).alias(f"__h{micro}")
        )
    agg = ranked.agg(
        *per_pct,
        F.max("__total").alias("__n_vocab"),
        F.max("__sum_total").alias("__n_occ"),
    )
    def _cov_micro(p: float):
        # exact integer floor((cum * 1e6) / occ) in decimal(38,0): the
        # subtract-pmod form avoids decimal division's scale-6 HALF_UP
        # rounding landing a near-boundary quotient on the wrong floor.
        micro = int(round(p * 1_000_000))
        nd = F.col(f"__h{micro}.cum").cast("decimal(38,0)") * F.lit(1_000_000)
        occ = F.col("__n_occ").cast("decimal(38,0)")
        return ((nd - F.pmod(nd, occ)) / occ).cast("long")

    rows = F.array(
        *[
            F.struct(
                F.lit(int(round(p * 1_000_000))).alias("pct_micro"),
                F.col(f"__h{int(round(p * 1_000_000))}.rn").alias(
                    "vocab_size"
                ),
                _cov_micro(p).alias("coverage_micro"),
                F.col("__n_vocab").cast("long").alias("n_distinct_tokens"),
                F.col("__n_occ").cast("long").alias("total_occurrences"),
            )
            for p in pcts
        ]
    )
    return agg.select(F.explode(rows).alias("s")).select("s.*")
