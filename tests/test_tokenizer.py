"""BPE tokenizer: merge-learning correctness on a crafted corpus, encode
parity with a pure-Python single-process reference, and determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from g_data_pipeline_spark.operators.tokenizer import (
    EOW,
    bpe_encode,
    learn_bpe,
    segment_word,
    word_counts,
)


def test_learn_bpe_merges_frequent_pairs_first():
    # "ab" appears in every word and dominates; then "ab"+"c" from abc.
    counts = [("abc", 10), ("abd", 6), ("ab", 3)]
    merges = learn_bpe(counts, num_merges=3)
    assert merges[0] == ("a", "b")
    assert ("ab", "c") in merges


def test_learn_bpe_deterministic_tiebreak():
    # two pairs tie on count -> lexicographically smaller pair wins
    counts = [("xy", 5), ("pq", 5)]
    merges = learn_bpe(counts, num_merges=1)
    assert merges[0] == ("p", "q")


def test_segment_word_applies_ranks_in_order():
    merges = [("l", "o"), ("lo", "w"), ("low", EOW)]
    ranks = {m: i for i, m in enumerate(merges)}
    assert segment_word("low", ranks) == ["low" + EOW]
    # "lowest": "low" merges but never attaches EOW (est intervenes)
    seg = segment_word("lowest", ranks)
    assert seg[0] == "low"
    assert seg[-1] == EOW


def test_word_counts_cap_is_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "b b b a a c")], ["doc_id", "text"]
    )
    top2 = word_counts(df, "text", top_words=2)
    assert top2 == [("b", 3), ("a", 2)]


def test_bpe_encode_matches_pure_python_reference(spark):
    rows = [
        (0, "low lower lowest"),
        (1, "new newer newest low"),
        (2, ""),
        (3, "zzz unseen glyphs"),
        (4, "low\u00a0lower"),  # NBSP: ONE word on both sides (ASCII \s+)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    counts = word_counts(df, "text")
    merges = learn_bpe(counts, num_merges=30)
    ranks = {m: i for i, m in enumerate(merges)}

    got = {
        r.id: (r.n_words, r.n_bpe_tokens, r.n_unmerged)
        for r in bpe_encode(df, "doc_id", "text", merges).collect()
    }
    import re as _re

    ws = _re.compile(r"\s+", _re.ASCII)
    for did, text in rows:
        words = [w for w in ws.split(text.lower()) if w]
        n_tok = n_unm = 0
        for w in words:
            seg = segment_word(w, ranks)
            n_tok += len(seg)
            n_unm += sum(1 for s in seg if len(s) == 1)
        assert got[did] == (len(words), n_tok, n_unm), did
    # blank doc is total-labeled with zeros, not dropped
    assert got[2] == (0, 0, 0)


def test_bpe_end_to_end_on_documents(spark):
    from tests.conftest import SF_DIR_SMOKE

    docs = (
        spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet")
        .select("doc_id", "text")
    )
    counts = word_counts(docs, "text", top_words=2000)
    merges = learn_bpe(counts, num_merges=100)
    out = bpe_encode(docs, "doc_id", "text", merges)
    agg = out.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_bpe_tokens").alias("tok"),
        F.sum("n_words").alias("words"),
    ).collect()[0]
    assert agg.rows == docs.count()  # total labeling
    # merges compress: fewer than pure char+EOW tokens, at least one per word
    assert agg.words <= agg.tok
    chars_plus_eow = docs.select(
        F.sum(
            F.aggregate(
                F.transform(
                    F.split(F.trim(F.lower("text")), r"\s+"),
                    lambda w: F.length(w) + 1,
                ),
                F.lit(0),
                lambda a, x: a + x,
            )
        )
    ).collect()[0][0]
    assert agg.tok < chars_plus_eow
    # determinism: re-learning from the same corpus gives the same merges
    assert learn_bpe(word_counts(docs, "text", top_words=2000), 100) == merges


def test_merges_file_roundtrip_and_interop(spark, tmp_path):
    """save/load in the subword-nmt merges.txt format: a round-trip is
    identity, and a hand-written external file drives bpe_encode without
    any training pass (the bring-your-own-tokenizer seam)."""
    from g_data_pipeline_spark.operators.tokenizer import (
        bpe_encode,
        learn_bpe,
        load_merges,
        save_merges,
        word_counts,
    )

    docs = spark.createDataFrame(
        [(1, "low low low lower lowest"), (2, "new newer newest low")],
        "doc_id long, text string",
    )
    merges = learn_bpe(word_counts(docs, "text"), num_merges=20)
    path = str(tmp_path / "merges.txt")
    save_merges(merges, path)
    assert load_merges(path) == merges

    learned = sorted(
        tuple(r) for r in bpe_encode(docs, "doc_id", "text", merges).collect()
    )
    loaded = sorted(
        tuple(r)
        for r in bpe_encode(docs, "doc_id", "text", load_merges(path)).collect()
    )
    assert learned == loaded

    # external file written by another tool (same public format)
    ext = str(tmp_path / "external.txt")
    with open(ext, "w") as f:
        f.write("#version: 0.2\nl o\nlo w\nlow </w>\n")
    ext_merges = load_merges(ext)
    assert ext_merges == [("l", "o"), ("lo", "w"), ("low", "</w>")]
    row = {
        r["id"]: r
        for r in bpe_encode(docs, "doc_id", "text", ext_merges).collect()
    }
    # 'low' fully merges to one token; other words stay char-level
    assert row[1]["n_words"] == 5 and row[2]["n_words"] == 4


def test_vocab_coverage_curve_matches_python_exact(spark):
    """Kernel-ranked coverage curve == an exact Python recompute on the
    corpus: smallest (count DESC, token ASC) prefix reaching each share."""
    from collections import Counter

    from g_data_pipeline_spark.catalog import load_table
    from g_data_pipeline_spark.operators.tokenizer import vocab_coverage_curve

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    pcts = (0.5, 0.9, 0.95, 0.99)
    got = {
        r.pct_micro: (
            r.vocab_size,
            r.coverage_micro,
            r.n_distinct_tokens,
            r.total_occurrences,
        )
        for r in vocab_coverage_curve(docs, "text", pcts).collect()
    }

    c = Counter()
    for (text,) in docs.select("text").collect():
        c.update(text.strip().lower().split())
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(c.values())
    want = {}
    for p in pcts:
        micro = int(round(p * 1_000_000))
        cum = 0
        for i, (tk, n) in enumerate(ranked, start=1):
            cum += n
            if cum * 1_000_000 >= micro * total:
                want[micro] = (i, cum * 1_000_000 // total, len(ranked), total)
                break
    assert got == want
    # sanity: curve is monotone and Zipf-shaped (90% needs far less than
    # the full vocabulary)
    sizes = [got[int(p * 1e6)][0] for p in pcts]
    assert sizes == sorted(sizes)
    assert sizes[1] < got[990000][2]


def test_hf_tokenizer_json_roundtrip_bpe(spark, tmp_path):
    """HF tokenizer.json interop (r8 verdict #5), mirroring the
    merges.txt pins: save -> load is identity on the merge list, the
    loaded model drives bpe_encode to byte-identical counts, and the
    exported vocab follows the merge-rank id convention."""
    from g_data_pipeline_spark.operators.hf_tokenizer import (
        bpe_vocab_from_merges,
        load_hf_bpe,
        load_hf_model,
        save_hf_bpe,
    )
    from g_data_pipeline_spark.operators.tokenizer import (
        learn_bpe,
        word_counts,
    )

    docs = spark.createDataFrame(
        [(1, "low low low lower lowest"), (2, "new newer newest low")],
        "doc_id long, text string",
    )
    merges = learn_bpe(word_counts(docs, "text"), num_merges=20)
    path = str(tmp_path / "tokenizer.json")
    save_hf_bpe(merges, path)
    assert load_hf_bpe(path) == merges
    assert load_hf_model(path) == ("bpe", merges)

    learned = sorted(
        tuple(r) for r in bpe_encode(docs, "doc_id", "text", merges).collect()
    )
    loaded = sorted(
        tuple(r)
        for r in bpe_encode(docs, "doc_id", "text", load_hf_bpe(path)).collect()
    )
    assert learned == loaded

    vocab = bpe_vocab_from_merges(merges)
    # ids: unk=0, alphabet sorted, then merge products in rank order
    assert vocab["<unk>"] == 0
    n_alpha = len(vocab) - 1 - len(merges)
    for i, (a, b) in enumerate(merges):
        assert vocab[a + b] == 1 + n_alpha + i
    # deterministic: a re-export is byte-identical
    path2 = str(tmp_path / "tokenizer2.json")
    save_hf_bpe(merges, path2)
    assert open(path).read() == open(path2).read()


def test_hf_tokenizer_json_external_file_and_pair_merges(spark, tmp_path):
    """A hand-written external tokenizer.json (as another tool would
    produce it — including the tokenizers>=0.20 pair-list merge form)
    drives bpe_encode with no training pass, and a brought tokenizer
    feeds pack_sequences through tokens_col (the
    bring-your-own-tokenizer budget/packing loop)."""
    import json

    from g_data_pipeline_spark.operators.hf_tokenizer import load_hf_bpe
    from g_data_pipeline_spark.operators.packing import pack_sequences

    ext = str(tmp_path / "external.json")
    with open(ext, "w") as f:
        json.dump(
            {
                "version": "1.0",
                "model": {
                    "type": "BPE",
                    "vocab": {},
                    "merges": [["l", "o"], ["lo", "w"], ["low", "</w>"]],
                },
            },
            f,
        )
    ext_merges = load_hf_bpe(ext)
    assert ext_merges == [("l", "o"), ("lo", "w"), ("low", "</w>")]

    docs = spark.createDataFrame(
        [(1, "low low low lower lowest"), (2, "new newer newest low")],
        "doc_id long, text string",
    )
    counted = bpe_encode(docs, "doc_id", "text", ext_merges)
    with_counts = docs.join(
        counted.withColumnRenamed("id", "doc_id"), "doc_id"
    ).withColumn("grp", F.lit("all"))
    packed = pack_sequences(
        with_counts,
        "doc_id",
        "text",
        "grp",
        capacity=8,
        tokens_col="n_bpe_tokens",
    )
    rows = {r.doc_id: r for r in packed.collect()}
    assert set(rows) == {1, 2}
    # packing positions follow the BROUGHT tokenizer's counts exactly:
    # doc 2 starts where doc 1's external-table token run ends.
    counts = {r.id: r.n_bpe_tokens for r in counted.collect()}
    assert (rows[1].bin_id, rows[1].bin_offset) == (0, 0)
    assert rows[2].bin_id == counts[1] // 8
    assert rows[2].bin_offset == counts[1] % 8


def test_hf_tokenizer_json_roundtrip_unigram(tmp_path):
    """Unigram model save -> load is identity (up to float repr) and
    viterbi_segment under the loaded model matches the trained one."""
    from g_data_pipeline_spark.operators.hf_tokenizer import (
        load_hf_model,
        load_hf_unigram,
        save_hf_unigram,
    )
    from g_data_pipeline_spark.operators.unigram_lm import (
        train_unigram,
        viterbi_segment,
    )

    counts = [("lowest", 5), ("lower", 4), ("low", 6), ("newest", 3)]
    model = train_unigram(counts, vocab_size=30)
    path = str(tmp_path / "unigram.json")
    save_hf_unigram(model, path)
    loaded = load_hf_unigram(path)
    assert loaded == model  # json round-trips python floats exactly
    kind, via_dispatch = load_hf_model(path)
    assert kind == "unigram" and via_dispatch == model
    for w, _ in counts:
        assert viterbi_segment(w, loaded) == viterbi_segment(w, model)


def test_hf_tokenizer_json_rejects_wrong_type(tmp_path):
    import json

    import pytest as _pytest

    from g_data_pipeline_spark.operators.hf_tokenizer import (
        load_hf_bpe,
        load_hf_unigram,
    )

    path = str(tmp_path / "t.json")
    with open(path, "w") as f:
        json.dump({"model": {"type": "WordPiece", "vocab": {}}}, f)
    with _pytest.raises(ValueError):
        load_hf_bpe(path)
    with _pytest.raises(ValueError):
        load_hf_unigram(path)


# ---------------------------------------------------------------------------
# End-of-word conventions (r9 ADVICE): suffix-mode training/export is the
# genuinely HF-consumable path; loads validate conventions instead of
# silently miscounting.
# ---------------------------------------------------------------------------


def test_suffix_mode_roundtrip_and_declared_suffix(spark, tmp_path):
    import json

    from g_data_pipeline_spark.operators.hf_tokenizer import (
        load_hf_bpe,
        load_hf_model,
        save_hf_bpe,
    )
    from g_data_pipeline_spark.operators.tokenizer import (
        bpe_encode,
        learn_bpe,
        word_counts,
    )

    docs = spark.createDataFrame(
        [(i, "the lowest lower low " * 3) for i in range(4)]
        + [(10 + i, "newer news new knows " * 3) for i in range(4)],
        ["doc_id", "text"],
    )
    merges = learn_bpe(word_counts(docs, "text"), 20, eow_mode="suffix")
    # suffix convention: no merge part is a bare standalone </w>
    assert all(a != "</w>" and b != "</w>" for a, b in merges)
    path = str(tmp_path / "suffix.json")
    save_hf_bpe(merges, path, eow_mode="suffix")
    doc = json.load(open(path))
    assert doc["model"]["end_of_word_suffix"] == "</w>"
    # suffixed single chars are initial symbols, present in the vocab
    assert any(k.endswith("</w>") and len(k) == 5 for k in doc["model"]["vocab"])
    reloaded = load_hf_bpe(path, eow_mode="suffix")
    assert reloaded == merges
    assert load_hf_model(path) == ("bpe-suffix", merges)
    direct = {
        tuple(r)
        for r in bpe_encode(docs, "doc_id", "text", merges, "suffix").collect()
    }
    via_file = {
        tuple(r)
        for r in bpe_encode(docs, "doc_id", "text", reloaded, "suffix").collect()
    }
    assert direct == via_file


def test_convention_mismatch_loads_raise(tmp_path):
    import json

    import pytest

    from g_data_pipeline_spark.operators.hf_tokenizer import (
        load_hf_bpe,
        save_hf_bpe,
    )

    std = str(tmp_path / "std.json")
    save_hf_bpe([("l", "o"), ("lo", "w"), ("low", "</w>")], std)
    with pytest.raises(ValueError, match="end_of_word_suffix"):
        load_hf_bpe(std, eow_mode="suffix")

    sfx = str(tmp_path / "sfx.json")
    save_hf_bpe([("o", "w</w>"), ("l", "ow</w>")], sfx, eow_mode="suffix")
    with pytest.raises(ValueError, match="end_of_word_suffix"):
        load_hf_bpe(sfx)  # plain load would silently miscount

    # a brought production model with a continuing_subword_prefix must
    # be rejected, whatever the eow declaration
    doc = json.load(open(std))
    doc["model"]["continuing_subword_prefix"] = "##"
    wp = str(tmp_path / "wordpiece-ish.json")
    json.dump(doc, open(wp, "w"))
    with pytest.raises(ValueError, match="continuing_subword_prefix"):
        load_hf_bpe(wp)


def test_suffix_export_rejects_standalone_merges(tmp_path):
    import pytest

    from g_data_pipeline_spark.operators.hf_tokenizer import save_hf_bpe

    with pytest.raises(ValueError, match="suffix convention"):
        save_hf_bpe(
            [("low", "</w>")], str(tmp_path / "x.json"), eow_mode="suffix"
        )


def test_conventions_learn_different_merges(spark):
    """The two conventions genuinely differ (why no translation exists):
    same corpus, different merge lists and token counts."""
    from g_data_pipeline_spark.operators.tokenizer import (
        learn_bpe,
        segment_word,
        word_counts,
    )

    docs = spark.createDataFrame(
        [(i, "abc abd abe " * 4) for i in range(3)], ["doc_id", "text"]
    )
    counts = word_counts(docs, "text")
    std = learn_bpe(counts, 10)
    sfx = learn_bpe(counts, 10, eow_mode="suffix")
    assert std != sfx
    # each mode segments consistently under its own merges
    r_std = {p: i for i, p in enumerate(std)}
    r_sfx = {p: i for i, p in enumerate(sfx)}
    assert segment_word("abc", r_std)[-1].endswith("</w>") or (
        segment_word("abc", r_std)[-1] == "</w>"
    )
    assert segment_word("abc", r_sfx, "suffix")[-1].endswith("</w>")
