"""Best-fit (length-grouped FFD) packing pins — verdict r9 #7: bin
capacity invariants, the harmonic waste bound, dense global bin ids, and
the waste-reduction parity vs one-doc-per-sequence padding (the measure
t_context_fit_report reports)."""

from pyspark.sql import functions as F

from g_data_pipeline_spark.operators.packing import bestfit_pack
from tests.conftest import SF_DIR_SMOKE


def _doc(n: int) -> str:
    return " ".join(["t"] * n)


def test_bestfit_planted_classes_and_bins(spark):
    """Known lengths land in the expected harmonic classes, fill bins k
    at a time in length-DESC order, and overflow docs span bins."""
    rows = [
        # class 0 (overflow): 1300 tokens -> ceil(1300/512)=3 units
        (1, "g1", _doc(1300)),
        # class 1 (257..512 tokens): two docs -> two separate bins
        (2, "g1", _doc(400)),
        (3, "g1", _doc(300)),
        # class 2 (171..256): three docs -> bins of 2 + a short bin
        (4, "g1", _doc(256)),
        (5, "g1", _doc(200)),
        (6, "g1", _doc(180)),
        # class 8 clamp (<=64) + empty doc
        (7, "g1", _doc(10)),
        (8, "g1", ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {
        r.doc_id: r
        for r in bestfit_pack(
            df, "doc_id", "text", "source", capacity=512, k_max=8
        ).collect()
    }
    assert len(out) == len(rows)
    assert out[1].class_k == 0 and out[1].spans_bins
    assert out[1].bin_waste == 3 * 512 - 1300
    assert out[2].class_k == 1 and out[3].class_k == 1
    assert out[2].bin_id != out[3].bin_id  # class-1 bins hold 1 doc
    assert {out[4].class_k, out[5].class_k, out[6].class_k} == {2}
    # FFD order within class 2: 256,200 share bin 0 of the class;
    # 180 starts the next bin.
    assert out[4].bin_id == out[5].bin_id != out[6].bin_id
    assert (out[4].slot, out[5].slot, out[6].slot) == (0, 1, 0)
    assert out[4].bin_fill == 456 and out[4].bin_waste == 512 - 456
    assert out[7].class_k == 8 and out[8].class_k == 8
    assert out[8].n_tokens == 0 and not out[8].spans_bins
    # global bin ids are dense 0..n_bins-1
    ids = sorted({r.bin_id for r in out.values()})
    assert ids == list(range(len(ids)))


def test_bestfit_capacity_and_waste_bounds(spark):
    """On the real corpus: every shared bin fits in one capacity unit;
    every FULL class-k bin (k docs) wastes < capacity/(k+1) — the
    harmonic guarantee (class-k docs are strictly longer than
    capacity/(k+1)); nothing is lost or duplicated."""
    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet")
    out = bestfit_pack(
        docs, "doc_id", "text", "source", capacity=512, k_max=8
    ).cache()
    try:
        assert out.count() == docs.count()
        assert out.select("doc_id").distinct().count() == docs.count()
        bins = (
            out.groupBy("source", "class_k", "bin_id")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.first("bin_fill").alias("fill"),
                F.first("bin_waste").alias("waste"),
            )
            .collect()
        )
        for b in bins:
            if b.class_k == 0:
                continue  # overflow bins measured against their span
            assert b.fill <= 512, b
            assert b.fill + b.waste == 512, b
            if 1 <= b.class_k <= 7 and b.n_docs == b.class_k:
                assert b.waste < 512 / (b.class_k + 1), b
    finally:
        out.unpersist()


def test_bestfit_beats_per_example_padding(spark):
    """The parity pin vs t_context_fit_report's measure: total best-fit
    padding over non-overflow bins is far below one-doc-per-sequence
    padding at the same 512-token context (the report's padding_tokens),
    because bins co-host k short docs instead of padding each to 512."""
    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet")
    n = F.col("n")
    report = (
        docs.select(
            F.when(F.trim("text") == "", F.lit(0))
            .otherwise(F.size(F.split(F.trim(F.lower("text")), r"\s+")))
            .cast("long")
            .alias("n")
        )
        .agg(
            (
                F.count_if(n > 0) * F.lit(512)
                - F.sum(F.least(n, F.lit(512)))
            ).alias("padding_tokens")
        )
        .collect()[0]
    )
    out = bestfit_pack(
        docs, "doc_id", "text", "source", capacity=512, k_max=8
    )
    bestfit_waste = (
        out.filter(F.col("class_k") > 0)
        .groupBy("source", "class_k", "bin_id")
        .agg(F.first("bin_waste").alias("waste"))
        .agg(F.sum("waste").alias("w"))
        .collect()[0]
        .w
    )
    assert bestfit_waste < report.padding_tokens / 2, (
        bestfit_waste,
        report.padding_tokens,
    )
