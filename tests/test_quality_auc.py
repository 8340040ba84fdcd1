"""Calibration (exact ROC/AUC) pins — verdict r9 #5: planted separable /
inseparable fixtures, exact agreement of the rank-sum AUC with the
brute-force pairwise Mann-Whitney count (tie midranks included), and ROC
monotonicity."""

from itertools import product

from g_data_pipeline_spark.operators.quality import classifier_calibration


def _calib(spark, rows, thr=(0,)):
    df = spark.createDataFrame(rows, ["s", "n", "y"])
    return classifier_calibration(df, "s", "n", "y", tuple(thr)).collect()


def test_auc_separable_is_one(spark):
    rows = [(1_000_000 + i, 10, 1) for i in range(6)] + [
        (-1_000_000 - i, 10, 0) for i in range(4)
    ]
    (out,) = _calib(spark, rows)
    assert (out.n_pos, out.n_neg) == (6, 4)
    assert out.auc_micro == 1_000_000
    assert (out.tp, out.fp, out.fn, out.tn) == (6, 0, 0, 4)
    assert out.tpr_micro == 1_000_000 and out.fpr_micro == 0


def test_auc_inseparable_ties_is_half(spark):
    """All docs share one score: AUC is exactly 0.5 by midrank ties."""
    rows = [(7, 5, 1)] * 3 + [(7, 5, 0)] * 5
    (out,) = _calib(spark, rows)
    assert out.auc_micro == 500_000


def test_auc_matches_bruteforce_pairwise(spark):
    """Mixed scores WITH ties: the rank-sum auc equals the pairwise
    count sum(1[s_p > s_n] + 0.5*1[s_p == s_n]) / (n_pos*n_neg),
    computed here brute-force in integer doubled units."""
    scores = [(5, 1), (3, 1), (3, 0), (8, 1), (1, 0), (3, 1), (1, 1),
              (9, 0), (5, 0), (2, 0)]
    rows = [(s * 1000, 4, y) for s, y in scores]
    (out,) = _calib(spark, rows)
    pos = [s for s, y in scores if y == 1]
    neg = [s for s, y in scores if y == 0]
    num_x2 = sum(
        2 if p > q else (1 if p == q else 0)
        for p, q in product(pos, neg)
    )
    want = round(1e6 * num_x2 / (2.0 * len(pos) * len(neg)))
    assert out.auc_micro == want
    assert (out.n_pos, out.n_neg) == (len(pos), len(neg))


def test_roc_monotone_in_threshold(spark):
    """As the per-token threshold rises, predicted-positive sets shrink:
    tp and fp are non-increasing, and the threshold applies per token
    (score > thr * n_tokens)."""
    rows = [
        (400_000, 2, 1),   # avg 200k/token
        (-100_000, 1, 0),  # avg -100k/token
        (50_000, 1, 1),    # avg 50k/token
        (300_000, 3, 0),   # avg 100k/token
    ]
    out = {
        r.thr_avg_micro: r
        for r in _calib(spark, rows, thr=(-200_000, 0, 100_000, 300_000))
    }
    tps = [out[t].tp for t in sorted(out)]
    fps = [out[t].fp for t in sorted(out)]
    assert tps == sorted(tps, reverse=True)
    assert fps == sorted(fps, reverse=True)
    # spot checks: at 0 everything positive-scored predicts positive
    assert (out[0].tp, out[0].fp) == (2, 1)
    # at 100k/token: doc1 (200k) yes, doc3 (50k) no, doc4 (100k) not > -> no
    assert (out[100_000].tp, out[100_000].fp) == (1, 0)
    # auc identical on every row
    assert len({r.auc_micro for r in out.values()}) == 1


def test_calibration_bins_monotone_when_calibrated(spark):
    from g_data_pipeline_spark.operators.quality import calibration_bins

    # calibrated scorer: higher per-token logit -> higher positive rate
    rows = []
    for band, rate in ((-2, 0.1), (0, 0.5), (2, 0.9)):
        for i in range(20):
            s = (band * 25_000 + 1_000) * 4  # 4 tokens, inside the band
            rows.append((s, 4, 1 if i < rate * 20 else 0))
    df = spark.createDataFrame(rows, ["s", "n", "y"])
    out = {r.band: r for r in calibration_bins(df, "s", "n", "y").collect()}
    assert sorted(out) == [-2, 0, 2]
    assert [out[b].pos_rate_micro for b in (-2, 0, 2)] == [
        100_000, 500_000, 900_000,
    ]
    assert all(out[b].n_docs == 20 for b in out)


def test_calibration_bins_clamp_and_negative_floor(spark):
    from g_data_pipeline_spark.operators.quality import calibration_bins

    rows = [
        (10_000_000, 1, 1),   # way above the top band -> clamp +50
        (-10_000_000, 1, 0),  # below -> clamp -50
        (-30_000, 2, 0),      # avg -15k/token -> band -1 (FLOOR, not trunc)
    ]
    df = spark.createDataFrame(rows, ["s", "n", "y"])
    out = {r.band: r for r in calibration_bins(df, "s", "n", "y").collect()}
    assert set(out) == {50, -50, -1}
