"""URL-level quality filter (functions/urls.py): each signal pinned on a
crafted fixture, the composed gate, and the zero-shuffle plan shape."""

from __future__ import annotations

from g_data_pipeline_spark.functions.urls import url_filter_report

URLS = [
    (1, "https://news.example.com/world/2024/story-title"),       # clean
    (2, "https://SPIN.casino-hits.com/win"),                      # token
    (3, "https://cheap.pills.click/buy"),                         # tld
    (4, "https://a.example.com/1/2/3/4/5/6/7/8/9/10"),            # depth
    (5, "https://x1234567890.9999.com/p"),                        # digit host
    (6, "https://shop.example.com/item?id=3&utm_source=f&s=1"),   # params ok
    (7, "not-a-url-at-all"),                                      # no host
]


def _report(spark):
    df = spark.createDataFrame(URLS, "id long, url string")
    return {r.id: r for r in url_filter_report(df).collect()}


def test_signals_and_gate(spark):
    got = _report(spark)
    r1 = got[1]
    assert (r1.host, r1.tld, r1.path_depth) == ("news.example.com", "com", 3)
    assert r1.keep and not r1.blocked_token and not r1.blocked_tld
    assert got[2].blocked_token and not got[2].keep
    assert got[3].blocked_tld and got[3].tld == "click" and not got[3].keep
    assert got[4].path_depth == 10 and not got[4].keep
    assert got[5].host_digit_ratio_micro > 400_000 and not got[5].keep
    assert got[6].n_query_params == 3 and got[6].keep
    assert got[7].host == "" and not got[7].keep


def test_custom_blocklists_are_plumbed_through(spark):
    df = spark.sparkContext.parallelize(
        [(1, "https://ok.example.org/fine")]
    ).toDF(["id", "url"])
    strict = {
        r.id: r
        for r in url_filter_report(
            df, blocked_tlds=("org",), blocked_tokens=("fine",)
        ).collect()
    }
    assert strict[1].blocked_tld and strict[1].blocked_token
    assert not strict[1].keep


def test_zero_shuffle_scan_stage_plan(spark):
    from g_data_pipeline_spark.operators.planlint import plan_report

    df = spark.createDataFrame(URLS, "id long, url string")
    rep = plan_report(url_filter_report(df))
    assert rep["shuffles"] == 0
    assert not rep["row_python_nodes"] and not rep["arrow_python_nodes"]
