"""Crawler-trap detection + politeness drain forecast
(operators/traps.py, frontier.crawl_delay_report)."""

from __future__ import annotations

import pyspark.sql.functions as F

from dotnetspider_spark.operators.frontier import crawl_delay_report
from dotnetspider_spark.operators.traps import trap_detection, url_template


def _templates(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r[0] for r in df.select(url_template(F.col("url"))).collect()
    ]


def test_url_template_digit_and_hex_runs(spark):
    got = _templates(
        spark,
        [
            "http://h.example/cal/2024/12/31",
            "HTTP://H.example/item/9",
            "http://h.example/sess/deadbeef00112233/view",
            "http://h.example/mix/abc123",
        ],
    )
    assert got == [
        "/cal/N/N/N",
        "/item/N",
        "/sess/H/view",   # 16-char hex id -> H, not aNbc-shredded
        "/mix/abcN",      # short hex-ish runs stay; digits collapse
    ]


def test_url_template_query_values_dropped_names_sorted(spark):
    got = _templates(
        spark,
        [
            "http://h.example/s?page=3&sort=asc",
            "http://h.example/s?sort=desc&page=7",
            "http://h.example/s",
            "http://h.example/s?flagonly",
        ],
    )
    # both param orders give the same template; values never appear
    assert got[0] == got[1] == "/s?page,sort"
    assert got[2] == "/s"
    assert got[3] == "/s?flagonly"


def test_trap_detection_flags_explosive_host_only(spark):
    rows = []
    # trap: 30 URLs, one calendar template
    rows += [(f"http://trap.example/d/2024/{i}/{i * 3}",) for i in range(30)]
    # healthy: 30 URLs, 30 letter-distinct templates
    rows += [
        (f"http://ok.example/{'abcdefghij'[i % 10]}{'klmnopqrst'[i // 10]}",)
        for i in range(30)
    ]
    # small: explosive shape but under min_urls
    rows += [(f"http://tiny.example/p/{i}",) for i in range(5)]
    df = spark.createDataFrame(rows, "url string")
    got = {
        r.host: (r.n_urls, r.n_templates, r.trap)
        for r in trap_detection(df, min_urls=20, max_ratio=5.0).collect()
    }
    assert got["trap.example"] == (30, 1, True)
    assert got["ok.example"] == (30, 30, False)
    assert got["tiny.example"] == (5, 1, False)  # ratio 5 but < min_urls


def test_crawl_delay_report_floor_and_missing_hosts(spark):
    frontier = spark.createDataFrame(
        [("a.example",)] * 4 + [("b.example",)] * 2 + [("c.example",)],
        "host string",
    )
    delays = spark.createDataFrame(
        [("a.example", 50), ("b.example", 1500)],
        "host string, crawl_delay_ms long",
    )
    got = {
        r.host: (r.n_pending, r.effective_delay_ms, r.drain_s)
        for r in crawl_delay_report(frontier, delays, floor_ms=200).collect()
    }
    assert got["a.example"] == (4, 200, 0.8)   # 50ms floored to 200
    assert got["b.example"] == (2, 1500, 3.0)
    assert got["c.example"] == (1, 200, 0.2)   # no robots row -> floor
