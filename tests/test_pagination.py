"""Pagination operator tests (AutoIncrement + the four last-page checkers)."""

from __future__ import annotations

import pyspark.sql.functions as F

from dotnetspider_spark.functions.pagination import (
    contains_last_page,
    max_page_reached,
    paginate,
    pagination_exhausted,
    uncontains_last_page,
)
from dotnetspider_spark.functions.urlops import next_page_url


def _df(spark):
    return spark.createDataFrame(
        [
            ("http://h/list_1.html", "items items <a>next</a>", "1", "5"),
            ("http://h/list_4.html", "items <b>no more results</b>", "4", "5"),
            ("http://h/list_5.html", "tail page", "5", "5"),
            ("http://h/other.html", "x", None, None),
        ],
        "url string, content string, cur string, total string",
    )


def test_next_page_url_increments_numeric_part(spark):
    df = _df(spark).select(
        "url", next_page_url(F.col("url"), "list_*.html").alias("nxt")
    )
    got = {r.url: r.nxt for r in df.collect()}
    assert got["http://h/list_1.html"] == "http://h/list_2.html"
    assert got["http://h/list_4.html"] == "http://h/list_5.html"
    assert got["http://h/other.html"] is None


def test_checkers(spark):
    df = _df(spark).select(
        "url",
        contains_last_page(F.col("content"), "no more results").alias("c1"),
        uncontains_last_page(F.col("content"), "items").alias("c2"),
        max_page_reached(F.col("url"), r"list_(\d+)\.html", 5).alias("c3"),
        pagination_exhausted(F.col("cur"), F.col("total")).alias("c4"),
    )
    rows = {r.url: r for r in df.collect()}
    r1 = rows["http://h/list_1.html"]
    assert (r1.c1, r1.c2, r1.c3, r1.c4) == (False, False, False, False)
    r4 = rows["http://h/list_4.html"]
    assert r4.c1 is True and r4.c3 is False
    r5 = rows["http://h/list_5.html"]
    assert r5.c2 is True and r5.c3 is True and r5.c4 is True
    # missing selector values -> exhausted (stop, fail-safe)
    assert rows["http://h/other.html"].c4 is True


def test_paginate_gates_on_stop(spark):
    df = _df(spark).select(
        "url",
        paginate(
            F.col("url"),
            F.col("content"),
            "list_*.html",
            stop=contains_last_page(F.col("content"), "no more results"),
        ).alias("nxt"),
    )
    got = {r.url: r.nxt for r in df.collect()}
    assert got["http://h/list_1.html"] == "http://h/list_2.html"
    assert got["http://h/list_4.html"] is None  # checker fired
