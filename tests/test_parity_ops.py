"""Small parity operators: counts-only push, per-host headers,
Download formatter + payload side-fetch, per-identity file pipelines."""

from __future__ import annotations

import glob

import pyspark.sql.functions as F


def test_push_all_keeps_duplicates(spark):
    """QueueScheduler (QueueScheduler.cs:11-34): FakeDuplicateRemover
    never dedups — every push (duplicates included) enqueues, and the
    total counter counts all of them."""
    from dotnetspider_spark.operators.frontier import dedup_push, push_all

    cand = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "identity string, seq long"
    )
    assert push_all(cand).count() == 3
    assert dedup_push(cand, None).count() == 2  # the dedup path, for contrast


def test_apply_host_headers_merge_order(spark):
    """HttpClientDownloader.cs:275-301: host defaults load first, request
    headers override on conflict, Referer/Origin properties override
    last; hosts without a config row keep request headers unchanged."""
    from dotnetspider_spark.functions.handlers import apply_host_headers

    reqs = spark.createDataFrame(
        [
            ("http://a/x", "a", {"User-Agent": "req-ua"}, "http://r", None),
            ("http://b/y", "b", None, None, "http://o"),
            ("http://c/z", "c", {"K": "v"}, None, None),
        ],
        "url string, host string, headers map<string,string>, "
        "referer string, origin string",
    )
    hh = spark.createDataFrame(
        [
            ("a", {"User-Agent": "host-ua", "Accept": "text/html"}),
            ("b", {"Accept": "*/*"}),
        ],
        "host string, headers map<string,string>",
    )
    got = {
        r.host: dict(r.headers)
        for r in apply_host_headers(reqs, hh).select("host", "headers").collect()
    }
    # request UA beats host UA; host Accept survives; Referer prop added
    assert got["a"] == {
        "User-Agent": "req-ua", "Accept": "text/html", "Referer": "http://r",
    }
    # no request headers: host defaults + Origin prop
    assert got["b"] == {"Accept": "*/*", "Origin": "http://o"}
    # no host row: request headers unchanged
    assert got["c"] == {"K": "v"}


def test_download_formatter_and_payload_fetch(spark):
    """Download.cs:19-25: the field value (a URL) becomes the local
    target path images/<filename>; the bytes arrive via a url-keyed
    payload join, not a per-row side effect."""
    from dotnetspider_spark.functions.formatters import download_fmt, fetch_payloads

    df = spark.createDataFrame(
        [("http://h/img/pic1.jpg?s=2",), ("http://h/a/b/pic2.png",)],
        "url string",
    )
    out = df.withColumn("path", download_fmt(F.col("url")))
    got = {r.url: r.path for r in out.collect()}
    assert got["http://h/img/pic1.jpg?s=2"] == "images/pic1.jpg"
    assert got["http://h/a/b/pic2.png"] == "images/pic2.png"

    payload = spark.createDataFrame(
        [("http://h/a/b/pic2.png", bytearray(b"\x89PNG"))], "url string, bytes binary"
    )
    fetched = fetch_payloads(out, payload)
    rows = {r.url: r.bytes for r in fetched.collect()}
    assert bytes(rows["http://h/a/b/pic2.png"]) == b"\x89PNG"
    assert rows["http://h/img/pic1.jpg?s=2"] is None  # no payload -> null


def test_file_pipelines_per_identity_layout(spark, tmp_path):
    """File/JsonFile pipelines (FilePipeline.cs:34-70,
    JsonFilePipeline.cs:38-57): one directory per identity, key:\tvalue
    text lines / JSON lines per result, written distributed."""
    from dotnetspider_spark.sinks.files import (
        write_file_pipeline,
        write_json_pipeline,
    )

    df = spark.createDataFrame(
        [
            ("run1", "http://h/1", "t1", 10),
            ("run1", "http://h/2", "t2", 20),
            ("run2", "http://h/3", "t3", 30),
        ],
        "identity string, url string, title string, n int",
    )
    jdir = str(tmp_path / "json")
    write_json_pipeline(df, jdir)
    assert glob.glob(f"{jdir}/identity=run1/*.json")
    assert glob.glob(f"{jdir}/identity=run2/*.json")
    back = spark.read.json(jdir)
    assert back.count() == 3 and set(back.columns) >= {"url", "title", "n"}

    fdir = str(tmp_path / "dsd")
    write_file_pipeline(df, fdir)
    txt = ""
    for p in glob.glob(f"{fdir}/identity=run1/*.txt"):
        txt += open(p).read()
    assert "url:\thttp://h/1" in txt and "title:\tt1" in txt and "n:\t10" in txt


def test_formatter_reference_cases(spark):
    """Verbatim port of FormatterTest.cs (Regex / CharacterCase /
    Displace / StringFormat Facts), including the sentinel defaults:
    RegexFormatter with True unset returns the matched text, False unset
    returns ''; blank patterns/templates are plan-time errors."""
    import pytest as _pytest

    from dotnetspider_spark.functions.formatters import (
        character_case_fmt,
        displace_fmt,
        regex_fmt,
        string_format_fmt,
        with_null_default,
    )

    for bad in ("  ", "", None):
        with _pytest.raises(ValueError):
            regex_fmt(F.col("s"), bad, "Y", "F")
    for bad in ("", None, "     "):
        with _pytest.raises(ValueError):
            string_format_fmt(F.col("s"), bad)

    rows = [
        ("很高兴正则", ), ("", ), ("很抱歉，没有找到", ), ("收货100人", ),
    ]
    df = spark.createDataFrame(rows, "s string")
    out = df.select(
        "s",
        regex_fmt(F.col("s"), "很抱歉", "Y", "F").alias("tf"),
        regex_fmt(F.col("s"), "很抱歉", None, "N").alias("match_or_n"),
        regex_fmt(F.col("s"), r"收货[\d]+人").alias("match_or_empty"),
        character_case_fmt(F.lit("a"), upper=True).alias("up"),
        character_case_fmt(F.lit("A"), upper=False).alias("down"),
        with_null_default(
            character_case_fmt(F.lit(None).cast("string"), upper=False), "OK"
        ).alias("null_ok"),
        displace_fmt(F.col("s"), "很高兴正则", "d").alias("disp"),
        string_format_fmt(F.lit("a"), "http://{0}").alias("fmt"),
    ).collect()
    by_s = {r.s: r for r in out}
    # RegexFormatter semantics (FormatterTest.cs:44-83)
    assert by_s["很高兴正则"].tf == "F"
    assert by_s["很抱歉，没有找到"].tf == "Y"
    assert by_s["很高兴正则"].match_or_n == "N"
    assert by_s["很抱歉，没有找到"].match_or_n == "很抱歉"
    assert by_s["收货100人"].match_or_empty == "收货100人"
    assert by_s["很高兴正则"].match_or_empty == ""
    # CharacterCase (FormatterTest.cs:86-107)
    r = out[0]
    assert r.up == "A" and r.down == "a" and r.null_ok == "OK"
    # Displace (FormatterTest.cs:109-117)
    assert by_s["很高兴正则"].disp == "d"
    assert by_s[""].disp == ""
    # StringFormat (FormatterTest.cs:124-160)
    assert r.fmt == "http://a"


def test_parse_sitemaps_entries_and_index(spark):
    from dotnetspider_spark.sources.sitemap import parse_sitemaps

    xml = (
        "<urlset>"
        "<url><loc> http://a/1 </loc><lastmod>2024-02-03</lastmod>"
        "<priority>0.8</priority></url>"
        "<url><loc>http://a/2</loc></url>"
        "<url><lastmod>no-loc-dropped</lastmod></url>"
        "</urlset>"
        "<sitemapindex><sitemap><loc>http://a/more.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    df = spark.createDataFrame([("a", xml)], ["host", "sitemap_xml"])
    rows = {
        (r.kind, r.url): (r.lastmod, r.priority)
        for r in parse_sitemaps(df).collect()
    }
    assert rows == {
        ("url", "http://a/1"): ("2024-02-03", 0.8),
        ("url", "http://a/2"): (None, None),
        ("sitemap", "http://a/more.xml"): (None, None),
    }


def test_revisit_schedule_streak_doubling_and_clamp(spark):
    from datetime import datetime as dt

    from dotnetspider_spark.operators.frontier import revisit_schedule

    t = lambda m: dt(2024, 1, 1, 0, m)
    rows = [
        # steady: h changes at fetch 2, then 3 unchanged -> streak 3,
        # interval 3600 * 2^3 = 28800
        ("u1", t(0), "A", 0), ("u1", t(1), "B", 1), ("u1", t(2), "B", 2),
        ("u1", t(3), "B", 3), ("u1", t(4), "B", 4),
        # never changed, 12 fetches -> streak 11, clamped to 604800
        *[("u2", t(m), "X", m) for m in range(12)],
        # single fetch: no observations -> streak 0, interval 3600
        ("u3", t(0), "Z", 0),
        # change on the LAST fetch -> streak 0, interval resets to 3600
        ("u4", t(0), "A", 0), ("u4", t(1), "A", 1), ("u4", t(2), "B", 2),
    ]
    hist = spark.createDataFrame(rows, ["url", "ts", "content_hash", "seq"])
    got = {
        r.url: (r.n_fetches, r.n_changes, r.unchanged_streak, r.next_interval_s)
        for r in revisit_schedule(hist, seq_col="seq").collect()
    }
    assert got == {
        "u1": (5, 1, 3, 28800),
        "u2": (12, 0, 11, 604800),
        "u3": (1, 0, 0, 3600),
        "u4": (3, 1, 0, 3600),
    }


def test_crawl_delta_statuses(spark):
    from dotnetspider_spark.operators.frontier import crawl_delta

    old = spark.createDataFrame(
        [("u1", "d1"), ("u2", "d2"), ("u3", "d3")], "url string, digest string"
    )
    new = spark.createDataFrame(
        [("u2", "d2"), ("u3", "dX"), ("u4", "d4")], "url string, digest string"
    )
    got = {r.url: r.status for r in crawl_delta(old, new).collect()}
    assert got == {
        "u1": "removed",
        "u2": "unchanged",
        "u3": "changed",
        "u4": "added",
    }
    # digest audit columns survive on both sides
    rows = {r.url: r for r in crawl_delta(old, new).collect()}
    assert rows["u3"].old_digest == "d3" and rows["u3"].new_digest == "dX"
    assert rows["u1"].new_digest is None and rows["u4"].old_digest is None


def test_adaptive_backoff_tiers_and_min_observations(spark):
    from dotnetspider_spark.operators.frontier import adaptive_backoff

    rows = (
        [("calm", 200)] * 100
        + [("warm", 429)] * 10 + [("warm", 200)] * 90
        + [("hot", 503)] * 30 + [("hot", 200)] * 70
        + [("dead", 429)] * 60 + [("dead", 200)] * 40
        + [("sparse", 429)] * 5  # < min_observations: no punishment
    )
    df = spark.createDataFrame(rows, "host string, status int")
    out = {r.host: r for r in adaptive_backoff(df, base_delay_ms=100).collect()}
    assert (out["calm"].multiplier, out["calm"].cooldown) == (1, False)
    assert (out["warm"].multiplier, out["warm"].delay_ms) == (2, 200)
    assert (out["hot"].multiplier, out["hot"].cooldown) == (4, False)
    assert (out["dead"].multiplier, out["dead"].cooldown) == (8, True)
    assert (out["sparse"].multiplier, out["sparse"].cooldown) == (1, False)


def test_select_fetch_batch_ip_matches_naive_windows(spark):
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dotnetspider_spark.operators.frontier import select_fetch_batch_ip

    rng = random.Random(7)
    rows = [
        (f"h{rng.randrange(12)}", f"http://u/{i}", 0, i) for i in range(400)
    ]
    fr = spark.createDataFrame(
        rows, "host string, url string, priority int, seq long"
    )
    # 12 hosts over 3 ips; h11 intentionally unresolved (falls back to
    # its own bucket, politeness never loosens on DNS lag)
    host_ip = spark.createDataFrame(
        [(f"h{i}", f"ip{i % 3}") for i in range(11)], "host string, ip string"
    )
    got = {
        (r["host"], r["seq"], r["host_rank"], r["ip"], r["ip_rank"])
        for r in select_fetch_batch_ip(
            fr, host_ip, per_host_limit=2, per_ip_limit=3, dfs=False
        ).collect()
    }
    wh = Window.partitionBy("host").orderBy(F.col("seq").asc())
    naive_h = fr.withColumn("host_rank", F.row_number().over(wh)).filter(
        F.col("host_rank") <= 2
    )
    naive_h = naive_h.join(host_ip, "host", "left").withColumn(
        "ip", F.coalesce("ip", "host")
    )
    wi = Window.partitionBy("ip").orderBy(F.col("seq").asc())
    naive = naive_h.withColumn("ip_rank", F.row_number().over(wi)).filter(
        F.col("ip_rank") <= 3
    )
    want = {
        (r["host"], r["seq"], r["host_rank"], r["ip"], r["ip_rank"])
        for r in naive.collect()
    }
    assert got == want
    assert any(h == "h11" and ip == "h11" for h, _, _, ip, _ in got)


def test_select_fetch_batch_ip_deterministic_on_cross_host_seq_ties(spark):
    from pyspark.sql import functions as F

    from dotnetspider_spark.operators.frontier import select_fetch_batch_ip

    # h1 and h2 share ip0 and EVERY seq collides across them
    rows = [(f"h{j}", f"http://h{j}/u{i}", 0, i) for j in (1, 2)
            for i in range(6)]
    fr = spark.createDataFrame(
        rows, "host string, url string, priority int, seq long"
    )
    host_ip = spark.createDataFrame(
        [("h1", "ip0"), ("h2", "ip0")], "host string, ip string"
    )
    picks = [
        sorted(
            (r["host"], r["seq"], r["ip_rank"])
            for r in select_fetch_batch_ip(
                fr, host_ip, per_host_limit=4, per_ip_limit=3, dfs=False
            ).collect()
        )
        for _ in range(3)
    ]
    assert picks[0] == picks[1] == picks[2]
    # total order (seq asc, host asc): seq 0 h1, seq 0 h2, seq 1 h1
    assert picks[0] == [("h1", 0, 1), ("h1", 1, 3), ("h2", 0, 2)]


def test_aged_priority_surfaces_starved_rows(spark):
    from pyspark.sql import functions as F

    from dotnetspider_spark.operators.frontier import (
        aged_priority,
        select_fetch_batch,
    )

    # one old low-priority row vs a stream of fresh high-priority rows
    rows = [("h", "http://h/old", 0, 0, 0)] + [
        ("h", f"http://h/new{i}", 3, 40, 100 + i) for i in range(5)
    ]
    fr = spark.createDataFrame(
        rows,
        "host string, url string, priority int, enqueued_iter int, seq long",
    )
    # without aging the old row never makes a top-3 batch
    plain = select_fetch_batch(
        fr, dfs=False, per_host_limit=3, priority_first=True
    )
    assert "http://h/old" not in {r["url"] for r in plain.collect()}
    # with aging (40 iterations waited, boost 10) it outranks priority 3
    aged = aged_priority(fr, current_iter=40, aging_every=4, max_boost=100)
    batch = select_fetch_batch(
        aged.withColumn("priority", F.col("eff_priority")),
        dfs=False, per_host_limit=3, priority_first=True,
    )
    assert "http://h/old" in {r["url"] for r in batch.collect()}
    # future-enqueued rows (resume clock skew) never get a negative boost
    got = {
        r["url"]: r["eff_priority"]
        for r in aged_priority(fr, current_iter=10).collect()
    }
    assert got["http://h/new0"] == 3
    import pytest

    with pytest.raises(ValueError):
        aged_priority(fr, current_iter=1, aging_every=0)


def test_crawl_budget_allocation_shapes_and_floor(spark):
    from dotnetspider_spark.operators.frontier import crawl_budget_allocation

    stats = spark.createDataFrame(
        [("a", 1.0, 1.0), ("b", 0.5, 1.0), ("junk", 0.0, 1.0)],
        "host string, reputation double, change_rate double",
    )
    got = {
        r["host"]: r["budget"]
        for r in crawl_budget_allocation(stats, total_budget=300).collect()
    }
    # 300 * (1/1.5, 0.5/1.5, 0) floored, junk held at the floor of 1
    assert got == {"a": 200, "b": 100, "junk": 1}
    # all-zero weights degrade to the floor everywhere, never divide by 0
    zeros = stats.withColumn("reputation", stats.reputation * 0)
    got0 = {
        r["host"]: r["budget"]
        for r in crawl_budget_allocation(zeros, total_budget=300).collect()
    }
    assert got0 == {"a": 1, "b": 1, "junk": 1}


def test_robots_refetch_due_ttl_boundary(spark):
    from dotnetspider_spark.operators.frontier import robots_refetch_due

    now = 1_000_000
    log = spark.createDataFrame(
        [("h1", now - 86400), ("h1", now - 10),   # refetched recently
         ("h2", now - 86400), ("h3", now - 86401)],
        "host string, fetched_at long",
    )
    got = {
        r["host"]: (r["age_s"], r["due"])
        for r in robots_refetch_due(log, now_epoch=now).collect()
    }
    assert got["h1"] == (10, False)      # max() wins over the stale row
    assert got["h2"] == (86400, True)    # exactly TTL -> due
    assert got["h3"] == (86401, True)


def test_select_fetch_batch_ip_dedups_resolver_cache(spark):
    # A resolver cache with several rows per host (multi-A-record or
    # stale+fresh entries) must NOT duplicate frontier rows through the
    # join — the per-host limit would silently be exceeded (ADVICE r4).
    from pyspark.sql import functions as F

    from dotnetspider_spark.operators.frontier import select_fetch_batch_ip

    fr = spark.createDataFrame(
        [("h1", f"http://h1/u{i}", 0, i) for i in range(5)],
        "host string, url string, priority int, seq long",
    )
    host_ip = spark.createDataFrame(
        [("h1", "ip2"), ("h1", "ip0"), ("h1", "ip1")],
        "host string, ip string",
    )
    out = select_fetch_batch_ip(
        fr, host_ip, per_host_limit=3, per_ip_limit=10, dfs=False
    ).collect()
    urls = sorted(r["url"] for r in out)
    assert urls == ["http://h1/u0", "http://h1/u1", "http://h1/u2"]
    # deterministic mapping: min(ip) per host
    assert {r["ip"] for r in out} == {"ip0"}
