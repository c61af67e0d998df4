"""Web-archive indexing operators (operators/archive.py): SURT
canonicalization, CDX index generation, mirror-host detection."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from dotnetspider_spark.operators.archive import cdx_index, mirror_hosts, surt


def _surts(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r[0] for r in df.select(surt(F.col("url"))).collect()]


def test_surt_reverses_host_and_sorts_query(spark):
    got = _surts(
        spark,
        [
            "http://www.example.com/a?b=2&a=1",
            "HTTPS://Sub.Dept.Example.COM/Path/To",
            "http://example.com",
            "http://www2.example.com/x#frag",
            "http://user:pw@example.com/a",
        ],
    )
    assert got == [
        "com,example)/a?a=1&b=2",
        "com,example,dept,sub)/path/to",
        "com,example)/",
        "com,example)/x",
        "com,example)/a",
    ]


def test_surt_port_handling(spark):
    got = _surts(
        spark,
        [
            "http://example.com:80/a",
            "https://example.com:443/a",
            "http://example.com:8080/a",
        ],
    )
    assert got == [
        "com,example)/a",
        "com,example)/a",
        "com,example:8080)/a",
    ]


def test_surt_empty_query_pairs_dropped(spark):
    got = _surts(spark, ["http://h.example/p?&&b=1&&a=2&"])
    assert got == ["example,h)/p?a=2&b=1"]


def test_surt_groups_one_domain_contiguously_under_sort(spark):
    # the property SURT exists for: all captures of one registrable
    # domain sort into one contiguous run, across subdomains
    urls = [
        "http://a.example.com/1",
        "http://zeta.org/x",
        "http://www.example.com/2",
        "http://b.example.com/3",
    ]
    got = sorted(_surts(spark, urls))
    example_rows = [s for s in got if s.startswith("com,example")]
    first = got.index(example_rows[0])
    assert got[first : first + len(example_rows)] == example_rows
    assert len(example_rows) == 3


def test_cdx_index_rows_digest_and_order(spark):
    caps = spark.createDataFrame(
        [
            ("http://www.b.example/x", "20240102030405", "text/html", 200, "bodyB"),
            ("http://a.example/y", "20240101000000", "text/html", 200, "bodyA"),
            ("http://a.example/y", "20230101000000", "text/html", 301, "bodyA"),
        ],
        "url string, ts string, mime string, status int, body string",
    )
    rows = cdx_index(caps).collect()
    # ordered by (surt, ts): a.example's two captures first, older first
    assert [r["surt"] for r in rows] == [
        "example,a)/y",
        "example,a)/y",
        "example,b)/x",
    ]
    assert [r["ts"] for r in rows] == [
        "20230101000000",
        "20240101000000",
        "20240102030405",
    ]
    assert rows[0]["digest"] == hashlib.md5(b"bodyA").hexdigest()
    assert rows[0]["length"] == 5
    assert rows[2]["original"] == "http://www.b.example/x"
    assert rows[2]["status"] == 200


def test_mirror_hosts_detects_pair_and_caps_boilerplate(spark):
    rows = []
    # m1/m2 mirror each other on 10 pages; m2 has 2 extra pages
    for i in range(10):
        rows.append(("m1.example", f"fp{i}"))
        rows.append(("m2.example", f"fp{i}"))
    rows += [("m2.example", "fpX"), ("m2.example", "fpY")]
    # u1/u2 share ONE page (below min_shared)
    rows += [("u1.example", "shared"), ("u2.example", "shared")]
    for i in range(8):
        rows.append(("u1.example", f"u1-{i}"))
        rows.append(("u2.example", f"u2-{i}"))
    # boilerplate fingerprint on every host: excluded by the cap
    for h in ("m1", "m2", "u1", "u2", "z1", "z2", "z3"):
        rows.append((f"{h}.example", "boiler"))
    # duplicate observations collapse
    rows.append(("m1.example", "fp0"))
    df = spark.createDataFrame(rows, "host string, fingerprint string")
    got = {
        (r["host_a"], r["host_b"]): r
        for r in mirror_hosts(
            df, max_fp_hosts=4, min_shared=5, threshold=0.9
        ).collect()
    }
    m = got[("m1.example", "m2.example")]
    assert m["n_shared"] == 10
    # denominators include the boilerplate fp (true host sizes)
    assert (m["n_a"], m["n_b"]) == (11, 13)
    assert abs(m["containment"] - 10 / 11) < 1e-6
    assert m["mirror"] is True
    u = got[("u1.example", "u2.example")]
    assert u["n_shared"] == 1 and u["mirror"] is False
    # the boilerplate fp (7 hosts > cap 4) creates no other pairs
    assert set(got) == {
        ("m1.example", "m2.example"),
        ("u1.example", "u2.example"),
    }


def test_mirror_hosts_singleton_fps_never_pair(spark):
    df = spark.createDataFrame(
        [("a.example", "only-a"), ("b.example", "only-b")],
        "host string, fingerprint string",
    )
    assert mirror_hosts(df).count() == 0


def test_revisit_records_reference_first_capture(spark):
    from dotnetspider_spark.operators.archive import revisit_records

    caps = spark.createDataFrame(
        [
            ("u", 10, "d1", 100),
            ("u", 20, "d1", 100),   # revisit of ts=10
            ("u", 30, "d2", 120),   # content changed: new response
            ("u", 40, "d1", 100),   # back to d1: revisit of ts=10
            ("v", 5, "d1", 50),     # same digest, other url: response
        ],
        "url string, ts long, digest string, size long",
    )
    got = {
        (r["url"], r["ts"]): (r["kind"], r["ref_ts"], r["saved_bytes"])
        for r in revisit_records(caps, size_col="size").collect()
    }
    assert got[("u", 10)] == ("response", None, 0)
    assert got[("u", 20)] == ("revisit", 10, 100)
    assert got[("u", 30)] == ("response", None, 0)
    assert got[("u", 40)] == ("revisit", 10, 100)
    assert got[("v", 5)] == ("response", None, 0)


def test_format_warc_record_rejects_crlf_header_injection():
    import pytest

    from dotnetspider_spark.sources.warc import format_warc_record

    with pytest.raises(ValueError, match="framing"):
        format_warc_record(
            "http://h/x\r\nWARC-Type: forged", "2020-01-01T00:00:00Z",
            200, "text/html", b"x",
        )
    # clean record still round-trips
    assert format_warc_record(
        "http://h/x", "2020-01-01T00:00:00Z", 200, "text/html", b"x"
    ).startswith(b"WARC/1.0")


def test_revisit_records_tie_on_min_timestamp_single_response(spark):
    from dotnetspider_spark.operators.archive import revisit_records

    caps = spark.createDataFrame(
        [("u", 10, "d1", 100), ("u", 10, "d1", 100), ("u", 20, "d1", 100)],
        "url string, ts long, digest string, size long",
    )
    rows = revisit_records(caps, size_col="size").collect()
    kinds = sorted(r["kind"] for r in rows)
    assert kinds == ["response", "revisit", "revisit"]
    assert sum(r["saved_bytes"] for r in rows) == 200


def test_archive_replay_extraction_matches_live_pages(spark, tmp_path):
    """Model re-extraction from an archived crawl (the recrawl-free
    schema-change workflow: fix the entity model, replay the WARC
    estate) must yield byte-identical rows to extracting from the live
    pages — the whole write_warc/read_warc container plus the decode
    sits between the two paths."""
    from pyspark.sql import functions as F

    from dotnetspider_spark.extraction.model import EntityModel, Field, extract
    from dotnetspider_spark.sinks.warc import write_warc
    from dotnetspider_spark.sources.warc import read_warc

    pages = spark.range(40).select(
        F.concat(F.lit("http://a.example/p/"), F.col("id")).alias("url"),
        F.lit("2020-01-01T00:00:00Z").alias("warc_date"),
        F.lit(200).alias("http_status"),
        F.lit("text/html; charset=utf-8").alias("http_content_type"),
        F.encode(
            F.concat(
                F.lit('<html><body><h1 class="t">Item '), F.col("id"),
                F.lit('</h1><p class="cap">cap '), F.col("id"),
                F.lit("</p></body></html>"),
            ),
            "utf-8",
        ).alias("body"),
    )
    write_warc(pages, str(tmp_path / "w"), n_shards=3)
    replayed = read_warc(spark, str(tmp_path / "w") + "/*.warc.gz").select(
        "url", F.decode("body", "utf-8").alias("html")
    )
    live = pages.select("url", F.decode("body", "utf-8").alias("html"))
    model = EntityModel(
        name="item",
        fields=(
            Field("title", "xpath", "//h1[@class='t']/text()"),
            Field("caption", "css", "p.cap"),
            Field("page", "regex", r"/p/(\d+)", dtype="bigint", source="url"),
        ),
    )
    got = {
        (r["page"], r["title"], r["caption"])
        for r in extract(model, replayed).collect()
    }
    want = {
        (r["page"], r["title"], r["caption"])
        for r in extract(model, live).collect()
    }
    assert got == want and len(got) == 40
