"""After-download content handlers as column transforms.

Reference: ``Downloader/AfterDownloadCompleteHandlers/*.cs`` (11 files,
~40 LoC each) mutate ``response.Content`` or set page control flags
after each fetch. Re-expressed as pure column factories applied to the
``content``/``html`` column between the fetch join and extraction —
whole-stage-codegen'd, zero Python.

Control-flag handlers map to outcome columns instead of mutations:
``skip_when_contains`` -> the reference's ``Bypass`` flag (Page.cs:27,
short-circuits everything, Spider.cs:1143-1146); ``retry_when_contains``
-> the ``Retry`` flag (Page.cs:17, re-pushes self, Spider.cs:1148-1153).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cutout_handler(
    content: Column, start: str, end: str,
    start_offset: int = 0, end_offset: int = 0,
) -> Column:
    """CutoutHandler.cs — keep the substring between two markers (with
    offsets); null when a marker is missing."""
    s_pos = F.locate(start, content)
    e_pos = F.locate(end, content)
    begin = s_pos + F.lit(start_offset)
    length = e_pos + F.lit(end_offset) - begin
    return F.when(
        (s_pos > 0) & (e_pos > 0) & (length > 0),
        content.substr(begin, length),
    ).otherwise(F.lit(None))


def regex_handler(content: Column, pattern: str) -> Column:
    """RegexHandler.cs — content becomes the concatenation of all
    pattern matches (empty string when none)."""
    return F.array_join(F.regexp_extract_all(content, F.lit(pattern), 0), "")


def replace_handler(content: Column, old: str, new: str) -> Column:
    """ReplaceHandler.cs."""
    return F.replace(content, F.lit(old), F.lit(new))


def trim_handler(content: Column) -> Column:
    """TrimHandler.cs."""
    return F.trim(content)


def unescape_handler(content: Column) -> Column:
    """UnescapeHandler.cs — HTML entity unescape (pandas UDF; no built-in)."""
    from dotnetspider_spark.functions.formatters import html_decode_fmt

    return html_decode_fmt(content)


def to_lower_handler(content: Column) -> Column:
    """ToLowerHandler.cs."""
    return F.lower(content)


def to_upper_handler(content: Column) -> Column:
    """ToUpperHandler.cs."""
    return F.upper(content)


def plain_text_handler(content: Column) -> Column:
    """PlainTextHandler.cs — strip tags/scripts/styles to visible text.
    Tag-strip via regexp (script/style blocks removed first), collapsed
    whitespace — the reference uses an HtmlAgilityPack InnerText walk;
    for full DOM fidelity use crawler.parse's stdlib parser instead."""
    no_script = F.regexp_replace(
        content, r"(?is)<(script|style)[^>]*>.*?</\1>", " "
    )
    no_tags = F.regexp_replace(no_script, r"<[^>]+>", " ")
    return F.trim(F.regexp_replace(no_tags, r"\s+", " "))


def skip_when_contains(content: Column, *markers: str) -> Column:
    """SkipWhenContainsHandler.cs — Bypass flag: true when any marker
    present (page skipped entirely, no extraction, no links)."""
    flag = F.lit(False)
    for m in markers:
        flag = flag | content.contains(m)
    return flag


def retry_when_contains(content: Column, *markers: str) -> Column:
    """RetryWhenContainsHandler.cs — Retry flag: true when any marker
    present (request re-enters the cycle-retry path)."""
    flag = F.lit(False)
    for m in markers:
        flag = flag | content.contains(m)
    return flag


def _with_header(m: Column, key: str, val: Column) -> Column:
    """Set header ``key`` = ``val`` when val is non-null (reference
    removes then re-adds, so the request property always wins)."""
    dropped = F.map_filter(m, lambda k, _: k != key)
    return F.when(
        val.isNotNull(), F.map_concat(dropped, F.create_map(F.lit(key), val))
    ).otherwise(m)


def apply_host_headers(df, host_headers, headers_col: str = "headers"):
    """Per-host default headers -> effective request headers
    (HttpClientDownloader.cs:275-301).

    ``host_headers`` is a (host, headers map<string,string>) CONFIG table
    — broadcast, never shuffled. Merge order mirrors the reference's
    comment ("Headers 的优先级低于 Request 特定设置"): host defaults load
    first, the request's own headers override on key conflicts, then the
    request-level Referer/Origin properties override those pseudo-headers
    last. Result replaces ``headers_col``; all map ops are built-in
    (codegen'd), no Python."""
    empty = F.expr("cast(map() as map<string,string>)")
    hh = F.broadcast(
        host_headers.select(
            F.col("host").alias("__hh_host"), F.col("headers").alias("__hh")
        )
    )
    out = df.join(hh, df["host"] == F.col("__hh_host"), "left")
    base = F.coalesce(F.col("__hh"), empty)
    req = F.coalesce(F.col(headers_col), empty)
    merged = F.map_concat(
        F.map_filter(base, lambda k, _: ~F.map_contains_key(req, k)), req
    )
    merged = _with_header(merged, "Referer", F.col("referer"))
    merged = _with_header(merged, "Origin", F.col("origin"))
    return out.withColumn(headers_col, merged).drop("__hh_host", "__hh")
