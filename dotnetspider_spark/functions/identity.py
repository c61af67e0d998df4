"""Request identity — the URL-seen key.

Reference semantics (reimplemented, not ported):
``src/DotnetSpider.Core/RequestExtensions.cs:12-17`` computes the identity
as ``MD5(Referer + Origin + Method + Content + Url + CycleTriedTimes +
JSON(Headers))``; documented invariants in ``Design.md:13-20``:

- same URL, different headers  -> different identity
- different ``CycleTriedTimes`` (retry counter) -> different identity,
  so a retried request re-enters the queue past dedup
- crawl ``Depth`` is NOT part of the identity

We compute it with pure built-in expressions (``F.md5(F.concat(...))``) —
vectorized, whole-stage-codegen, zero Python in the hot path. Null fields
concatenate as "" (C# string concat semantics). Header maps serialize as a
canonical compact JSON object in key-sorted order; the pure-Python oracle
(`dotnetspider_spark.pyref`) uses the identical serialization, so Spark and
oracle identities agree byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: field separator is "" — plain concatenation, matching the reference's
#: string "+" concat. (This means e.g. url="a", content="bX" and url="ab",
#: content="X" could theoretically collide; the reference has the same
#: property and its tests pin it, so we reproduce it.)


def headers_json(headers: Column) -> Column:
    """Canonical JSON for a ``map<string,string>`` headers column.

    Compact separators, key-sorted: ``{"a":"1","b":"2"}``; null/empty map
    serializes as ``{}`` (reference treats null and empty as equal,
    ``Request.cs:164-196`` / ``RequestTest.cs:68-89``).
    """
    kvs = F.transform(
        F.array_sort(F.map_keys(headers)),
        lambda k: F.concat(
            F.lit('"'), k, F.lit('":"'), F.element_at(headers, k), F.lit('"')
        ),
    )
    body = F.concat(F.lit("{"), F.array_join(kvs, ","), F.lit("}"))
    return F.when(headers.isNull(), F.lit("{}")).otherwise(body)


def request_identity(
    url: Column,
    method: Column | None = None,
    referer: Column | None = None,
    origin: Column | None = None,
    content: Column | None = None,
    retried: Column | None = None,
    headers: Column | None = None,
) -> Column:
    """MD5 identity over (referer, origin, method, content, url, retried,
    headers-json) — field order per ``RequestExtensions.cs:12-17``."""
    method = F.coalesce(method, F.lit("GET")) if method is not None else F.lit("GET")
    referer = F.coalesce(referer, F.lit("")) if referer is not None else F.lit("")
    origin = F.coalesce(origin, F.lit("")) if origin is not None else F.lit("")
    content = F.coalesce(content, F.lit("")) if content is not None else F.lit("")
    retried_s = (
        F.coalesce(retried.cast("string"), F.lit("0"))
        if retried is not None
        else F.lit("0")
    )
    hjson = headers_json(headers) if headers is not None else F.lit("{}")
    return F.md5(
        F.concat(referer, origin, method, content, F.coalesce(url, F.lit("")), retried_s, hjson)
    )
