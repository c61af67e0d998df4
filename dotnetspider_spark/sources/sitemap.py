"""Sitemap ingestion — sitemap.xml documents -> frontier seed rows.

The reference seeds crawls from explicit URL lists only
(Spider.AddRequest / Reload); real crawls also seed from the sitemaps
protocol (sitemaps.org, public spec): fetch ``/sitemap.xml``, read
``<urlset>`` entries into frontier rows, and recurse into
``<sitemapindex>`` children. This module is the parse stage:

- :func:`parse_sitemaps` — (host, sitemap_xml) rows -> one row per
  ``<url>`` / ``<sitemap>`` entry: (host, kind, url, lastmod,
  priority). ``kind='sitemap'`` rows are child sitemaps the crawl loop
  feeds back into the fetch queue (the recursion is iterations of the
  loop, not driver-side descent); ``kind='url'`` rows become seeds.

Pure JVM column algebra (``regexp_extract_all`` over entry blocks, a
higher-order ``transform`` to pull loc/lastmod/priority per block) —
map-only, zero Python, zero shuffles, so parsing 10^7 sitemap docs is
a scan. RE2/Java regex portability: no backreferences (separate
patterns per block kind instead of ``<(url|sitemap)>…</\\1>``), which
keeps the operator oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _xml_unescape_loc(c):
    """``<loc>`` values per sitemaps.org MUST be XML-entity-escaped and
    MAY be CDATA-wrapped — decode both, or the seed fetch hits the wrong
    URL ('?x=1&amp;y=2' verbatim) and request identity diverges from the
    real page. Only the five predefined entities (all the spec
    requires), as literal replaces with ``&amp;`` LAST so each pass
    decodes exactly one escaping level; everything stays JVM-side and
    DuckDB-restatable (no Python UDF)."""
    c = F.regexp_replace(c, r"^<!\[CDATA\[(.*)\]\]>$", "$1")
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def _entries(xml_col: str, kind: str):
    blocks = F.regexp_extract_all(
        F.col(xml_col), F.lit(f"(?s)<{kind}>(.*?)</{kind}>"), 1
    )

    def field(b, tag):
        return F.nullif(
            F.regexp_extract(b, f"(?s)<{tag}>\\s*(.*?)\\s*</{tag}>", 1),
            F.lit(""),
        )

    return F.transform(
        blocks,
        lambda b: F.struct(
            F.lit(kind).alias("kind"),
            _xml_unescape_loc(field(b, "loc")).alias("loc"),
            field(b, "lastmod").alias("lastmod"),
            field(b, "priority").cast("double").alias("priority"),
        ),
    )


def parse_sitemaps(
    docs: DataFrame, host_col: str = "host", xml_col: str = "sitemap_xml"
) -> DataFrame:
    """(host, sitemap_xml) -> (host, kind, url, lastmod, priority); one
    row per ``<url>``/``<sitemap>`` entry, entries without a ``<loc>``
    dropped. ``lastmod`` stays the raw string (W3C datetime — cast at
    the consumer; sitemaps in the wild mix date-only and full ISO)."""
    entries = F.concat(_entries(xml_col, "url"), _entries(xml_col, "sitemap"))
    return (
        docs.select(F.col(host_col).alias("host"), F.explode(entries).alias("e"))
        .select(
            "host",
            F.col("e.kind").alias("kind"),
            F.col("e.loc").alias("url"),
            F.col("e.lastmod").alias("lastmod"),
            F.col("e.priority").alias("priority"),
        )
        .filter(F.col("url").isNotNull())
    )
