"""Content-type detection — Downloader.DetectContentType parity.

Reference (Downloader/Downloader.cs:281-306):
- header present: ``contentType.Contains("json")`` -> Json, else Html;
- header absent, string content: try JSON-parse -> Json on success,
  Html on failure;
- header absent, non-string (binary) content: Auto.

Pure built-in expressions — ``try_parse_json`` does the try-parse
JVM-side (no UDF), so the gate participates in codegen and pushdown.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

JSON = "Json"
HTML = "Html"
AUTO = "Auto"


def detect_content_type(content: Column, header: Column | None = None) -> Column:
    """ContentType column ('Json' | 'Html' | 'Auto').

    ``content`` is the textual body (null = binary/non-string payload);
    ``header`` the Content-Type response header (null/'' = absent).
    """
    parses = F.try_parse_json(content).isNotNull()
    by_body = F.when(content.isNull(), F.lit(AUTO)).otherwise(
        F.when(parses, F.lit(JSON)).otherwise(F.lit(HTML))
    )
    if header is None:
        return by_body
    has_header = header.isNotNull() & (F.trim(header) != "")
    by_header = F.when(
        F.lower(header).contains("json"), F.lit(JSON)
    ).otherwise(F.lit(HTML))
    return F.when(has_header, by_header).otherwise(by_body)


# (?i) works in both Java regex (Spark) and RE2 (the DuckDB oracle)
_CHARSET_HDR = r"""(?i)charset\s*=\s*["']?([\w.:-]+)"""
_CHARSET_META = r"""(?i)<meta[^>]+charset\s*=\s*["']?([\w.:-]+)"""


def sniff_charset(header: Column | None, body_head: Column | None) -> Column:
    """Charset sniff as a pure column expression: Content-Type header
    ``charset=`` param -> ``<meta charset=...>`` (or http-equiv content)
    in the body head -> 'utf-8' default — the read order of
    Downloader.cs:211-220 / HttpClientDownloader.cs:127. Lower-cased.

    ``body_head`` should be a bounded prefix of the decoded body (the
    HTML spec scans the first 1024 bytes; callers pass a substring so the
    regex never walks a 10 MB page). Twin of the pure-Python
    ``sources.fetchers.sniff_charset_py`` used inside the fetch stage.
    """
    out = None
    if header is not None:
        hdr = F.nullif(F.regexp_extract(header, _CHARSET_HDR, 1), F.lit(""))
        out = hdr
    if body_head is not None:
        meta = F.nullif(F.regexp_extract(body_head, _CHARSET_META, 1), F.lit(""))
        out = meta if out is None else F.coalesce(out, meta)
    return F.lower(F.coalesce(out, F.lit("utf-8")) if out is not None else F.lit("utf-8"))
