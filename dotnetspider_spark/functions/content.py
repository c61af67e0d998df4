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


#: Media types NOT treated as downloadable files (Downloader.cs:39-55
#: ``ExcludeMediaTypes``). The reference list also contains ``""`` —
#: and ``MediaType.Contains("")`` is true for every string, which makes
#: its file branch unreachable as shipped; we implement the intended
#: gate (the list minus the degenerate entry, substring match kept).
EXCLUDE_MEDIA_TYPES = (
    "text/html",
    "text/plain",
    "text/richtext",
    "text/xml",
    "text/json",
    "text/javascript",
    "application/soap+xml",
    "application/xml",
    "application/json",
    "application/x-javascript",
    "application/javascript",
    "application/x-www-form-urlencoded",
)


def is_media_type(header: Column) -> Column:
    """True when the Content-Type header marks a FILE payload — i.e. it
    is present and contains none of :data:`EXCLUDE_MEDIA_TYPES`
    (HttpClientDownloader.cs:130 ``!ExcludeMediaTypes.Any(t =>
    MediaType.Contains(t))``). Media rows skip content decode, link
    discovery and extraction; with ``download_files`` they are stored
    under the host+path layout (Downloader.cs:390-395), else ignored.
    Pure codegen'd boolean algebra (lower + contains folds)."""
    hdr = F.lower(header)
    textual = F.lit(False)
    for t in EXCLUDE_MEDIA_TYPES:
        textual = textual | hdr.contains(t.lower())
    return header.isNotNull() & (F.trim(header) != "") & ~textual


def download_file_path(url: Column, folder: str = "downloads") -> Column:
    """The reference's saved-file path for a media payload:
    ``<folder>/<host><localPath>`` with ``//`` collapsed
    (Downloader.cs:390-395 ``CreateFilePath``). JVM-side parse_url +
    string ops; no UDF."""
    # try_parse_url: a media row with an unparseable URL stores under
    # the folder root instead of aborting the job (see urlops.url_host)
    raw = F.concat(
        F.coalesce(F.try_parse_url(url, F.lit("HOST")), F.lit("")),
        F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit("")),
    )
    return F.concat(F.lit(folder + "/"), F.regexp_replace(raw, "//", "/"))


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


_SOFT404_MARKERS = [
    "page not found",
    "404 not found",
    "no longer exists",
    "does not exist",
    "page you requested could not be found",
]


def soft404_flag(
    status: Column, body: Column, max_chars: int = 512
) -> Column:
    """Soft-404 detection: a 2xx response whose body is a short
    "not found" page (Bar-Yossef et al., "Sic Transit Gloria Telae",
    WWW'04 — the marker-phrase heuristic layer; the paper's
    random-probe method needs live fetches and lives in the fetch
    stage if ever enabled). A soft 404 poisons both the dedup corpus
    (thousands of identical "not found" bodies) and link statistics,
    so the gate runs right after fetch, before extraction.

    Pure column expression over (status, body): 2xx AND a marker
    phrase in the first ``max_chars`` lowercased chars AND a short
    body. Bounded substring so the scan never walks a 10 MB page —
    real soft-404 bodies are template stubs.
    """
    head = F.lower(F.substring(body, 1, max_chars))
    marked = None
    for m in _SOFT404_MARKERS:
        hit = head.contains(m)
        marked = hit if marked is None else (marked | hit)
    return (
        (status >= 200)
        & (status < 300)
        & marked
        & (F.length(body) <= F.lit(max_chars))
    )
