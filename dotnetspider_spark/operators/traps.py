"""Crawler-trap detection over the URL frontier.

Infinite URL spaces — calendar pages, session-id links, faceted-search
permutations — are the classic crawler trap (Heritrix's documented
failure mode; Castillo 2004, "Effective Web Crawling", ch. 2). A trap
host emits unbounded DISTINCT URLS from a bounded set of page
TEMPLATES, so the detector canonicalizes every URL's path into a
template (hex-id runs -> ``H``, digit runs -> ``N``, query VALUES
dropped keeping the sorted param-name set) and flags hosts whose
distinct-URL / distinct-template ratio explodes.

The reference has no trap defense — its frontier grows unboundedly on
a trap host and only the politeness floor (``SleepTime``,
``Spider.cs``) slows the bleed. At the 10^10-URL design point a single
trap host can dominate the frontier, so this is frontier health, not
an optional report.

Scale shape: the first aggregation is keyed (host, template) — the
wide URL space compresses map-side before any host-level work; the
host-level aggregation then processes |templates| rows per host, not
|URLs|. Both are partial-agg'd groupBys, no windows, no driver state:
a 10^8-URL trap host costs its template count (small by definition of
a trap) in the second stage.

Regexes are kept to the portable subset (no lookaround, no
backreferences) so the exact same patterns run under Spark (Java
regex) and DuckDB (RE2) — that is what makes the operator
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# hex-ish ids first (session tokens, content hashes), THEN digit runs —
# the other order would shred a 32-char hex id into H/N fragments
_HEX_RUN = r"\b[0-9a-f]{8,}\b"
_DIGIT_RUN = r"[0-9]+"


def url_template(url: Column) -> Column:
    """Collapse a URL to its page template: lowercase, scheme stripped,
    hex-id runs -> ``H``, digit runs -> ``N``, query values dropped
    (sorted param-name set kept — faceted-search traps permute VALUES,
    the param-name set is the template). One codegen'd expression."""
    rest = F.regexp_replace(F.lower(url), r"^[a-z][a-z0-9+.-]*://", "")
    path = F.regexp_extract(rest, r"^[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(rest, r"\?([^#]*)", 1)
    tpl_path = F.regexp_replace(
        F.regexp_replace(path, _HEX_RUN, "H"), _DIGIT_RUN, "N"
    )
    param_names = F.array_join(
        F.array_sort(
            F.transform(
                F.filter(F.split(query, "&"), lambda p: p != ""),
                lambda p: F.split(p, "=").getItem(0),
            )
        ),
        ",",
    )
    return F.when(param_names == "", tpl_path).otherwise(
        F.concat(tpl_path, F.lit("?"), param_names)
    )


def url_host(url: Column) -> Column:
    """Lowercased host part (authority up to the first /, ?, or #)."""
    rest = F.regexp_replace(F.lower(url), r"^[a-z][a-z0-9+.-]*://", "")
    return F.regexp_extract(rest, r"^([^/?#]*)", 1)


def trap_detection(
    urls: DataFrame,
    url_col: str = "url",
    min_urls: int = 20,
    max_ratio: float = 5.0,
    host_col: str | None = None,
) -> DataFrame:
    """Per-host trap report over a (deduped) frontier slice.

    Returns one row per host: ``n_urls`` (frontier rows — callers feed
    the already-deduped frontier, so rows = distinct URLs),
    ``n_templates``, ``max_template_urls`` (the hottest single
    template), ``explosion`` = n_urls/n_templates rounded to 6, and the
    ``trap`` verdict: at least ``min_urls`` URLs AND explosion >=
    ``max_ratio``. Thresholds are Heritrix-style operating points, not
    learned.

    ``host_col``: use an existing host column instead of re-deriving it
    from the URL (the crawl loop already carries one; deriving twice
    risks a join-key mismatch if the two derivations ever diverge).
    """
    host = (
        F.col(host_col) if host_col else url_host(F.col(url_col))
    )
    base = urls.select(
        host.alias("host"),
        url_template(F.col(url_col)).alias("template"),
    )
    per_tpl = base.groupBy("host", "template").agg(
        F.count(F.lit(1)).alias("n_tpl_urls")
    )
    report = per_tpl.groupBy("host").agg(
        F.sum("n_tpl_urls").cast("long").alias("n_urls"),
        F.count(F.lit(1)).cast("long").alias("n_templates"),
        F.max("n_tpl_urls").cast("long").alias("max_template_urls"),
    )
    explosion = F.col("n_urls") / F.col("n_templates")
    return report.select(
        "host",
        "n_urls",
        "n_templates",
        "max_template_urls",
        F.round(explosion, 6).alias("explosion"),
        ((F.col("n_urls") >= min_urls) & (explosion >= max_ratio)).alias(
            "trap"
        ),
    )
