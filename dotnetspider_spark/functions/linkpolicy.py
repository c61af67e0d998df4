"""REP link/indexing policy — nofollow anchors, meta robots, canonical.

The reference follows every extracted link unconditionally
(Core/Processor/RequestExtractor/XPathRequestExtractor.cs:21-38 collects
``//a`` hrefs with no rel inspection; Page.cs:121-127 gates only on
scheme junk). Real crawls at 10^10-URL scale must honor the
robots-exclusion-protocol page directives or they re-crawl the same
content forests forever, so — like robots.txt in round 2 — this is a
north-rule ADDITION, opt-in from the crawl loop and standalone as a
curation operator:

- ``rel="nofollow"`` on an anchor (also ``ugc`` / ``sponsored``, the
  Google 2019 rel extensions) drops THAT link from discovery.
- ``<meta name="robots" content="...">`` with ``nofollow`` drops the
  whole page's links; ``noindex`` marks the page as not-indexable (the
  store/curation gate — discovery still happens, matching the
  standard's semantics).
- ``X-Robots-Tag`` response headers carry the same tokens per RFC 9309
  / Google's REP docs; merged in JVM-side (no extra Python crossing).
- ``<link rel="canonical" href="...">`` resolves against the page base
  and is surfaced as an extra discovery target: the canonical variant
  is the row a training-data pipeline should keep, so the frontier
  must have fetched it.

Parsing is one fused Arrow-batched pandas UDF per page (same boundary
budget as the crawl parse path); href canonicalization reuses
``crawler.parse._canonize`` so policy-path children are byte-identical
to fused-parse children — identity is computed from those bytes.
"""

from __future__ import annotations

from functools import lru_cache
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: struct returned per page by the fused policy parse
POLICY_TYPE = (
    "struct<children:array<string>, noindex:boolean, nofollow:boolean, "
    "canonical:string>"
)

_NOFOLLOW_RELS = frozenset({"nofollow", "ugc", "sponsored"})


class _PolicyParser(HTMLParser):
    """One pass: anchors with rel flags, meta robots, link canonical."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.hrefs: list[tuple[str, bool]] = []  # (raw href, nofollow)
        self.noindex = False
        self.nofollow = False
        self.canonical: str | None = None

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            d = dict(attrs)
            href = d.get("href")
            if href is not None:
                rel = d.get("rel") or ""
                # rel is a space-separated token list, case-insensitive
                # (HTML spec §4.6.6.9); any nofollow-family token opts
                # the single link out of discovery
                nf = not _NOFOLLOW_RELS.isdisjoint(rel.lower().split())
                self.hrefs.append((href, nf))
        elif tag == "meta":
            d = dict(attrs)
            name = (d.get("name") or "").lower()
            if name in ("robots", "dotnetspider"):
                toks = {
                    t.strip() for t in (d.get("content") or "").lower().split(",")
                }
                if "noindex" in toks or "none" in toks:
                    self.noindex = True
                if "nofollow" in toks or "none" in toks:
                    self.nofollow = True
        elif tag == "link" and self.canonical is None:
            d = dict(attrs)
            rel = (d.get("rel") or "").lower().split()
            if "canonical" in rel and d.get("href"):
                self.canonical = d["href"]


def _parse_policy(html: str | None) -> _PolicyParser:
    p = _PolicyParser()
    if html:
        try:
            p.feed(html)
            p.close()
        except Exception:  # malformed html: keep what parsed so far
            pass
    return p


def _policy_rows(html: pd.Series, base: pd.Series) -> pd.DataFrame:
    from dotnetspider_spark.crawler.parse import _canonize

    children, noindex, nofollow, canonical = [], [], [], []
    for h, b in zip(html, base):
        p = _parse_policy(h)
        base_url = b or ""
        if p.nofollow:
            kept: list = []
        else:
            kept = [raw for raw, nf in p.hrefs if not nf]
        canon = None
        if p.canonical is not None:
            resolved = _canonize([p.canonical], base_url)
            canon = resolved[0] if resolved else None
        children.append(_canonize(kept, base_url))
        noindex.append(p.noindex)
        nofollow.append(p.nofollow)
        canonical.append(canon)
    return pd.DataFrame(
        {
            "children": children,
            "noindex": noindex,
            "nofollow": nofollow,
            "canonical": canonical,
        }
    )


@lru_cache(maxsize=None)
def _policy_udf():
    return pandas_udf(_policy_rows, POLICY_TYPE)


def extract_policy_links_udf(html, base_url):
    """Fused policy parse: children (nofollow-filtered, canonicalized,
    first-occurrence-deduped) + page directives, one Python crossing."""
    return _policy_udf()(html, base_url)


def x_robots_directives(header_value):
    """JVM-side ``X-Robots-Tag`` token split: (noindex, nofollow) bools.

    ``header_value`` is the raw header string (possibly comma-joined
    across repeated headers, per RFC 9110 §5.3). Google's REP docs:
    an ``agent:`` prefix opens a scope covering every SUBSEQUENT
    directive until another agent prefix appears — so
    "googlebot: noindex, nofollow" scopes both tokens to googlebot,
    while "googlebot: noindex, dotnetspider: nofollow" (two joined
    headers) scopes one directive to each agent. Directives that
    themselves carry ':' (``unavailable_after``, ``max-snippet``,
    ``max-image-preview``, ``max-video-preview``) never open a scope.
    Implemented as one JVM ``aggregate`` fold over the token array —
    a running (scope, noindex, nofollow) state machine, no Python.
    """
    toks = F.transform(
        F.split(F.lower(F.coalesce(header_value, F.lit(""))), ","),
        lambda t: F.trim(t),
    )
    colon_directives = (
        "unavailable_after", "max-snippet", "max-image-preview",
        "max-video-preview",
    )

    def step(acc, t):
        agent = F.regexp_extract(t, r"^([a-z0-9_.-]+)\s*:", 1)
        opens = (agent != "") & ~agent.isin(*colon_directives)
        scope = F.when(opens, agent).otherwise(acc["scope"])
        payload = F.when(
            opens, F.trim(F.regexp_replace(t, r"^[a-z0-9_.-]+\s*:\s*", ""))
        ).otherwise(t)
        applies = scope.isin("", "dotnetspider")
        return F.struct(
            scope.alias("scope"),
            (acc["noindex"]
             | (applies & payload.isin("noindex", "none"))).alias("noindex"),
            (acc["nofollow"]
             | (applies & payload.isin("nofollow", "none"))).alias(
                 "nofollow"
            ),
        )

    acc = F.aggregate(
        toks,
        F.struct(
            F.lit("").alias("scope"),
            F.lit(False).alias("noindex"),
            F.lit(False).alias("nofollow"),
        ),
        step,
    )
    return F.struct(
        acc["noindex"].alias("noindex"), acc["nofollow"].alias("nofollow")
    )


def page_policy_table(
    df,
    html_col: str = "html",
    base_col: str = "url",
    x_robots_col: str | None = None,
):
    """Standalone curation operator: append REP policy columns.

    Output adds ``noindex`` / ``nofollow`` (meta OR X-Robots-Tag merged
    JVM-side), ``canonical`` (absolute, page-base-resolved, NULL when
    absent), and ``follow_children`` (policy-filtered canonical child
    URLs). Map-only — no shuffle; safe at any scale.
    """
    out = df.withColumn(
        "__pol", extract_policy_links_udf(F.col(html_col), F.col(base_col))
    )
    noindex = F.col("__pol.noindex")
    nofollow = F.col("__pol.nofollow")
    if x_robots_col is not None:
        hdr = x_robots_directives(F.col(x_robots_col))
        noindex = noindex | hdr["noindex"]
        nofollow = nofollow | hdr["nofollow"]
    return (
        out.withColumn("noindex", noindex)
        .withColumn("nofollow", nofollow)
        .withColumn("canonical", F.col("__pol.canonical"))
        .withColumn(
            "follow_children",
            # header-level nofollow arrives after the parse: empty the
            # child list JVM-side rather than re-crossing to Python
            F.when(nofollow, F.array().cast("array<string>")).otherwise(
                F.col("__pol.children")
            ),
        )
        .drop("__pol")
    )


def x_robots_unavailable_after(header_value, fmt: str = "dd MMM yyyy HH:mm:ss zzz"):
    """Epoch seconds of an ``unavailable_after: <date>`` directive
    (Google REP: the page should stop being served from the index
    after this time — a training-data pipeline drops it from refresh
    crawls and curation past expiry). NULL when absent or unparseable.

    JVM-side: one regexp over the RAW header + ``to_timestamp`` with
    the header's date format (Google documents RFC 850 and other
    common date shapes; pass ``fmt`` to match the estate's servers).
    The date payload may itself contain a comma (the "Friday," /
    "Fri," weekday prefix of RFC 850 / RFC 1123 dates), so the header
    must NOT be split on ',' before extraction — the capture admits an
    optional alphabetic-weekday prefix and then runs to the next
    directive separator. The weekday is redundant for parsing (and
    Spark 3+ rejects week-text patterns like ``EEEE``), so it is
    stripped before ``to_timestamp``: pass a weekday-FREE ``fmt``
    (default covers RFC 1123; ``dd-MMM-yyyy HH:mm:ss zzz`` for
    RFC 850).
    """
    raw = F.lower(F.coalesce(header_value, F.lit("")))
    payload = F.regexp_extract(
        raw, r"unavailable_after\s*:\s*((?:[a-z]+\s*,\s*)?[^,]+)", 1
    )
    payload = F.regexp_replace(F.trim(payload), r"^[a-z]+\s*,\s*", "")
    payload = F.when(payload != "", payload)
    # try_to_timestamp: a malformed date is a NULL expiry (fail-open —
    # an unparseable hint must not abort the scan under ANSI mode)
    return F.unix_timestamp(F.try_to_timestamp(payload, F.lit(fmt))).cast(
        "long"
    )


def page_expiry_gate(df, now_epoch: int, expiry_col: str = "expires_at"):
    """Drop rows whose ``unavailable_after`` expiry has passed; rows
    with no expiry are kept (NULL-safe). Map-only."""
    return df.filter(
        F.col(expiry_col).isNull() | (F.col(expiry_col) > F.lit(now_epoch))
    )
