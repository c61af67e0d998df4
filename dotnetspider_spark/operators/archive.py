"""Web-archive indexing operators: SURT canonicalization, CDX index
generation, and mirror-host detection.

The reference crawls pages but never builds an archive index; real
crawl estates (Heritrix, the Internet Archive toolchain, Common Crawl)
index every capture with a SURT-keyed CDX so lookups, dedup and replay
scale to trillions of captures. The forms here follow the public
specifications:

- SURT (Sort-friendly URI Reordering Transform, Heritrix /
  webarchive-commons): host labels reversed and comma-joined so one
  registrable domain's captures sort contiguously —
  ``http://www.example.com/a?b=2&a=1`` -> ``com,example)/a?a=1&b=2``.
- CDX (IA's capture index): one row per capture keyed by
  ``(surt, timestamp)`` carrying the original URL, MIME, HTTP status,
  a payload digest and the payload length.
- Mirror detection: two hosts serving near-identical page sets (exact
  content fingerprints) are one logical site behind two names; crawl
  estates demote one side to save fetch budget.

Everything here is pure column algebra (codegen, zero Python) except
nothing — there are no UDFs in this module. Regexes stay in the
portable subset (no lookaround/backreferences) so the exact same
patterns run under Spark (Java regex) and DuckDB (RE2); that is what
makes each operator oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SCHEME = r"^[a-z][a-z0-9+.-]*://"


def surt(url: Column) -> Column:
    """Sort-friendly URI Reordering Transform of a URL string.

    Canonicalization rules (the deterministic core of Heritrix's
    default ``SURT`` + ``BasicURLCanonicalizer``):

    - lowercase; scheme and fragment dropped; userinfo stripped
    - leading ``www`` / ``www<digits>`` label stripped
    - default ports ``:80`` / ``:443`` stripped, other ports kept
    - host labels reversed, comma-joined, closed with ``)``
    - empty path becomes ``/``
    - query kept with its ``key=value`` pairs sorted bytewise (empty
      pairs from ``&&`` dropped), so parameter permutations of one
      page key identically

    One codegen'd expression; no shuffle, no Python.
    """
    rest = F.regexp_replace(F.lower(F.trim(url)), _SCHEME, "")
    auth = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    auth = F.regexp_replace(auth, r"^[^/?#@]*@", "")
    host = F.regexp_replace(auth, r":[0-9]*$", "")
    port = F.regexp_extract(auth, r":([0-9]+)$", 1)
    host = F.regexp_replace(host, r"^www[0-9]*\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    keep_port = (port != "") & (port != "80") & (port != "443")
    key = F.when(keep_port, F.concat(rev, F.lit(":"), port)).otherwise(rev)
    path = F.regexp_extract(rest, r"^[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?([^#]*)", 1)
    sorted_q = F.array_join(
        F.array_sort(F.filter(F.split(query, "&"), lambda p: p != "")), "&"
    )
    return F.when(
        sorted_q == "", F.concat(key, F.lit(")"), path)
    ).otherwise(F.concat(key, F.lit(")"), path, F.lit("?"), sorted_q))


def cdx_index(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    mime_col: str = "mime",
    status_col: str = "status",
    body_col: str = "body",
) -> DataFrame:
    """Build a CDX capture index: one row per capture with the SURT
    key, capture timestamp, original URL, MIME, status, an md5 payload
    digest and the payload character length, globally ordered by
    ``(surt, ts)``.

    The digest is md5 (portable to the oracle; a production estate
    would use sha1-b32 per the CDX spec — same shape, different
    function). The global order is Spark's range-partitioned sort —
    the scalable path for the multi-TB CDX files real archives emit:
    each output partition is a sorted, non-overlapping key range, so
    downstream binary-search lookup works per-file. The payload column
    is digested and dropped in the same projection, so the wide bytes
    never survive into the sort's exchange.
    """
    body = F.col(body_col)
    rows = captures.select(
        surt(F.col(url_col)).alias("surt"),
        F.col(ts_col).cast("string").alias("ts"),
        F.col(url_col).alias("original"),
        F.col(mime_col).alias("mime"),
        F.col(status_col).cast("int").alias("status"),
        F.md5(body.cast("string")).alias("digest"),
        F.length(body.cast("string")).cast("long").alias("length"),
    )
    return rows.orderBy("surt", "ts")


def mirror_hosts(
    pages: DataFrame,
    host_col: str = "host",
    fp_col: str = "fingerprint",
    max_fp_hosts: int = 16,
    min_shared: int = 5,
    threshold: float = 0.9,
) -> DataFrame:
    """Detect host pairs serving the same content (site mirrors).

    Input: one row per (host, page-content fingerprint) observation —
    duplicates are collapsed first. A fingerprint seen on more than
    ``max_fp_hosts`` hosts is template boilerplate (cookie banners,
    parked-domain pages) and is excluded from pairing — this is also
    the skew guard: pairing explodes a fingerprint on ``h`` hosts into
    ``h·(h-1)/2`` pairs, so the cap bounds the blowup per fingerprint
    at ``max_fp_hosts²`` regardless of corpus size. Fingerprints seen
    on a single host pair with nothing and are dropped by the same
    filter.

    Output: one row per candidate pair ``(host_a < host_b)`` with
    ``n_shared`` (co-occurring fingerprints), each side's total
    distinct-fingerprint count (``n_a``/``n_b``, counted BEFORE the
    boilerplate cap, so the denominator is the host's true page set),
    ``containment`` = n_shared / min(n_a, n_b), and the ``mirror``
    verdict: at least ``min_shared`` shared pages AND containment >=
    ``threshold``.

    Scale shape: distinct + two partial-agg groupBys + one fp-keyed
    self-join over capped fingerprints; host sizes join back keyed on
    host. No windows, no driver state, payload never enters — callers
    fingerprint upstream (e.g. ``F.md5`` of the normalized body).
    """
    obs = (
        pages.select(
            F.col(host_col).alias("host"), F.col(fp_col).alias("fp")
        )
        .distinct()
    )
    host_sizes = obs.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_fps")
    )
    fp_hosts = obs.groupBy("fp").agg(F.count(F.lit(1)).alias("n_hosts"))
    pairable = obs.join(
        fp_hosts.filter(
            (F.col("n_hosts") >= 2) & (F.col("n_hosts") <= max_fp_hosts)
        ).select("fp"),
        "fp",
        "left_semi",
    )
    a = pairable.alias("a")
    b = pairable.alias("b")
    shared = (
        a.join(b, F.col("a.fp") == F.col("b.fp"))
        .filter(F.col("a.host") < F.col("b.host"))
        .groupBy(
            F.col("a.host").alias("host_a"), F.col("b.host").alias("host_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    sized = (
        shared.join(
            host_sizes.select(
                F.col("host").alias("host_a"), F.col("n_fps").alias("n_a")
            ),
            "host_a",
        )
        .join(
            host_sizes.select(
                F.col("host").alias("host_b"), F.col("n_fps").alias("n_b")
            ),
            "host_b",
        )
    )
    containment = F.col("n_shared") / F.least(F.col("n_a"), F.col("n_b"))
    return sized.select(
        "host_a",
        "host_b",
        "n_shared",
        "n_a",
        "n_b",
        F.round(containment, 6).alias("containment"),
        (
            (F.col("n_shared") >= min_shared) & (containment >= threshold)
        ).alias("mirror"),
    )


def revisit_records(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    digest_col: str = "digest",
    size_col: str | None = None,
) -> DataFrame:
    """WARC ``revisit`` classification (ISO 28500 / IIPC
    identical-payload-digest profile — what Common Crawl and the
    Internet Archive write instead of re-storing an unchanged body):
    the FIRST capture of each (url, digest) is a full ``response``
    record; every later capture with the same digest becomes a
    ``revisit`` referencing the original's timestamp.

    Shape: one window keyed (url, digest) ordered by ts — captures of
    one URL land in one partition group (bounded by that URL's capture
    count, thousands at worst, never corpus-scale). When ``size_col``
    is given, ``saved_bytes`` reports what the revisit record avoids
    re-storing. Emits (url, ts, kind, ref_ts[, saved_bytes]).
    """
    # row_number, not a ts-equality test: two captures sharing the
    # group's minimum timestamp (second-resolution WARC dates, merged
    # crawls) must still yield exactly ONE response record — a
    # ts == min(ts) comparison emits both as responses and silently
    # loses the storage saving
    w = Window.partitionBy(url_col, digest_col).orderBy(
        F.col(ts_col).asc(), *([F.col(size_col).asc()] if size_col else [])
    )
    rn = F.row_number().over(w)
    first_ts = F.min(ts_col).over(Window.partitionBy(url_col, digest_col))
    out = (
        captures.withColumn("__rn", rn)
        .withColumn("__first_ts", first_ts)
        .select(
            F.col(url_col).alias("url"),
            F.col(ts_col).alias("ts"),
            F.when(F.col("__rn") == 1, "response")
            .otherwise("revisit")
            .alias("kind"),
            F.when(F.col("__rn") > 1, F.col("__first_ts")).alias("ref_ts"),
            *([F.col(size_col)] if size_col else []),
            F.col("__rn"),
        )
    )
    if size_col:
        out = out.withColumn(
            "saved_bytes",
            F.when(F.col("kind") == "revisit", F.col(size_col))
            .otherwise(F.lit(0))
            .cast("long"),
        ).drop(size_col)
    return out.drop("__rn")
