"""Fetchers — the engine's download stage (SURVEY §2.5 sources).

The reference's downloader hierarchy maps onto three fetcher shapes:

- ``CorpusFetcher``   <- FakeDownloader/FileDownloader (canned/offline
  replay, Downloader/FakeDownloader.cs, FileDownloader.cs:24-52): a join
  of the fetch batch against a corpus table. This is the sandbox path
  and the deterministic-test path.
- ``HttpFetcher``     <- HttpClientDownloader (HttpClientDownloader
  .cs:74-188): a ``mapInPandas`` stage, one iterator per host-partition,
  reusing ONE transport per partition (the reference pools clients per
  proxy hash with cookie affinity, :202-271 — per-partition reuse is the
  Spark-native equivalent). The transport is INJECTABLE: the sandbox has
  no network, so tests drive the full stage through ``DictTransport``
  (the FakeDownloader analog); production injects an httpx/urllib3-backed
  factory with the identical call contract.
- ``DirectoryFetcher`` <- file downloads saved under ``downloads/host/``
  (Downloader.cs:247-279): reads payload files per row.

Every fetcher returns the same shape: the batch's frontier columns plus
``status:int`` and content columns — the loop is fetcher-agnostic.
``HttpFetcher`` additionally emits ``target_url`` (post-redirect URL,
Downloader.cs:211-220 / HttpClientDownloader.cs:127), ``content_type``,
``encoding`` (charset sniff: header -> meta -> utf-8 default),
``bytes`` and ``fetch_ms``.
"""

from __future__ import annotations

import time
from urllib.parse import urljoin

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class CorpusFetcher:
    """Fetch = join the batch against a corpus table on url.

    ``content_cols`` controls projection: the scheduling loop asks only
    for ``("status", "html")``; the payload stage asks for the image
    columns — column pruning reaches the corpus scan either way.

    If the corpus carries a ``redirect_to`` column, a non-null value
    replays a single-hop redirect (the corpus analog of HttpClient
    auto-follow): the row's ``status``/``html`` come from the TARGET
    page and ``target_url`` records the post-redirect URL
    (Downloader.cs:211-220 ``page.TargetUrl``). Fixture redirects are
    single-hop by construction (testing.datagen).
    """

    def __init__(
        self,
        corpus: DataFrame,
        content_cols: tuple[str, ...] = ("status", "html"),
        follow_redirects: bool | None = None,
    ):
        self.corpus = corpus
        self.content_cols = content_cols
        #: None = probe once on first fetch (a pushed-filter limit-1 scan)
        #: so redirect-free corpora never pay the per-iteration hop join
        self._follow = follow_redirects

    def _has_redirects(self) -> bool:
        if self._follow is None:
            self._follow = "redirect_to" in self.corpus.columns and (
                self.corpus.where(F.col("redirect_to").isNotNull()).limit(1).count()
                > 0
            )
        return self._follow

    def fetch(self, batch: DataFrame) -> DataFrame:
        has_redirects = self._has_redirects()
        cols = list(self.content_cols) + (["redirect_to"] if has_redirects else [])
        pages = self.corpus.select("url", *cols)
        out = batch.join(pages, "url", "left")
        if has_redirects:
            tgt = self.corpus.select(
                F.col("url").alias("redirect_to"),
                *[F.col(c).alias(f"__t_{c}") for c in self.content_cols],
            )
            out = out.join(tgt, "redirect_to", "left")
            is_redir = F.col("redirect_to").isNotNull()
            for c in self.content_cols:
                out = out.withColumn(
                    c, F.when(is_redir, F.col(f"__t_{c}")).otherwise(F.col(c))
                ).drop(f"__t_{c}")
            out = out.withColumn(
                "target_url", F.coalesce(F.col("redirect_to"), F.col("url"))
            ).drop("redirect_to")
        if "status" in self.content_cols:
            out = out.withColumn("status", F.coalesce(F.col("status"), F.lit(404)))
        return out


class TransportError(Exception):
    """Connection-level failure (timeout, refused, DNS) — the analog of
    the reference's DownloaderException path (Spider.cs:1212-1267 maps it
    to cycle retry); ``HttpFetcher`` surfaces it as status 599."""


class DictTransport:
    """Injectable fake transport (the FakeDownloader analog) backed by a
    plain dict — lets tests drive the FULL ``HttpFetcher`` mapInPandas
    stage with redirects, timeouts and delays but no network.

    ``pages``: url -> dict with optional keys
      ``status`` (default 200), ``body`` (bytes/str, default b""),
      ``content_type`` (header value), ``location`` (redirect target,
      relative allowed), ``raise_timeout`` (bool -> TransportError).
    The instance is pickled into the executor closure; ``__call__``
    follows the transport-factory contract (returns a ``send`` callable —
    "one pooled client per partition"). Each send is appended to
    ``send`` 's ``.log`` (url, monotonic ts) so politeness-delay tests
    can assert same-host spacing inside a partition.
    """

    def __init__(self, pages: dict):
        self.pages = pages

    def __call__(self):
        log: list[tuple[str, float]] = []

        def send(method: str, url: str, headers: dict | None, timeout_s: float):
            log.append((url, time.monotonic()))
            page = self.pages.get(url)
            if page is None:
                return 404, {}, b""
            if page.get("raise_timeout"):
                raise TransportError(f"timeout after {timeout_s}s: {url}")
            hdrs = {}
            if page.get("content_type"):
                hdrs["content-type"] = page["content_type"]
            if page.get("location"):
                hdrs["location"] = page["location"]
            body = page.get("body", b"")
            if isinstance(body, str):
                body = body.encode("utf-8")
            return int(page.get("status", 200)), hdrs, body

        send.log = log
        return send


def sniff_charset_py(content_type: str | None, body: bytes | None) -> str:
    """Charset detection, header -> <meta> -> utf-8 default — the
    Downloader.cs:211-220 ReadContent order. Pure so the mapInPandas
    fetch stage and tests share it. The PATTERNS are imported from
    ``functions.content`` (the column-expression twin and the DuckDB
    oracle SQL use the same strings — three consumers, one definition;
    ``(?i)`` is inline so no flag argument is needed here either)."""
    import re

    from dotnetspider_spark.functions.content import (
        _CHARSET_HDR,
        _CHARSET_META,
    )

    if content_type:
        m = re.search(_CHARSET_HDR, content_type)
        if m:
            return m.group(1).lower()
    if body:
        head = body[:2048].decode("iso-8859-1", "replace")
        m = re.search(_CHARSET_META, head)
        if m:
            return m.group(1).lower()
    return "utf-8"


def is_media_type_py(content_type: str | None) -> bool:
    """Python twin of ``functions.content.is_media_type`` (same
    EXCLUDE_MEDIA_TYPES substring semantics) for use INSIDE the
    mapInPandas fetch stage, where rows exist as Python values."""
    from dotnetspider_spark.functions.content import EXCLUDE_MEDIA_TYPES

    if not content_type or not content_type.strip():
        return False
    lowered = content_type.lower()
    return not any(t in lowered for t in EXCLUDE_MEDIA_TYPES)


class HttpFetcher:
    """Real-HTTP fetch stage: ``mapInPandas`` over the batch repartitioned
    by host (HttpClientDownloader.cs:74-188 re-expressed).

    - one transport per PARTITION (``transport_factory()`` called once in
      the iterator — the reference pools one HttpClient per proxy hash,
      :202-271);
    - per-host politeness INSIDE the batch: consecutive same-host sends
      sleep to ``crawl_delay_ms`` spacing (the rank cap bounds the batch,
      this spaces it — Spider.cs:181,805 SleepTime);
    - redirects followed manually, <= ``max_redirects`` hops
      (HttpClientDownloader AllowAutoRedirect, :96), each hop resolved
      RFC-3986-relative; final URL -> ``target_url``;
    - success = any 2xx after redirects (Downloader.cs:57-64); transport
      errors -> status 599 (a 5xx, so the loop's transient-retry path
      picks it up — the DownloaderException -> AddToCycleRetry mapping,
      Spider.cs:1212-1267);
    - emits ``status, bytes, target_url, content_type, encoding, html,
      fetch_ms``: html is the body decoded with the sniffed charset
      (header -> meta -> utf-8, Downloader.cs:211-220), done in the SAME
      pass so no second Python crossing.

    The sandbox has no network: production injects e.g. an httpx-backed
    factory; tests inject :class:`DictTransport`. The stage itself —
    partitioning, delay, redirects, schema — is identical either way.
    """

    EXTRA_SCHEMA = (
        "status int, bytes binary, target_url string, content_type string, "
        "encoding string, html string, fetch_ms long"
    )

    def __init__(
        self,
        transport_factory,
        timeout_s: float = 8.0,
        max_redirects: int = 10,
        n_partitions: int | None = None,
        crawl_delay_ms: dict[str, int] | None = None,
    ):
        self.transport_factory = transport_factory
        self.timeout_s = timeout_s
        self.max_redirects = max_redirects
        self.n_partitions = n_partitions
        self.crawl_delay_ms = dict(crawl_delay_ms or {})

    def fetch(self, batch: DataFrame) -> DataFrame:
        import pandas as pd

        factory = self.transport_factory
        timeout_s = self.timeout_s
        max_redirects = self.max_redirects
        delays = self.crawl_delay_ms
        out_fields = [f.split()[0] for f in self.EXTRA_SCHEMA.split(", ")]

        def fetch_partition(batches):
            from urllib.parse import urlsplit

            send = factory()  # ONE pooled client per partition
            last_at: dict[str, float] = {}

            def spaced_send(method, cur, headers):
                # politeness applies to EVERY send, redirect hops
                # included, keyed by the host actually being hit — a
                # chain r1 -> r2 on the same host must still space the
                # two requests (SleepTime, Spider.cs:181,805).
                # .hostname, not .netloc: the delay config and the
                # batch 'host' column use the lowercased port-less host
                # (urlops.url_host), so netloc ('H0.example:8080') would
                # silently miss the lookup and skip the spacing
                hop_host = urlsplit(cur).hostname or ""
                delay = delays.get(hop_host, 0) / 1000.0
                if delay > 0 and hop_host in last_at:
                    wait = last_at[hop_host] + delay - time.monotonic()
                    if wait > 0:
                        time.sleep(wait)
                try:
                    return send(method or "GET", cur, headers, timeout_s)
                finally:
                    last_at[hop_host] = time.monotonic()

            for pdf in batches:
                extras: dict[str, list] = {f: [] for f in out_fields}
                for url, host, method, headers in zip(
                    pdf["url"], pdf["host"], pdf["method"], pdf["headers"]
                ):
                    t0 = time.monotonic()
                    cur, status, hdrs, body = url, 599, {}, b""
                    try:
                        for hop in range(max_redirects + 1):
                            status, hdrs, body = spaced_send(
                                method, cur, headers
                            )
                            # header names are case-insensitive (RFC
                            # 9110); transports return their own casing
                            hdrs = {k.lower(): v for k, v in hdrs.items()}
                            loc = hdrs.get("location")
                            # only advance when another hop will
                            # actually be fetched: target_url must be a
                            # URL that WAS requested, even when the
                            # redirect budget runs out mid-chain
                            if 300 <= status < 400 and loc and hop < max_redirects:
                                cur = urljoin(cur, loc)
                                continue
                            break
                    except TransportError:
                        status, hdrs, body = 599, {}, b""
                    ctype = hdrs.get("content-type")
                    if is_media_type_py(ctype):
                        # media payload: bytes only — charset-decoding a
                        # multi-MB image into a garbage string doubles
                        # the Arrow row for a column the loop's media
                        # gate then discards unread
                        enc = sniff_charset_py(ctype, None)
                        html = None
                    else:
                        enc = sniff_charset_py(ctype, body)
                        try:
                            html = body.decode(enc, "replace") if body else None
                        except LookupError:  # unknown codec name in the wild
                            html = (
                                body.decode("utf-8", "replace") if body else None
                            )
                    for f, v in zip(
                        out_fields,
                        (
                            status, bytes(body) if body else None, cur, ctype,
                            enc, html, int((time.monotonic() - t0) * 1000),
                        ),
                    ):
                        extras[f].append(v)
                for f in out_fields:
                    pdf[f] = pd.Series(extras[f], index=pdf.index, dtype="object")
                yield pdf

        schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in batch.schema.fields
        ) + ", " + self.EXTRA_SCHEMA
        n = self.n_partitions or batch.sparkSession.sparkContext.defaultParallelism
        return batch.repartition(n, "host").mapInPandas(fetch_partition, schema)


class DirectoryFetcher:
    """Offline replay of saved payloads: one file per image_id under
    ``root/`` (the reference's downloads/host/path layout). Reads via
    Spark's binaryFile source; join on the derived image_id."""

    def __init__(self, root: str):
        self.root = root

    def fetch(self, batch: DataFrame) -> DataFrame:
        spark = batch.sparkSession
        files = (
            spark.read.format("binaryFile")
            .load(f"{self.root}/*")
            .select(
                # extension class covers JPG/jp2-style names; lowercase-
                # alpha-only returned '' for them -> spurious 404s
                F.regexp_extract(F.col("path"), r"([^/]+)\.[A-Za-z0-9]+$", 1).alias(
                    "image_id"
                ),
                F.col("content").alias("bytes"),
            )
        )
        return batch.join(files, "image_id", "left").withColumn(
            "status", F.when(F.col("bytes").isNull(), 404).otherwise(200)
        )
