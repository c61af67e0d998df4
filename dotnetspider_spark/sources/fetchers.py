"""Fetchers — the engine's download stage (SURVEY §2.5 sources).

The reference's downloader hierarchy maps onto three fetcher shapes:

- ``CorpusFetcher``   <- FakeDownloader/FileDownloader (canned/offline
  replay, Downloader/FakeDownloader.cs, FileDownloader.cs:24-52): a join
  of the fetch batch against a corpus table. This is the sandbox path
  and the deterministic-test path.
- ``HttpFetcher``     <- HttpClientDownloader (HttpClientDownloader
  .cs:74-188): a ``mapInPandas`` stage, one iterator per host-partition,
  reusing one HTTP client per partition (the reference pools clients per
  proxy hash with cookie affinity, :202-271 — per-partition reuse is the
  Spark-native equivalent). The sandbox has no network and no httpx, so
  ``HttpFetcher.fetch`` raises ``NotImplementedError`` loudly; the
  partitioning/batching/schema plumbing it would use is exactly
  ``CorpusFetcher``'s and is fully exercised by tests.
- ``DirectoryFetcher`` <- file downloads saved under ``downloads/host/``
  (Downloader.cs:247-279): reads payload files per row.

Every fetcher returns the same shape: the batch's frontier columns plus
``status:int`` and content columns — the loop is fetcher-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class CorpusFetcher:
    """Fetch = join the batch against a corpus table on url.

    ``content_cols`` controls projection: the scheduling loop asks only
    for ``("status", "html")``; the payload stage asks for the image
    columns — column pruning reaches the corpus scan either way.
    """

    def __init__(self, corpus: DataFrame, content_cols: tuple[str, ...] = ("status", "html")):
        self.corpus = corpus
        self.content_cols = content_cols

    def fetch(self, batch: DataFrame) -> DataFrame:
        pages = self.corpus.select("url", *self.content_cols)
        return batch.join(pages, "url", "left").withColumn(
            "status", F.coalesce(F.col("status"), F.lit(404))
        )


class HttpFetcher:
    """Real-HTTP fetch stage (STUB in this sandbox — no network, no
    httpx/aiohttp). The production implementation is a ``mapInPandas``
    over the batch repartitioned by host:

        batch.repartition(n, "host").mapInPandas(fetch_partition, schema)

    where ``fetch_partition`` opens ONE pooled client, applies the
    per-host ``crawl_delay_ms`` between same-host requests (politeness
    within the batch the rank already capped), honors timeout 8s /
    redirects <= 10 / success = 2xx-3xx like Downloader.cs:57-64,358-365,
    and yields rows of (frontier cols, status, bytes, target_url,
    content_type, fetch_ms).
    """

    def __init__(self, timeout_s: float = 8.0, max_redirects: int = 10):
        self.timeout_s = timeout_s
        self.max_redirects = max_redirects

    def fetch(self, batch: DataFrame) -> DataFrame:
        raise NotImplementedError(
            "no network/HTTP client library in this sandbox; use "
            "CorpusFetcher (offline replay) — the production mapInPandas "
            "shape is documented in this class's docstring"
        )


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
                F.regexp_extract(F.col("path"), r"([^/]+)\.[a-z]+$", 1).alias(
                    "image_id"
                ),
                F.col("content").alias("bytes"),
            )
        )
        return batch.join(files, "image_id", "left").withColumn(
            "status", F.when(F.col("bytes").isNull(), 404).otherwise(200)
        )
