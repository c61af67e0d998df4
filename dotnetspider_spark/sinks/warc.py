"""WARC shard sink — archive fetched pages as WARC/1.0 files.

The write twin of :mod:`..sources.warc` (read). DotnetSpider persists
fetched pages only through its entity pipelines or one-file-per-download
(Downloader.cs:390-395); the interchange format real crawl corpora ship
in is WARC (ISO 28500 — what Common Crawl / IA publish), so a crawl
engine whose output feeds training pipelines needs to EMIT it, not just
read it. This sink turns the engine's fetched-page shape into
``{path}/crawl-NNNNNN.warc.gz`` shards plus a manifest DataFrame.

Spark-first shape (same discipline as sinks/webdataset.py):

- shard assignment is a MAP-ONLY portable-hash expression over the URL —
  deterministic, partitioning-independent, reproducible across engines.
  Binomial(n, 1/n_shards) rows per shard ≈ equal-size shards at corpus
  scale, matching how Common Crawl sizes ~1 GB .warc.gz files.
- ONE task owns one whole shard (``groupBy(shard).applyInPandas``): a
  WARC file is a sequential container, so the format's unit of write
  maps 1:1 onto a Spark group; n_shards tasks write in parallel with no
  driver funnel.
- byte-determinism: records are emitted in (record-hash, url) order and
  gzip is pinned (``mtime=0``, empty filename), so a re-run produces
  byte-identical shards; the writer stages to ``_tmp-`` names and
  ``os.replace``s, so task retries are idempotent.
- shard-must-fit-one-task is the format's own sizing rule (pick
  ``n_shards ≈ corpus_bytes / 1 GB``), not an engine limitation.

Filesystem contract: same as write_webdataset — local-file APIs from
executor tasks, so ``path`` must be a shared mount; URI paths fail fast.
"""

from __future__ import annotations

import gzip
import io
import os
import time

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dotnetspider_spark.sources.warc import format_warc_record

MANIFEST_SCHEMA = "shard int, n_records long, n_bytes long, warc_path string"


def write_warc(
    pages: DataFrame,
    path: str,
    n_shards: int,
    url_col: str = "url",
    date_col: str = "warc_date",
    status_col: str = "http_status",
    ct_col: str = "http_content_type",
    body_col: str = "body",
    salt: str = "warc",
) -> DataFrame:
    """Write pages as gzipped WARC/1.0 response shards; return the
    manifest (shard, n_records, n_bytes, warc_path) — an ACTION (the
    files exist when this returns). Output is readable by
    :func:`..sources.warc.read_warc` byte-for-byte (round-trip pinned
    by tests and the ``warc_roundtrip`` oracle query)."""
    if "://" in path:
        raise ValueError(
            "write_warc writes via local-file APIs on executors; URI "
            f"paths are not supported: {path!r} (mount the store and "
            "pass the mount path)"
        )
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    from dotnetspider_spark.operators.textdedup import _hash64

    os.makedirs(path, exist_ok=True)
    h = _hash64(F.concat(F.lit(f"{salt}|"), F.col(url_col).cast("string")))
    assigned = pages.select(
        F.pmod(h, F.lit(n_shards)).cast("int").alias("shard"),
        h.alias("__h"),
        F.col(url_col).cast("string").alias("__url"),
        F.col(date_col).cast("string").alias("__date"),
        F.col(status_col).cast("int").alias("__status"),
        F.col(ct_col).cast("string").alias("__ct"),
        F.col(body_col).alias("__body"),
    )

    def _write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        os.makedirs(path, exist_ok=True)  # executor-side
        warc_path = os.path.join(path, f"crawl-{shard:06d}.warc.gz")
        tmp_path = os.path.join(
            path,
            f"_tmp-crawl-{shard:06d}-{os.getpid()}-{int(time.time() * 1e6)}",
        )
        pdf = pdf.sort_values(["__h", "__url"])
        raw = io.BytesIO()
        # mtime=0 + no embedded filename pins the gzip header bytes
        with gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as gz:
            for _, row in pdf.iterrows():
                body = bytes(row["__body"]) if row["__body"] is not None else b""
                gz.write(
                    format_warc_record(
                        row["__url"],
                        row["__date"] or "",
                        int(row["__status"]) if pd.notna(row["__status"]) else 0,
                        row["__ct"] or "application/octet-stream",
                        body,
                    )
                )
        data = raw.getvalue()
        with open(tmp_path, "wb") as f:
            f.write(data)
        os.replace(tmp_path, warc_path)  # atomic commit; retries idempotent
        return pd.DataFrame(
            {
                "shard": [shard],
                "n_records": [len(pdf)],
                "n_bytes": [len(data)],
                "warc_path": [warc_path],
            }
        )

    manifest = (
        assigned.groupBy("shard")
        .applyInPandas(_write_shard, MANIFEST_SCHEMA)
        .collect()  # n_shards manifest rows — the action that writes
    )
    return pages.sparkSession.createDataFrame(manifest, MANIFEST_SCHEMA)
