"""WebDataset shard sink — image+caption pairs packed into tar shards.

WebDataset (the public webdataset/tarp format used by the LAION /
OpenCLIP training stacks) stores a sample as adjacent tar members that
share a basename key — ``{key}.{fmt}`` for the image payload and
``{key}.txt`` for its caption — and a corpus as a set of fixed-size
``shard-NNNNNN.tar`` files that trainers stream sequentially. This sink
is the last stage of the image curation pipeline: after screening /
dedup / bucketing, pairs leave Spark as training-ready shards.

Spark-first shape:

- shard assignment is a MAP-ONLY portable-hash expression
  (:func:`assign_shards`) — deterministic in the pair id, independent of
  arrival order and partitioning, reproducible across engines (the
  assignment itself is oracle-checked as the ``webdataset_shards``
  query). Hash sharding gives each shard a Binomial(n, 1/n_shards) row
  count — tight around the mean at corpus scale — which is exactly the
  published practice (wds shards are "roughly equal", not bin-packed).
- writing groups by shard id with ``applyInPandas`` so ONE task owns
  one whole shard and streams it into ONE tar — the format's contract
  (a shard is a sequential-read unit) maps 1:1 onto a Spark group. No
  driver funnel: n_shards tasks write n_shards tars in parallel.
  Members are emitted in (member hash, id) order so a re-run produces
  byte-identical tars (tar metadata is pinned: mtime=0, uid=gid=0).
- a shard must fit one task's memory — that is the FORMAT's own sizing
  rule (shards are sized to ~0.1-2 GB so trainers can shuffle at shard
  granularity); pick ``n_shards`` ≈ corpus_bytes / 1 GB. The writer
  writes to ``_tmp-`` names and atomically renames, so task retries
  are idempotent (same staged-rename discipline as sinks/tables.py).

No reference analog (DotnetSpider stores one file per download,
Downloader.cs:390-395 — a single-writer shape this sink replaces);
format spec: github.com/webdataset/webdataset (public).
"""

from __future__ import annotations

import os
import tarfile
import time
from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_shards(
    pairs: DataFrame,
    n_shards: int,
    id_col: str = "image_id",
    salt: str = "wds",
) -> DataFrame:
    """Deterministic shard + member-key assignment for every pair.

    Adds ``shard`` (portable-hash pmod — the same 60-bit md5-prefix
    hash every sampling op in this engine uses), ``member_key`` (the
    zero-padded within-shard basename; rank of the member hash within
    its shard, ties on id) and keeps all input columns. The window
    partitions by shard — at most ~corpus/n_shards rows per partition
    by construction, the same bound the tar writer already needs.
    """
    from dotnetspider_spark.operators.textdedup import _hash64

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    from pyspark.sql import Window

    h = _hash64(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string")))
    with_shard = pairs.withColumn(
        "shard", F.pmod(h, F.lit(n_shards)).cast("int")
    ).withColumn("__mh", h)
    w = Window.partitionBy("shard").orderBy(
        F.col("__mh").asc(), F.col(id_col).asc()
    )
    return with_shard.withColumn(
        "member_key",
        F.lpad((F.row_number().over(w) - 1).cast("string"), 9, "0"),
    ).drop("__mh")


def write_webdataset(
    pairs: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    caption_col: str = "caption",
    salt: str = "wds",
    shard_col: str | None = None,
) -> DataFrame:
    """Write pairs as ``{path}/shard-NNNNNN.tar`` WebDataset shards and
    return the manifest as a DataFrame (shard, n_samples, n_bytes,
    tar_path) — an ACTION (the write happens when this returns).

    Each sample becomes two adjacent members ``{key}.{fmt}`` (payload)
    and ``{key}.txt`` (caption utf-8). Tars are byte-deterministic:
    fixed member order (hash, id), zeroed mtime/uid/gid, staged-rename
    commit so retries are idempotent.

    ``shard_col``: use a PRECOMPUTED shard assignment (e.g. from
    :func:`balanced_shards`) instead of the default hash assignment;
    values must be ints in ``[0, n_shards)``. Member keys are still
    derived here (hash rank within the given shard).

    Filesystem contract: tars are written with local-file APIs from
    executor tasks, so ``path`` must be a filesystem every executor
    AND the driver can reach at the same mount point (local mode, NFS,
    or a FUSE-mounted object store). Plain ``hdfs://``/``s3://`` URIs
    need a different writer; this one fails fast rather than
    scattering shards across executor-local disks.
    """
    if "://" in path:
        raise ValueError(
            "write_webdataset writes via local-file APIs on executors; "
            f"URI paths are not supported: {path!r} (mount the store "
            "and pass the mount path)"
        )
    os.makedirs(path, exist_ok=True)
    if shard_col is not None:
        from dotnetspider_spark.operators.textdedup import _hash64
        from pyspark.sql import Window

        h = _hash64(
            F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string"))
        )
        w = Window.partitionBy(F.col(shard_col)).orderBy(
            h.asc(), F.col(id_col).asc()
        )
        pre = pairs.withColumn(
            "shard", F.col(shard_col).cast("int")
        ).withColumn(
            "member_key",
            F.lpad((F.row_number().over(w) - 1).cast("string"), 9, "0"),
        )
    else:
        pre = assign_shards(pairs, n_shards, id_col=id_col, salt=salt)
    assigned = pre.select(
        F.col("shard"),
        F.col("member_key"),
        F.col(id_col).cast("string").alias("__id"),
        F.col(bytes_col).alias("__bytes"),
        F.col(fmt_col).cast("string").alias("__fmt"),
        F.col(caption_col).cast("string").alias("__cap"),
    )

    def _write_shard(pdf):
        import pandas as pd

        shard = int(pdf["shard"].iloc[0])
        # executor-side: the driver's makedirs only ran on its own node
        os.makedirs(path, exist_ok=True)
        tar_path = os.path.join(path, f"shard-{shard:06d}.tar")
        tmp_path = os.path.join(
            path, f"_tmp-shard-{shard:06d}-{os.getpid()}-{int(time.time()*1e6)}.tar"
        )
        pdf = pdf.sort_values(["member_key"])
        n_bytes = 0
        with tarfile.open(tmp_path, "w") as tar:
            for _, row in pdf.iterrows():
                payload = bytes(row["__bytes"]) if row["__bytes"] is not None else b""
                cap = (row["__cap"] or "").encode("utf-8")
                key = row["member_key"]
                for name, data in (
                    (f"{key}.{row['__fmt']}", payload),
                    (f"{key}.txt", cap),
                ):
                    info = tarfile.TarInfo(name=name)
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    import io

                    tar.addfile(info, io.BytesIO(data))
                    n_bytes += len(data)
        os.replace(tmp_path, tar_path)  # atomic commit; retries idempotent
        return pd.DataFrame(
            {
                "shard": [shard],
                "n_samples": [len(pdf)],
                "n_bytes": [n_bytes],
                "tar_path": [tar_path],
            }
        )

    manifest = (
        assigned.groupBy("shard")
        .applyInPandas(
            _write_shard,
            "shard int, n_samples long, n_bytes long, tar_path string",
        )
        .collect()  # n_shards manifest rows — the action that writes
    )
    spark = pairs.sparkSession
    return spark.createDataFrame(
        manifest, "shard int, n_samples long, n_bytes long, tar_path string"
    )


def read_webdataset(spark, path: str) -> DataFrame:
    """Read shards back as (shard, member_key, fmt, bytes, caption) —
    the verification twin of :func:`write_webdataset` (and a general
    wds source: trainers aren't the only consumers; re-curation reads
    shards too). One task per tar via binaryFile + mapInPandas, payload
    and caption re-paired on the shared basename inside the task — the
    pairing never shuffles."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(
        os.path.join(path, "shard-*.tar")
    ).select("path", "content")

    def _read(batches: Iterable["pd.DataFrame"]):
        import io

        for pdf in batches:
            out = {
                "shard": [],
                "member_key": [],
                "fmt": [],
                "bytes": [],
                "caption": [],
            }
            for _, row in pdf.iterrows():
                shard = int(
                    os.path.basename(row["path"]).split("-")[1].split(".")[0]
                )
                samples: dict[str, dict] = {}
                with tarfile.open(
                    fileobj=io.BytesIO(bytes(row["content"]))
                ) as tar:
                    for m in tar:
                        key, ext = m.name.rsplit(".", 1)
                        data = tar.extractfile(m).read()
                        slot = samples.setdefault(key, {})
                        if ext == "txt":
                            slot["caption"] = data.decode("utf-8")
                        else:
                            slot["fmt"] = ext
                            slot["bytes"] = data
                for key in sorted(samples):
                    s = samples[key]
                    out["shard"].append(shard)
                    out["member_key"].append(key)
                    out["fmt"].append(s.get("fmt", ""))
                    out["bytes"].append(s.get("bytes", b""))
                    out["caption"].append(s.get("caption", ""))
            yield pd.DataFrame(out)

    return files.mapInPandas(
        _read,
        "shard int, member_key string, fmt string, bytes binary, caption string",
    )


def balanced_shards(
    pairs: DataFrame,
    n_shards: int,
    size_col: str = "n_bytes",
    id_col: str = "image_id",
    strata: int = 64,
    salt: str = "bal",
) -> DataFrame:
    """Size-BALANCED shard assignment — hash assignment
    (:func:`assign_shards`) balances member COUNTS by the law of large
    numbers but lets byte totals drift when sizes are heavy-tailed
    (they are: images). Training I/O wants equal-byte shards, so this
    variant round-robins members over shards in descending size order,
    the deterministic form of greedy LPT scheduling (Graham 1969):
    within one sorted stream, shard totals differ by at most the
    largest member.

    Scale shape — NO global sort/window (an unpartitioned row_number
    would funnel the corpus through one task): rows are first split
    into ``strata`` deterministic hash strata; the size-descending
    round-robin runs per stratum (a partitioned window), and each
    stratum's robin starts at a stratum-dependent shard offset so no
    shard systematically receives every stratum's largest member.
    Each stratum is an unbiased size sample, so the per-stratum LPT
    bound compounds to ~strata x (p100 - typical) bytes of worst-case
    skew — negligible against shard sizes at any real corpus/shard
    ratio, and byte-deterministic across runs, engines and
    partitionings (the hash is the engine-wide portable md5-prefix).

    Returns the input columns plus ``shard``. Feed the result to
    :func:`write_webdataset` with ``shard_col="shard"`` so the
    one-task-per-shard writer honors the balanced assignment.
    """
    from dotnetspider_spark.operators.textdedup import _hash64

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if strata < 1:
        raise ValueError("strata must be >= 1")
    from pyspark.sql import Window

    strat = F.pmod(
        _hash64(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string"))),
        F.lit(strata),
    )
    w = Window.partitionBy("__strat").orderBy(
        F.col(size_col).desc(), F.col(id_col).asc()
    )
    return (
        pairs.withColumn("__strat", strat)
        .withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "shard",
            F.pmod(
                F.col("__strat") + F.col("__rn") - 1, F.lit(n_shards)
            ).cast("int"),
        )
        .drop("__strat", "__rn")
    )
