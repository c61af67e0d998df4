"""Image-corpus curation operators over the north-rule pair table
(``image_id, bytes, w, h, fmt, caption, phash``).

These are the image-payload counterparts of the text curation ops in
:mod:`curation` — the stages an image+caption training-data pipeline
(LAION-5B, DataComp) runs between the crawl and the trainer: exact
byte-level dedup, caption-level dedup, aspect-ratio bucketing into
fixed training resolutions, and phash similarity search. All four are
pure built-in column expressions (no Python crossing); the only
shuffles are the key-group ones the semantics require, and each is
bounded (digest / normalized caption / (bucket, shard) keys — never a
global sort, never the image bytes).

No reference analog (DotnetSpider stores downloads but does not curate
them); the published pipelines cited per-function are the spec.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def image_digest(data: Column) -> Column:
    """Portable content digest of an image payload: md5 over the
    UPPERCASE hex encoding of the bytes. Hex-first keeps the digest
    engine-portable (DuckDB's md5() accepts only VARCHAR; both engines
    hex() blobs identically), which is what makes the dedup oracle
    checkable. One codegen'd expression."""
    return F.md5(F.hex(data))


def image_exact_dedup(
    pairs: DataFrame,
    bytes_col: str = "bytes",
    id_col: str = "image_id",
) -> DataFrame:
    """Exact byte-level image dedup: keep the minimum-id row per
    content digest (LAION-style URL+content dedup reduced to the
    content half). Digest is computed map-side, so the shuffle ships
    (digest, id) pairs grouped by a 128-bit key — uniformly
    distributed, no skew guard needed — and the survivor set joins
    back by id so image bytes never cross the dedup exchange."""
    digests = pairs.select(
        F.col(id_col), image_digest(F.col(bytes_col)).alias("__digest")
    )
    keep = digests.groupBy("__digest").agg(F.min(id_col).alias(id_col))
    return pairs.join(keep.select(id_col), id_col, "semi")


def caption_dedup(
    pairs: DataFrame,
    caption_col: str = "caption",
    id_col: str = "image_id",
) -> DataFrame:
    """Caption-level dedup: keep the minimum-id pair per normalized
    caption. DataComp ablations show repeated boilerplate captions
    ("image", "product photo") dominate crawled pair sets; grouping on
    the normalized form (lowercase, punctuation stripped, whitespace
    collapsed — :func:`curation.normalize_text`) catches
    trivially-reworded repeats. Same ships-ids-only shape as
    :func:`image_exact_dedup`."""
    from .curation import normalize_text

    keys = pairs.select(
        F.col(id_col), normalize_text(F.col(caption_col)).alias("__cap")
    )
    keep = keys.groupBy("__cap").agg(F.min(id_col).alias(id_col))
    return pairs.join(keep.select(id_col), id_col, "semi")


def aspect_bucket_batches(
    pairs: DataFrame,
    buckets: list[tuple[int, int]] | None = None,
    batch_size: int = 64,
    n_shards: int = 256,
    salt: str = "abb",
    id_col: str = "image_id",
    drop_partial: bool = True,
) -> DataFrame:
    """Aspect-ratio bucketing (NovelAI / SDXL training recipe): assign
    every image to the training resolution whose aspect ratio is
    nearest its own, then group same-bucket images into fixed-size
    batches so a trainer never mixes shapes inside one step.

    Nearest bucket = argmin over ``|w/h - bw/bh|``; both divisions and
    the subtraction are single correctly-rounded IEEE ops, so the
    distances (and therefore the assignment, ties broken by bucket
    index) are bit-identical across engines — the published recipes
    bucket by log-aspect, but ``Math.log`` is not correctly rounded in
    Java, which would make the oracle flaky at midpoints. Buckets are
    a handful of literals, so the argmin is one ``array_min`` over an
    inline array<struct<dist,idx>> — map-only codegen.

    Batch numbering at scale: a window per bucket alone would sort one
    mega-bucket (most web images are 1:1 or 4:3) in a single task, so
    rows are first sharded by a portable hash into ``n_shards``
    independent streams per bucket and numbered within (bucket, shard)
    — the :func:`curation.pack_sequences` argument: any partition into
    size-``batch_size`` groups is a valid batching, and this one is
    deterministic (hash order), independent of arrival order, and
    bounded at ~bucket/n_shards rows per window task. ``drop_partial``
    drops each shard's trailing short batch (trainers want full
    batches; expected loss is n_shards*batch_size/2 rows per bucket,
    negligible at corpus scale).

    Returns (id, bucket_w, bucket_h, shard, batch_index).
    """
    from .textdedup import _hash64

    if buckets is None:
        # SDXL's published 1024^2-area ladder, trimmed to the common core
        buckets = [
            (512, 2048), (704, 1408), (832, 1216), (1024, 1024),
            (1216, 832), (1408, 704), (2048, 512),
        ]
    if batch_size < 1 or n_shards < 1:
        raise ValueError("batch_size and n_shards must be >= 1")

    aspect = F.col("w").cast("double") / F.col("h").cast("double")
    cands = F.array(
        *[
            F.struct(
                F.abs(aspect - F.lit(float(bw) / float(bh))).alias("d"),
                F.lit(i).alias("i"),
            )
            for i, (bw, bh) in enumerate(buckets)
        ]
    )
    best_i = F.array_min(cands).getField("i")
    h = _hash64(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string")))
    assigned = pairs.select(
        F.col(id_col),
        best_i.alias("__b"),
        F.pmod(h, F.lit(n_shards)).alias("shard"),
        h.alias("__h"),
    )
    w = Window.partitionBy("__b", "shard").orderBy(
        F.col("__h").asc(), F.col(id_col).asc()
    )
    numbered = assigned.withColumn(
        "batch_index",
        ((F.row_number().over(w) - 1) / batch_size).cast("long"),
    )
    if drop_partial:
        # full-batch count per (bucket, shard): a count over the same
        # window partitioning — reuses the numbering exchange, no join
        n_full = (
            F.count(F.lit(1)).over(Window.partitionBy("__b", "shard"))
            / batch_size
        ).cast("long")
        numbered = numbered.withColumn("__nfull", n_full).filter(
            F.col("batch_index") < F.col("__nfull")
        )
    bw = F.element_at(
        F.array(*[F.lit(b[0]) for b in buckets]), F.col("__b") + 1
    )
    bh = F.element_at(
        F.array(*[F.lit(b[1]) for b in buckets]), F.col("__b") + 1
    )
    return numbered.select(
        id_col,
        bw.alias("bucket_w"),
        bh.alias("bucket_h"),
        "shard",
        "batch_index",
    )


def phash_topk(
    images: DataFrame,
    query_phash: int,
    k: int = 10,
    id_col: str = "image_id",
    phash_col: str = "phash",
) -> DataFrame:
    """Perceptual-hash similarity search: the ``k`` images nearest a
    query phash by Hamming distance. The scan side is one map-only
    ``bit_count(phash XOR query)`` expression (no join, no Python) and
    the top-k is orderBy+limit -> TakeOrderedAndProject, so the full
    corpus is never sorted — each task keeps a k-row heap and the
    driver merges. This is the point-query twin of the batch
    :func:`validate.phash_near_duplicates` band join (reverse-image
    lookup, dedup-cluster inspection)."""
    dist = F.bit_count(
        F.col(phash_col).bitwiseXOR(F.lit(int(query_phash)).cast("long"))
    )
    return (
        images.select(F.col(id_col), dist.cast("int").alias("hamming"))
        .orderBy(F.col("hamming").asc(), F.col(id_col).asc())
        .limit(k)
    )
