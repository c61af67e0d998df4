"""Image-corpus curation ops (operators/images.py): exact/caption
dedup, aspect-ratio batch bucketing, phash top-k."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
import pytest

from dotnetspider_spark.operators.images import (
    aspect_bucket_batches,
    caption_dedup,
    image_digest,
    image_exact_dedup,
    phash_topk,
)


def _pairs(spark, rows):
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, caption string"
    )


def test_image_digest_matches_hashlib(spark):
    row = _pairs(
        spark, [("a", b"\xab\xcd\x00PNG", 1, 1, "")]
    ).select(image_digest(F.col("bytes")).alias("d")).first()
    assert row.d == hashlib.md5(b"\xab\xcd\x00PNG".hex().upper().encode()).hexdigest()


def test_image_exact_dedup_keeps_min_id_per_content(spark):
    df = _pairs(
        spark,
        [
            ("b", b"\x01\x02", 1, 1, "x"),
            ("a", b"\x01\x02", 1, 1, "y"),  # same bytes, lower id wins
            ("c", b"\x01\x03", 1, 1, "z"),
            ("d", b"", 1, 1, "w"),
            ("e", b"", 1, 1, "v"),
        ],
    )
    kept = sorted(r.image_id for r in image_exact_dedup(df).collect())
    assert kept == ["a", "c", "d"]


def test_caption_dedup_groups_normalized_forms(spark):
    df = _pairs(
        spark,
        [
            ("1", b"1", 1, 1, "Product  Photo!"),
            ("2", b"2", 1, 1, "product photo"),  # normalizes equal to "1"
            ("3", b"3", 1, 1, "a red bicycle"),
        ],
    )
    kept = sorted(r.image_id for r in caption_dedup(df).collect())
    assert kept == ["1", "3"]


BUCKETS = [(512, 1024), (1024, 1024), (1024, 512)]


def test_aspect_bucket_nearest_assignment_and_full_batches(spark):
    # 30 portrait-ish + 5 square images; batch_size 4, one shard so the
    # partial-batch drop is exactly computable
    rows = [(f"p{i:02d}", b"", 300, 600, "") for i in range(30)]
    rows += [(f"s{i}", b"", 500, 500, "") for i in range(5)]
    out = aspect_bucket_batches(
        _pairs(spark, rows),
        buckets=BUCKETS,
        batch_size=4,
        n_shards=1,
    ).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault((r.bucket_w, r.bucket_h), []).append(r)
    # portrait 0.5 aspect -> (512,1024); square -> (1024,1024)
    assert set(by_bucket) == {(512, 1024), (1024, 1024)}
    # 30 portraits -> 7 full batches of 4 = 28 rows kept; 5 squares -> 4
    assert len(by_bucket[(512, 1024)]) == 28
    assert len(by_bucket[(1024, 1024)]) == 4
    for rows_ in by_bucket.values():
        sizes = {}
        for r in rows_:
            sizes[r.batch_index] = sizes.get(r.batch_index, 0) + 1
        assert set(sizes.values()) == {4}


def test_aspect_bucket_deterministic_across_partitionings(spark):
    rows = [(f"i{i:03d}", b"", 100 + i, 200, "") for i in range(50)]
    a = aspect_bucket_batches(
        _pairs(spark, rows).repartition(1), buckets=BUCKETS, batch_size=4,
        n_shards=8,
    )
    b = aspect_bucket_batches(
        _pairs(spark, rows).repartition(16), buckets=BUCKETS, batch_size=4,
        n_shards=8,
    )
    key = lambda r: (r.image_id, r.bucket_w, r.bucket_h, r.shard, r.batch_index)
    assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))


def test_aspect_bucket_tie_breaks_to_lowest_index(spark):
    # aspect exactly between buckets 0 (0.5) and 1 (1.0): 0.75 is
    # equidistant -> lowest bucket index wins on both engines
    out = aspect_bucket_batches(
        _pairs(spark, [("t", b"", 3, 4, "")]),
        buckets=BUCKETS,
        batch_size=1,
        n_shards=1,
    ).first()
    assert (out.bucket_w, out.bucket_h) == (512, 1024)


def test_aspect_bucket_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        aspect_bucket_batches(_pairs(spark, []), batch_size=0)


def test_phash_topk_matches_brute_force(spark):
    rows = [("i%d" % i, i * 2654435761 % (1 << 60)) for i in range(200)]
    df = spark.createDataFrame(rows, "image_id string, phash long")
    q = 123456789
    got = [(r.image_id, r.hamming) for r in phash_topk(df, q, k=5).collect()]
    ref = sorted(
        ((i, bin(p ^ q).count("1")) for i, p in rows),
        key=lambda t: (t[1], t[0]),
    )[:5]
    assert got == ref


def test_phash_topk_plan_is_take_ordered(spark):
    df = spark.createDataFrame(
        [("a", 1)], "image_id string, phash long"
    )
    plan = phash_topk(df, 7, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
