"""IVF / LSH approximate-nearest-neighbor tests: recall vs brute force."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dotnetspider_spark.operators.ann import (
    ann_search,
    assign_buckets,
    lsh_bucket,
    train_centroids,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    df.count()
    yield df
    df.unpersist()


def _brute_topk(spark, emb, k=5, n_queries=5):
    from pyspark.sql import Window

    base = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    q = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_vec_id"), F.col("v").alias("qv")
    )
    pairs = base.join(q, F.col("vec_id") != F.col("q_vec_id"))
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(F.zip_with(c, c, lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x)
    )
    scored = pairs.select(
        "q_vec_id", "vec_id", (dot / (norm(F.col("qv")) * norm(F.col("v")))).alias("cos")
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_vec_id", "vec_id")
    )


def test_centroids_and_buckets(spark, emb):
    cents = train_centroids(emb, k=8, iterations=2)
    assert len(cents) == 8
    dim = len(emb.select("embedding").first().embedding)
    assert all(len(c) == dim for c in cents)
    b = assign_buckets(emb, cents)
    counts = b.groupBy("bucket").count().collect()
    assert all(0 <= r.bucket < 8 for r in counts)
    assert len(counts) >= 2  # data spreads over multiple buckets


def test_ivf_recall_beats_random(spark, emb):
    cents = train_centroids(emb, k=8, iterations=2)
    queries = emb.filter(F.col("vec_id") < 5)
    approx = ann_search(emb, queries, cents, k=5, nprobe=3)
    truth = {(r.q_vec_id, r.vec_id) for r in _brute_topk(spark, emb, 5, 5).collect()}
    got = {(r.q_vec_id, r.vec_id) for r in approx.collect()}
    recall = len(truth & got) / len(truth)
    n_total = emb.count()
    # probing 3/8 buckets must recover far more than the 3/8 a random
    # subset would average; require >= 0.6
    assert recall >= 0.6, f"recall {recall} (n={n_total})"
    # every query answered with k results
    per_q = approx.groupBy("q_vec_id").count().collect()
    assert all(r["count"] == 5 for r in per_q)


def test_lsh_bucket_deterministic_and_balanced(spark, emb):
    a = lsh_bucket(emb, n_planes=8)
    b = lsh_bucket(emb, n_planes=8)
    ja = {(r.vec_id, r.lsh_bucket) for r in a.select("vec_id", "lsh_bucket").collect()}
    jb = {(r.vec_id, r.lsh_bucket) for r in b.select("vec_id", "lsh_bucket").collect()}
    assert ja == jb  # deterministic across invocations
    n_buckets = a.select("lsh_bucket").distinct().count()
    assert n_buckets > 4  # spreads


def test_embedding_neardup_pairs_banded_recall(spark):
    """Banded hyperplane near-dup pairs vs the exact brute force: every
    emitted pair must be a true pair (exact verify step), and recall at
    threshold 0.3 with 2-bit x 24 bands is effectively total (banding is
    deterministic under the fixed seed)."""
    import pyspark.sql.functions as F

    from dotnetspider_spark.operators.ann import embedding_neardup_pairs

    e = (
        spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .filter(F.col("vec_id") < 200)
    )
    banded = {
        (r.id_a, r.id_b)
        for r in embedding_neardup_pairs(
            e, threshold=0.3, n_planes=48, band_bits=2
        ).collect()
    }
    # exact brute force
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = e.select("vec_id", v.alias("v"))
    right = base.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    dot = lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    cos = dot(F.col("v"), F.col("vb")) / (
        F.sqrt(dot(F.col("v"), F.col("v"))) * F.sqrt(dot(F.col("vb"), F.col("vb")))
    )
    exact = {
        (r.vec_id, r.id_b)
        for r in base.join(right, F.col("vec_id") < F.col("id_b"))
        .filter(F.round(cos, 6) >= 0.3)
        .collect()
    }
    assert banded <= exact  # no false positives survive the verify
    assert len(banded) / len(exact) >= 0.95  # near-total recall


def test_embedding_neardup_zero_norm_vectors_never_match(spark):
    """Zero-norm embeddings must not produce NaN cosines (Spark orders
    NaN above every number, so NaN >= threshold would pass)."""
    from dotnetspider_spark.operators.ann import embedding_neardup_pairs

    rows = [
        (0, [0.0] * 8),
        (1, [0.0] * 8),
        (2, [1.0] + [0.0] * 7),
        (3, [1.0] + [0.0] * 7),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r.id_a, r.id_b)
        for r in embedding_neardup_pairs(
            df, threshold=0.5, n_planes=48, band_bits=2
        ).collect()
    }
    assert (0, 1) not in got  # zero-norm pair is NOT a near-dup
    assert (2, 3) in got  # identical unit vectors are


def test_ivf_recall_on_clustered_data(spark):
    """IVF's recall contract holds when the data HAS coarse structure:
    16 deterministic Gaussian clusters, 16 centroids, nprobe=3 -> top-5
    recall >= 0.9. (The parquet testdata embeddings are near-uniform
    random, where NO coarse quantizer can reach high recall at
    nprobe/k=3/16 — the ivf test above pins >=0.6 there; this pins the
    high-recall regime.) Training runs on a 50% sample: the scale path
    trains on a fraction and only assign_buckets sees the full set."""
    import numpy as np

    rng = np.random.default_rng(42)
    centers = rng.standard_normal((16, 32)) * 5.0
    rows = [
        (i, [float(x) for x in centers[i % 16] + rng.standard_normal(32) * 0.3])
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = train_centroids(df, k=16, iterations=4, sample_fraction=0.5)
    queries = df.filter(F.col("vec_id") < 10)
    approx = {
        (r.q_vec_id, r.vec_id)
        for r in ann_search(df, queries, cents, k=5, nprobe=3).collect()
    }
    truth = {(r.q_vec_id, r.vec_id) for r in _brute_topk(spark, df, 5, 10).collect()}
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.9, f"recall {recall}"


def test_quantize_int8_roundtrip_bounds(spark):
    """SQ8 reconstruction error per component <= scale/2; cosine of
    dequantized vs original >= 0.999 on smooth vectors; all-zero
    vectors stay zero (scale=1, no divide-by-zero)."""
    import math

    from dotnetspider_spark.operators.ann import dequantize_int8, quantize_int8

    rows = [
        (0, [0.5, -1.5, 3.0, 0.25]),
        (1, [127.0, -127.0, 1.0, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),
    ]
    e = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {
        r.vec_id: (r.scale, r.codes, r.vec)
        for r in dequantize_int8(quantize_int8(e)).collect()
    }
    orig = dict(rows)
    for vid, (scale, codes, vec) in out.items():
        assert all(-127 <= c <= 127 for c in codes), codes
        for a, b in zip(orig[vid], vec):
            assert abs(a - b) <= scale / 2 + 1e-12
    # zero vector: scale 1, codes all zero
    assert out[2][0] == 1.0 and out[2][1] == [0, 0, 0, 0]
    # cosine fidelity on a non-trivial vector
    a, b = orig[0], out[0][2]
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a)); nb = math.sqrt(sum(x * x for x in b))
    assert dot / (na * nb) > 0.999


def test_pair_cosine_screen_exact_and_fail_closed(spark):
    from dotnetspider_spark.operators.ann import pair_cosine_screen

    rows = [
        (0, [1.0, 0.0], [1.0, 0.0]),    # cos 1
        (1, [1.0, 0.0], [0.0, 1.0]),    # cos 0
        (2, [1.0, 1.0], [1.0, -1.0]),   # cos 0
        (3, [0.0, 0.0], [1.0, 0.0]),    # zero-norm -> 0.0, NOT NaN
        (4, [3.0, 4.0], [3.0, 4.0]),    # cos 1 regardless of norm
    ]
    df = spark.createDataFrame(
        rows, "pair_id long, img array<double>, txt array<double>"
    )
    got = {
        r.pair_id: (r.cos, r.keep)
        for r in pair_cosine_screen(df, "img", "txt", min_cos=0.5).collect()
    }
    assert got[0] == (1.0, True)
    assert got[1] == (0.0, False)
    assert got[2] == (0.0, False)
    assert got[3] == (0.0, False)
    assert got[4] == (1.0, True)


def test_pair_cosine_screen_drops_vector_columns(spark):
    from dotnetspider_spark.operators.ann import pair_cosine_screen

    df = spark.createDataFrame(
        [(0, "m", [1.0], [1.0])],
        "pair_id long, meta string, img array<double>, txt array<double>",
    )
    out = pair_cosine_screen(df, "img", "txt")
    assert out.columns == ["pair_id", "meta", "cos", "keep"]


def test_linear_head_score_raises_on_dim_mismatch(spark):
    import pytest

    from dotnetspider_spark.operators.ann import linear_head_score

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="dim"):
        linear_head_score(df, [0.1, 0.2]).collect()


def test_linear_head_score_null_embedding_yields_null(spark):
    from dotnetspider_spark.operators.ann import linear_head_score

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None)], "vec_id long, embedding array<float>"
    )
    got = {
        r["vec_id"]: r["head_score"]
        for r in linear_head_score(df, [1.0, 1.0]).collect()
    }
    assert abs(got[1] - 3.0) < 1e-9 and got[2] is None
