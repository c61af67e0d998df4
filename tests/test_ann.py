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
