"""WebDataset shard sink (sinks/webdataset.py): deterministic tars,
round-trip fidelity, idempotent commit."""

from __future__ import annotations

import hashlib
import tarfile

import pyspark.sql.functions as F
import pytest

from dotnetspider_spark.sinks.webdataset import (
    assign_shards,
    read_webdataset,
    write_webdataset,
)


def _pairs(spark, n=40):
    return spark.range(n).select(
        F.col("id").alias("image_id"),
        F.encode(F.concat(F.lit("payload-"), F.col("id").cast("string")), "utf-8").alias(
            "bytes"
        ),
        F.when(F.col("id") % 2 == 0, "png").otherwise("jpeg").alias("fmt"),
        F.concat(F.lit("caption for "), F.col("id").cast("string")).alias("caption"),
    )


def test_assign_shards_deterministic_and_complete(spark):
    p = _pairs(spark)
    a1 = {(r.image_id, r.shard, r.member_key) for r in assign_shards(p, 4).collect()}
    a2 = {
        (r.image_id, r.shard, r.member_key)
        for r in assign_shards(p.repartition(7), 4).collect()
    }
    assert a1 == a2  # partitioning-independent
    assert len(a1) == 40
    shards = {s for _, s, _ in a1}
    assert shards <= set(range(4))
    # member keys dense + unique within shard
    for s in shards:
        keys = sorted(k for _, sh, k in a1 if sh == s)
        assert keys == [f"{i:09d}" for i in range(len(keys))]
    with pytest.raises(ValueError):
        assign_shards(p, 0)


def test_write_read_roundtrip_and_byte_determinism(spark, tmp_path):
    p = _pairs(spark)
    out1 = str(tmp_path / "w1")
    out2 = str(tmp_path / "w2")
    m1 = {r.shard: (r.n_samples, r.n_bytes) for r in write_webdataset(p, out1, 3).collect()}
    write_webdataset(p, out2, 3)
    assert sum(n for n, _ in m1.values()) == 40
    # identical bytes across independent writes (pinned tar metadata)
    for s in m1:
        d1 = hashlib.md5(open(f"{out1}/shard-{s:06d}.tar", "rb").read()).hexdigest()
        d2 = hashlib.md5(open(f"{out2}/shard-{s:06d}.tar", "rb").read()).hexdigest()
        assert d1 == d2
    # members come in wds pair order: key.fmt then key.txt, keys ascending
    with tarfile.open(f"{out1}/shard-{min(m1):06d}.tar") as tar:
        names = tar.getnames()
    assert len(names) % 2 == 0
    for i in range(0, len(names), 2):
        k1, e1 = names[i].rsplit(".", 1)
        k2, e2 = names[i + 1].rsplit(".", 1)
        assert k1 == k2 and e2 == "txt" and e1 in ("png", "jpeg")
    assert [n.rsplit(".", 1)[0] for n in names[::2]] == sorted(
        n.rsplit(".", 1)[0] for n in names[::2]
    )
    # round-trip: every payload + caption survives
    back = read_webdataset(spark, out1)
    rows = back.collect()
    assert len(rows) == 40
    caps = {bytes(r.bytes).decode(): r.caption for r in rows}
    for i in range(40):
        assert caps[f"payload-{i}"] == f"caption for {i}"
    # no tmp litter after commit
    import os

    assert not [f for f in os.listdir(out1) if f.startswith("_tmp-")]


def test_manifest_matches_tar_contents(spark, tmp_path):
    p = _pairs(spark, n=17)
    out = str(tmp_path / "m")
    man = write_webdataset(p, out, 2).collect()
    for r in man:
        with tarfile.open(r.tar_path) as tar:
            members = tar.getmembers()
        assert len(members) == 2 * r.n_samples
        assert sum(m.size for m in members) == r.n_bytes


def test_balanced_shards_byte_balance_beats_hash_tail(spark):
    from dotnetspider_spark.sinks.webdataset import balanced_shards

    # heavy-tailed sizes: a few huge members, many small
    rows = [(i, 10_000_000 if i < 6 else 1000 + i) for i in range(600)]
    df = spark.createDataFrame(rows, "image_id long, n_bytes long")
    out = balanced_shards(df, n_shards=4, strata=8)
    totals = {
        r.shard: r.total
        for r in out.groupBy("shard").agg(
            F.sum("n_bytes").alias("total")
        ).collect()
    }
    assert set(totals) == {0, 1, 2, 3}
    # per-stratum LPT bound: max-min across shards stays within
    # strata x largest member; with 8 strata and 10MB max this run
    # lands far tighter — assert the practical bound
    assert max(totals.values()) - min(totals.values()) <= 2 * 10_000_000
    # every row assigned exactly once
    assert out.count() == 600


def test_balanced_shards_deterministic_across_partitionings(spark):
    from dotnetspider_spark.sinks.webdataset import balanced_shards

    rows = [(i, 1000 + (i * 131) % 9000) for i in range(200)]
    df1 = spark.createDataFrame(rows, "image_id long, n_bytes long")
    df8 = df1.repartition(8)
    a = {r.image_id: r.shard for r in balanced_shards(df1, 4).collect()}
    b = {r.image_id: r.shard for r in balanced_shards(df8, 4).collect()}
    assert a == b


def test_write_webdataset_honors_precomputed_shard_col(spark, tmp_path):
    from dotnetspider_spark.sinks.webdataset import (
        balanced_shards,
        read_webdataset,
        write_webdataset,
    )

    p = _pairs(spark, n=24).withColumn(
        "n_bytes", F.length("bytes").cast("long")
    )
    bal = balanced_shards(p, n_shards=3, strata=4)
    want = {r.image_id: r.shard for r in bal.collect()}
    out = str(tmp_path / "wds_bal")
    manifest = write_webdataset(
        bal, out, n_shards=3, shard_col="shard"
    )
    assert {r.shard for r in manifest.collect()} == set(want.values())
    back = read_webdataset(spark, out)
    got = {
        int(r.caption.rsplit(" ", 1)[1]): r.shard
        for r in back.select("caption", "shard").collect()
    }
    # every member landed in the tar of ITS balanced shard
    assert got == {int(k): v for k, v in want.items()}


def test_write_webdataset_rejects_uri_paths(spark):
    from dotnetspider_spark.sinks.webdataset import write_webdataset

    with pytest.raises(ValueError, match="local-file"):
        write_webdataset(_pairs(spark, 4), "s3://bucket/wds", n_shards=2)
