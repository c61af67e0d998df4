"""Streaming seed ingestion test (exactly-once reload into frontier)."""

from __future__ import annotations

import pyspark.sql.functions as F

from dotnetspider_spark.streaming.ingest import stream_seeds_into_frontier
from dotnetspider_spark.testing.datagen import SEED_SCHEMA, CorpusConfig, seed_rows


def test_stream_seeds_dedup_across_batches(spark, tmp_path):
    cfg = CorpusConfig(n_pages=100, n_hosts=4)
    seed_dir = tmp_path / "seeds"
    seed_dir.mkdir()
    # two overlapping reloads as separate files (maxFilesPerTrigger=1
    # makes them separate micro-batches)
    b1 = spark.createDataFrame(seed_rows(cfg, 10), SEED_SCHEMA)
    b2 = spark.createDataFrame(seed_rows(cfg, 15), SEED_SCHEMA)  # 10 overlap
    b1.coalesce(1).write.parquet(str(seed_dir / "f1"))
    b2.coalesce(1).write.parquet(str(seed_dir / "f2"))

    q = stream_seeds_into_frontier(
        spark,
        f"{seed_dir}/*",
        str(tmp_path / "frontier"),
        str(tmp_path / "seen"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    frontier = spark.read.parquet(str(tmp_path / "frontier"))
    seen = spark.read.parquet(str(tmp_path / "seen"))
    # overlap deduped: 15 unique urls total, each exactly once
    assert frontier.count() == 15
    assert frontier.select("url").distinct().count() == 15
    assert seen.count() == 15
