"""Structured Streaming seed ingestion — the continuous-reload path.

The reference's distributed mode feeds seeds continuously into the
frontier (Redis ``Reload`` batches of 1000, RedisScheduler.cs:230-285;
DB-paged lazy frontier, PagingQueueDuplicateRemovedScheduler.cs:56-155).
The crawl engine itself stays deliberately iterative-batch (SURVEY §7.1:
reproducible ordering + a 10^10-key seen set rule out streaming state
stores), but seed ARRIVAL is a genuine stream: new seed files land in a
directory and must flow into the frontier with exactly-once semantics.

``stream_seeds_into_frontier`` runs a ``readStream`` file source over a
seed directory and, per micro-batch, dedup-pushes the new seeds into the
frontier/seen snapshot tables via ``foreachBatch`` — the same
``dedup_push`` operator the batch loop uses, so a seed that raced in
twice (or was already crawled) is dropped exactly like a re-``Push``.
Checkpointing is Spark's own streaming checkpoint (source offsets) plus
the engine's snapshot tables, so a restart resumes both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dotnetspider_spark.crawler.loop import seeds_to_frontier
from dotnetspider_spark.operators.frontier import dedup_push
from dotnetspider_spark.testing.datagen import SEED_SCHEMA


def stream_seeds(spark: SparkSession, seed_dir: str) -> DataFrame:
    """File-source stream of seed rows (one parquet file = one reload)."""
    return (
        spark.readStream.schema(SEED_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(seed_dir)
    )


def stream_seeds_into_frontier(
    spark: SparkSession,
    seed_dir: str,
    frontier_path: str,
    seen_path: str,
    checkpoint_dir: str,
):
    """Start the ingestion query; returns the StreamingQuery.

    Each micro-batch: normalize seeds -> identity -> anti-join the
    accumulated ``seen`` table -> append survivors to both ``frontier``
    and ``seen`` parquet tables (the batch loop's input state).
    """

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark_b = batch_df.sparkSession
        fresh = seeds_to_frontier(batch_df)
        try:
            seen = spark_b.read.parquet(seen_path).select("identity")
        except Exception:  # first batch: no seen table yet
            seen = None
        fresh = dedup_push(fresh, seen) if seen is not None else fresh
        fresh.write.mode("append").parquet(frontier_path)
        fresh.select("identity").write.mode("append").parquet(seen_path)

    return (
        stream_seeds(spark, seed_dir)
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
