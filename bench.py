"""Benchmark harness — driver contract.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line ``{"metric", "value", "unit": "sec", "queries": {...}, "sf"}``.

Also measures the engine's actual north-star number: frontier URLs
scheduled per second over a synthetic frontier generated with
``spark.range`` (no driver-side data, no external input) — one full
scheduling iteration = politeness-ranked fetch-batch selection + identity
+ within-batch dedup + anti-join vs a seen set. That number is reported
under ``frontier_urls_per_sec``. Scaling-efficiency runs (local[8] vs
local[32]) live in ``tools/bench_scaling.py``; this file stays cheap
enough for the driver to run every round.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# headline subset: shuffle-heavy + window + vector ops + doc pipeline
HEADLINE = [
    "dedup_anti_join",
    "rank_dfs_lifo",
    "politeness_topk",
    "skew_salted_agg",
    "metrics_agg",
    "broadcast_join_dims",
    "upsert_last_wins",
    "docs_exact_dedup",
    "docs_minhash_signature",
    "ann_cosine_topk",
]

FRONTIER_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_FRONTIER", "2000000"))


def bench_frontier_iteration(spark) -> tuple[float, int]:
    """One full scheduling iteration over a synthetic Zipf-skewed frontier.

    Everything is generated executor-side from spark.range — the driver
    never materializes a row. Measures: candidate identity (md5, JVM),
    within-batch first-push dedup, anti-join vs seen, politeness-ranked
    per-host fetch batch (salted two-level rank).
    """
    from pyspark.sql import functions as F

    from dotnetspider_spark.functions.identity import request_identity
    from dotnetspider_spark.operators.frontier import dedup_push, select_fetch_batch

    n = FRONTIER_ROWS
    # Zipf-ish host skew: host = floor(2^(16 * u)) gives a heavy head
    base = (
        spark.range(n)
        .withColumn("u", F.pmod(F.xxhash64("id"), F.lit(1 << 20)) / F.lit(float(1 << 20)))
        .withColumn("hostnum", F.floor(F.pow(F.lit(2.0), F.col("u") * 14)).cast("long"))
        .withColumn("host", F.concat(F.lit("host"), F.col("hostnum"), F.lit(".example")))
        .withColumn(
            "url",
            F.concat(F.lit("http://"), F.col("host"), F.lit("/p/"), F.col("id")),
        )
        .withColumn("seq", F.col("id"))
        .withColumn("depth", F.lit(1))
        .withColumn("retried", F.lit(0))
        .drop("u", "hostnum")
    )
    candidates = base.withColumn(
        "identity", request_identity(F.col("url"), retried=F.col("retried"))
    )
    seen = (
        spark.range(0, n, 5)
        .withColumn("host", F.concat(F.lit("hostX"), F.col("id")))
        .withColumn(
            "identity", F.md5(F.concat_ws("|", F.lit("seenmarker"), F.col("id")))
        )
        .select("identity")
    )
    t0 = time.monotonic()
    fresh = dedup_push(candidates, seen)
    batch = select_fetch_batch(fresh, dfs=True, per_host_limit=64)
    scheduled = batch.count()
    dt = time.monotonic() - t0
    return dt, scheduled


def main() -> None:
    import __spark_entry__ as entrymod
    from dotnetspider_spark.session import get_spark, sf_dir

    sf = sf_dir()
    spark = get_spark("bench")
    qs = entrymod.queries()

    per_query: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        df = fn(spark, sf)
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        per_query[name] = round(dt, 3)
        total += dt

    f_dt, f_scheduled = bench_frontier_iteration(spark)
    per_query["frontier_iteration"] = round(f_dt, 3)
    total += f_dt

    out = {
        "metric": "headline_batch_plus_frontier_iteration_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
        "frontier_rows": FRONTIER_ROWS,
        "frontier_scheduled": f_scheduled,
        "frontier_urls_per_sec": round(FRONTIER_ROWS / f_dt, 1),
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
