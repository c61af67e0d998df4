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
    """One full crawl iteration in the engine's real shape (the same job
    tools/bench_scaling.py measures at two levels): politeness-ranked
    batch over a Zipf frontier -> fetch join against a synthetic corpus
    with real HTML -> fused parse/canonicalize pandas UDF -> child
    identity -> child dedup + anti-join vs the iteration's seen delta.
    Everything generated executor-side from spark.range.
    """
    from pyspark.sql import functions as F

    from dotnetspider_spark.testing.benchjob import (
        crawl_iteration,
        store_bucketed_corpus,
        zipf_frontier,
        zipf_hostnum,
    )

    n = FRONTIER_ROWS
    parts = 64

    frontier = zipf_frontier(spark, n, parts)
    anchor = lambda s: F.concat(
        F.lit('<a href="/p/'), F.pmod(F.xxhash64("id", F.lit(s)), F.lit(n)),
        F.lit('.html">l</a>'),
    )
    # SMALL pages (4 anchors) so the driver can run this every round;
    # the scaling harness (tools/bench_child.py) uses the representative
    # ~2 KB / 24-anchor shape. The iteration PIPELINE is the single
    # shared definition in testing/benchjob.py for both.
    corpus = (
        spark.range(n, numPartitions=parts)
        .withColumn("hostnum", zipf_hostnum())
        .withColumn("url", F.concat(F.lit("http://host"), F.col("hostnum"), F.lit(".example/p/"), F.col("id")))
        .withColumn(
            "html",
            F.concat(
                F.lit("<html><body>"), anchor(1), anchor(2), anchor(3), anchor(4),
                F.lit('<a href="#f">j</a><img src="/i/x.png"/><p class="cap">c '),
                F.col("id"), F.lit("</p></body></html>"),
            ),
        )
        .select("url", "html")
    )
    import tempfile

    store_bucketed_corpus(
        spark, corpus, parts, tempfile.mkdtemp(prefix="bench-corpus-")
    )

    def run_once() -> int:
        return crawl_iteration(spark, frontier, n)

    # warmup pass excluded from the wall, same methodology as
    # tools/bench_scaling.py: the first execution of this pipeline in a
    # JVM pays one-time whole-stage-codegen compilation and python-worker
    # fork costs (~5-7 s measured) that a long-running crawl pays once
    # per JOB LIFETIME, not per iteration — timing them into a
    # per-iteration number misstates steady-state throughput.
    run_once()
    t0 = time.monotonic()
    scheduled = run_once()
    dt = time.monotonic() - t0
    return dt, scheduled


def bench_frontier_convergence(spark) -> list[dict]:
    """Three chained crawl iterations (round-4 verdict task 4): children
    of iteration i become iteration i+1's frontier, the seen set grows
    with true request identities, and every iteration's wall INCLUDES
    its parquet checkpoint writes + the next frontier's read-back — the
    costs the single-iteration headline deliberately amortizes away.
    Corpus anchors resolve to real corpus rows (resolvable_corpus), so
    later iterations fetch genuinely new pages."""
    import tempfile

    from dotnetspider_spark.testing.benchjob import (
        crawl_convergence,
        resolvable_corpus,
        store_bucketed_corpus,
    )

    n = FRONTIER_ROWS
    parts = 64
    store_bucketed_corpus(
        spark,
        resolvable_corpus(spark, n, parts),
        parts,
        tempfile.mkdtemp(prefix="bench-corpus-conv-"),
        table="bench_corpus_conv",
    )
    return crawl_convergence(
        spark, n, parts, tempfile.mkdtemp(prefix="bench-ckpt-"),
        table="bench_corpus_conv", iters=3,
    )


def main() -> None:
    import __spark_entry__ as entrymod
    from dotnetspider_spark.session import get_spark, sf_dir

    sf = sf_dir()
    spark = get_spark("bench")
    qs = entrymod.queries()

    # JVM/classloader/codegen warmup (same methodology as
    # tools/bench_scaling.py): exercise a scan, a shuffle, and the noop
    # sink once so the first battery query doesn't pay one-time costs
    from pyspark.sql import functions as F

    (
        spark.read.parquet(f"{sf}/region.parquet")
        .groupBy("r_regionkey").agg(F.count("*"))
        .write.format("noop").mode("overwrite").save()
    )

    per_query: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        # best of 2 executions: on a shared-CPU box a single timing can
        # catch a co-tenant burst and record noise as a regression; the
        # min of two is a far tighter estimator of the engine's cost
        # (same rationale as tools/bench_scaling.py's best-of-reps)
        best = None
        for _ in range(2):
            df = fn(spark, sf)
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        per_query[name] = round(best, 3)
        total += best

    f_dt, f_scheduled = bench_frontier_iteration(spark)
    per_query["frontier_iteration"] = round(f_dt, 3)
    total += f_dt

    # separate metric row, NOT folded into "value": the headline wall
    # stays on the round-over-round comparable basis (battery + one
    # frontier iteration); the convergence number is its own record
    conv = bench_frontier_convergence(spark)
    conv_wall = round(sum(it["wall_s"] for it in conv), 3)

    out = {
        "metric": "headline_batch_plus_frontier_iteration_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
        "frontier_rows": FRONTIER_ROWS,
        "frontier_scheduled": f_scheduled,
        "frontier_urls_per_sec": round(FRONTIER_ROWS / f_dt, 1),
        "convergence_3iter_wall_sec": conv_wall,
        "convergence_iters": conv,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
