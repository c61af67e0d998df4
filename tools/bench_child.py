"""One scaling-bench level: a full crawl iteration at local[$BENCH_CPUS].

Launched by ``tools/bench_scaling.py`` via the north rule's literal
mechanism — ``spark-submit --master local[N] --py-files
dist/dotnetspider_spark.zip tools/bench_child.py`` — so the engine code
reaches the executors the same way it would reach a real cluster: as a
submitted archive, not an ambient checkout. (A ``sys.path`` fallback
keeps ``python tools/bench_child.py`` runnable for debugging.)

The measured job is one FULL crawl iteration in the engine's real shape
(crawler/loop.py): politeness-ranked batch selection over a Zipf-skewed
frontier -> fetch (bucket-local join against a stored page corpus with
real HTML) -> fused link-parse/canonicalize pandas UDF -> child identity
-> child dedup (min_by) -> anti-join vs the iteration's seen delta.
Emits one JSON line on stdout.
"""

import json
import os
import sys
import time

try:
    import dotnetspider_spark  # noqa: F401  (from --py-files zip)
except ImportError:  # direct `python tools/bench_child.py` debugging
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dotnetspider_spark.session import get_spark
from dotnetspider_spark.functions.identity import request_identity
from dotnetspider_spark.functions.urlops import is_fetchable
from dotnetspider_spark.crawler.parse import extract_canonical_links_udf
from dotnetspider_spark.operators.frontier import dedup_push, select_fetch_batch

cpus = int(os.environ["BENCH_CPUS"])
rows = int(os.environ["BENCH_ROWS"])
reps = int(os.environ["BENCH_REPS"])
parts = int(os.environ["BENCH_PARTS"])
os.makedirs("/dev/shm/spark-bench-tmp", exist_ok=True)
spark = get_spark(
    f"scaling-{cpus}",
    master=f"local[{cpus}]",
    shuffle_partitions=parts,
    extra={
        "spark.local.dir": "/dev/shm/spark-bench-tmp",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        # AQE off for the bench: partitioning and skew are explicit here
        # (fixed partitions + salted rank), so AQE's per-stage driver-side
        # replanning is pure serial cost — measured at ~9s on the fetch
        # join at 16 cores with zero plan improvement
        "spark.sql.adaptive.enabled": "false",
    },
)


def frontier_df():
    return (
        spark.range(rows, numPartitions=parts)
        .withColumn("u", F.pmod(F.xxhash64("id"), F.lit(1 << 20)) / F.lit(float(1 << 20)))
        .withColumn("hostnum", F.floor(F.pow(F.lit(2.0), F.col("u") * 14)).cast("long"))
        .withColumn("host", F.concat(F.lit("host"), F.col("hostnum"), F.lit(".example")))
        .withColumn("url", F.concat(F.lit("http://"), F.col("host"), F.lit("/p/"), F.col("id")))
        .withColumn("seq", F.col("id"))
        .withColumn("depth", F.lit(1))
        .withColumn("retried", F.lit(0))
        .drop("u", "hostnum")
    )


def corpus_df():
    # REPRESENTATIVE page shape: ~2 KB of text + 24 anchors. Real crawl
    # pages are KB-scale with dozens of links; a 200-byte/5-link toy page
    # makes the job shuffle-fixed-cost-bound and measures Spark overheads
    # instead of the engine (observed: the toy shape reports 0.6x
    # "efficiency" purely because 6-second walls are scheduler-dominated).
    anchor = lambda seed: F.concat(
        F.lit('<a href="/p/'), F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(rows)),
        F.lit('.html">l</a>')
    )
    filler = F.repeat(F.lit("lorem ipsum dolor sit amet consectetur "), 12)
    anchors = []
    for seed in range(1, 25):
        anchors.append(anchor(seed))
        if seed % 6 == 0:
            anchors.append(filler)
    return (
        spark.range(rows, numPartitions=parts)
        .withColumn("u", F.pmod(F.xxhash64("id"), F.lit(1 << 20)) / F.lit(float(1 << 20)))
        .withColumn("hostnum", F.floor(F.pow(F.lit(2.0), F.col("u") * 14)).cast("long"))
        .withColumn("url", F.concat(F.lit("http://host"), F.col("hostnum"), F.lit(".example/p/"), F.col("id")))
        .withColumn(
            "html",
            F.concat(
                F.lit("<html><body>"),
                *anchors,
                F.lit('<a href="#frag">j</a><a href="javascript:void(0)">k</a>'),
                F.lit('<img src="/img/x.png"/><p class="cap">caption '),
                F.col("id"), F.lit("</p></body></html>"),
            ),
        )
        .select("url", "html")
    )


# setup (untimed): the corpus is a STORED, url-bucketed + sorted table —
# exactly the engine's 100 TB design for every big table it joins (the
# bucketed seen set, the Iceberg page store). The fetch join then reads
# the page side IN PLACE (zero corpus-side exchange, no sort) and
# shuffles only the narrow batch — shipping the KB-scale html rows
# through an exchange per iteration is precisely what the engine's
# bucketed-table layout exists to avoid. Synthesizing the table is
# setup, not crawl work: production pages arrive fetched+stored once.
spark.sql("DROP TABLE IF EXISTS bench_corpus")
(
    corpus_df().write.mode("overwrite")
    .bucketBy(parts, "url").sortBy("url")
    .option("path", "/dev/shm/spark-bench-tmp/corpus_tbl")
    .saveAsTable("bench_corpus")
)


def job():
    frontier = frontier_df()
    # 1. politeness-ranked fetch batch (the frontier enters an iteration
    #    already deduped — dedup applies to DISCOVERED children below)
    batch = select_fetch_batch(frontier, dfs=True, per_host_limit=256)
    # 2. fetch: join against the bucketed page store — batch side
    #    shuffles (narrow cols), corpus side reads its buckets in place
    fetched = batch.select("url", "depth").join(
        spark.table("bench_corpus").hint("merge"), "url", "inner"
    ).select("url", "depth", "html")
    # 3. fused parse/canonicalize/in-page-dedup -> children
    children = fetched.select(
        F.col("depth"),
        F.posexplode(
            extract_canonical_links_udf(F.col("html"), F.col("url"))
        ).alias("pos", "curl2"),
    ).filter(is_fetchable(F.col("curl2"))).select(
        F.col("curl2").alias("url"),
        (F.col("depth") + 1).alias("depth"),
        (F.xxhash64("curl2")).alias("seq"),
    ).withColumn("identity", request_identity(F.col("url")))
    # 4. child dedup + anti-join vs the iteration's seen delta (broadcast
    #    — the full 10^10 seen set is handled by the bloom prune path)
    seen_delta = spark.range(0, rows, 5).select(
        F.md5(F.concat_ws("|", F.lit("seen"), F.col("id"))).alias("identity")
    )
    fresh = dedup_push(children, F.broadcast(seen_delta))
    return fresh.select(F.count("*")).collect()[0][0]


job()  # warmup
walls = []
n_new = 0
for _ in range(reps):
    t0 = time.monotonic()
    n_new = job()
    walls.append(time.monotonic() - t0)
best = min(walls)
print(json.dumps({"cpus": cpus, "rows": rows, "walls": [round(w, 2) for w in walls],
                  "best_wall_s": round(best, 3), "fresh_children": n_new,
                  "urls_per_sec": round(rows / best, 1)}))
