"""One scaling-bench level: a full crawl iteration at local[$BENCH_CPUS].

Launched by ``tools/bench_scaling.py`` via the north rule's literal
mechanism — ``spark-submit --master local[N] --py-files
dist/dotnetspider_spark.zip tools/bench_child.py`` — so the engine code
reaches the executors the same way it would reach a real cluster: as a
submitted archive, not an ambient checkout. (A ``sys.path`` fallback
keeps ``python tools/bench_child.py`` runnable for debugging.)

The measured job is one FULL crawl iteration in the engine's real shape
— the SHARED definition in ``dotnetspider_spark.testing.benchjob``
(same pipeline ``bench.py`` times; only the page fixture differs:
representative ~2 KB / 24-anchor pages here, small pages there).
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
from dotnetspider_spark.testing.benchjob import (
    crawl_iteration,
    store_bucketed_corpus,
    zipf_frontier,
    zipf_hostnum,
)

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
        .withColumn("hostnum", zipf_hostnum())
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


# setup (untimed): stored url-bucketed+sorted corpus — the engine's
# 100 TB table layout; the fetch join reads it in place (benchjob doc)
store_bucketed_corpus(spark, corpus_df(), parts, "/dev/shm/spark-bench-tmp/corpus_tbl")

frontier = zipf_frontier(spark, rows, parts, with_depth=True)


def job() -> int:
    return crawl_iteration(spark, frontier, rows, with_depth=True)


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
