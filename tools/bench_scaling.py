"""Scaling-efficiency evidence run (north rule / BASELINE.json).

The rule's two-cluster-size criterion — "spark-submit on N and 4N
executors with throughput scaling efficiency >= 0.8" — cannot use a real
cluster in this sandbox; per the driver instruction it is evidenced by
running the SAME frontier-scheduling job at two parallelism levels
(local[8] vs local[32]) on the SAME input and reporting throughput at
both plus efficiency = (thr_32 / thr_8) / 4.

Each level runs in a fresh subprocess (own JVM) so neither run inherits
the other's warmed code cache. Within a process we do one warmup pass
(JIT + codegen warm) and then time R repetitions of the job proper —
session startup is excluded, matching how cluster throughput would be
measured (job wall, not cluster spin-up).

The measured job is one full frontier scheduling iteration over a
Zipf-skewed synthetic frontier generated executor-side (no input files,
no driver data): md5 identity -> within-batch first-push dedup ->
anti-join vs seen -> salted per-host politeness rank (the engine's
actual per-iteration work, minus the corpus fetch join).

Usage: python tools/bench_scaling.py [rows]  -> writes BENCH.md + prints JSON
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
REPS = 3

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from dotnetspider_spark.session import get_spark
from pyspark.sql import functions as F
from dotnetspider_spark.functions.identity import request_identity
from dotnetspider_spark.operators.frontier import dedup_push, select_fetch_batch

cpus = int(os.environ["BENCH_CPUS"])
rows = int(os.environ["BENCH_ROWS"])
reps = int(os.environ["BENCH_REPS"])
os.makedirs("/dev/shm/spark-bench-tmp", exist_ok=True)
spark = get_spark(
    f"scaling-{cpus}", master=f"local[{cpus}]",
    shuffle_partitions=max(cpus * 2, 8),
    extra={
        # heap must not bottleneck 32 threads, and shuffle files go to
        # tmpfs so both levels measure compute, not one shared disk
        "spark.driver.memory": "48g",
        "spark.local.dir": "/dev/shm/spark-bench-tmp",
    },
)

def job():
    base = (
        spark.range(rows, numPartitions=max(cpus * 2, 8))
        .withColumn("u", F.pmod(F.xxhash64("id"), F.lit(1 << 20)) / F.lit(float(1 << 20)))
        .withColumn("hostnum", F.floor(F.pow(F.lit(2.0), F.col("u") * 14)).cast("long"))
        .withColumn("host", F.concat(F.lit("host"), F.col("hostnum"), F.lit(".example")))
        .withColumn("url", F.concat(F.lit("http://"), F.col("host"), F.lit("/p/"), F.col("id")))
        .withColumn("seq", F.col("id"))
        .withColumn("depth", F.lit(1))
        .withColumn("retried", F.lit(0))
        .drop("u", "hostnum")
    )
    cand = base.withColumn(
        "identity", request_identity(F.col("url"), retried=F.col("retried"))
    )
    seen = spark.range(0, rows, 5).select(
        F.md5(F.concat_ws("|", F.lit("seen"), F.col("id"))).alias("identity")
    )
    fresh = dedup_push(cand, seen)
    batch = select_fetch_batch(fresh, dfs=True, per_host_limit=64)
    return batch.count()

job()  # warmup: JIT, codegen, shuffle services
walls = []
for _ in range(reps):
    t0 = time.monotonic()
    n = job()
    walls.append(time.monotonic() - t0)
best = min(walls)
print(json.dumps({"cpus": cpus, "rows": rows, "walls": walls,
                  "best_wall_s": best, "scheduled": n,
                  "urls_per_sec": rows / best}))
"""


def run_level(cpus: int) -> dict:
    env = dict(
        os.environ,
        BENCH_CPUS=str(cpus),
        BENCH_ROWS=str(ROWS),
        BENCH_REPS=str(REPS),
    )
    out = subprocess.run(
        [sys.executable, "-c", _CHILD], env=env, capture_output=True, text=True,
        timeout=1800,
    )
    if out.returncode != 0:
        raise RuntimeError(f"child local[{cpus}] failed:\n{out.stderr[-3000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    t0 = time.time()
    r8 = run_level(8)
    r32 = run_level(32)
    speedup = r32["urls_per_sec"] / r8["urls_per_sec"]
    eff = speedup / 4.0
    result = {
        "rows": ROWS,
        "reps": REPS,
        "local8": r8,
        "local32": r32,
        "speedup_8_to_32": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "meets_north_rule_0.8": eff >= 0.8,
        "total_wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(result))
    with open(os.path.join(os.path.dirname(__file__), "..", "BENCH.md"), "w") as f:
        f.write(
            "# BENCH — scaling-efficiency evidence (north rule)\n\n"
            "Same frontier-scheduling job, same synthetic input, two\n"
            "parallelism levels (sandbox stand-in for N vs 4N executors;\n"
            "fresh JVM per level, warmup excluded, best of "
            f"{REPS} reps):\n\n"
            f"| level | rows | best wall (s) | URLs/s |\n|---|---|---|---|\n"
            f"| local[8] | {ROWS} | {r8['best_wall_s']:.2f} | {r8['urls_per_sec']:.0f} |\n"
            f"| local[32] | {ROWS} | {r32['best_wall_s']:.2f} | {r32['urls_per_sec']:.0f} |\n\n"
            f"**Speedup 8→32: {speedup:.2f}× — scaling efficiency "
            f"{eff:.2f}** (north-rule bar: ≥0.8)\n\n"
            "Job: md5 request-identity → within-batch first-push dedup →\n"
            "anti-join vs seen set → salted per-host politeness rank\n"
            "(engine iteration minus corpus join; all shuffles keyed on\n"
            "identity/host, no payload columns touched).\n\n"
            f"Raw: `{json.dumps(result)}`\n"
        )


if __name__ == "__main__":
    main()
