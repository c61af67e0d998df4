"""The crawl engine: an iterative-batch (BSP) frontier loop.

Replaces the reference's thread-poll loop (Spider.cs:753-831,
HandleRequest :1095-1210) with one deterministic DataFrame job per crawl
iteration (SURVEY §3.1/§7):

    frontier ──rank(politeness, DFS/BFS)──► batch
    batch ──robots gate──► allowed (denied rows are consumed, not fetched)
    allowed ──join corpus──► outcomes: success / transient / permanent
    transient ──retried+1 (NEW identity)──► retry candidates
    success ──extract links (pandas UDF) ─ canonicalize ─ filters──► children
    (children ∪ retries) ──dedup_push vs seen──► frontier(i+1) ∪ rest

State lives in two tables — ``frontier`` (live requests) and ``seen``
(identities) — checkpointed as parquet snapshots per iteration
(``ckpt/frontier/iter=N``, ``ckpt/seen/iter=N`` deltas,
``ckpt/fetched/iter=N``, ``ckpt/metrics/iter=N``) with an
atomically-renamed ``_MANIFEST.json`` recording the last complete
iteration, so a killed crawl resumes exactly (north rule: snapshot +
per-partition lineage; Iceberg in production — the sandbox ships no
Iceberg runtime jar, so the snapshot layout emulates its
manifest/snapshot model over plain parquet).

Ordering fidelity (SURVEY §7.3): every request carries a monotone
total-order key ``seq``. ``global_limit=1`` reproduces the reference's
single-threaded poll order exactly (DFS=LIFO / BFS=FIFO,
QueueDuplicateRemovedScheduler.cs:57-91); batch mode keeps per-host poll
order and set-level equality, which is all the multi-threaded reference
guarantees (QueueSchedulerTest.cs:11-32 asserts only counts when
concurrent).

Scale design (10^10-URL design point):
- scheduling never touches payload columns (the fetch join selects only
  ``status, html`` from the corpus; image bytes live in a separate
  payload table joined only by the validation stage);
- all shuffles key on ``identity`` or ``host`` (narrow columns);
- per-host ranking is salted two-level for Zipf-hot hosts
  (operators.frontier.select_fetch_batch);
- ``global_limit`` mode uses one global window — test-scale only; batch
  mode encodes child seqs from (host-hash, host_rank, link-pos) with no
  global barrier.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dotnetspider_spark.crawler.parse import extract_canonical_links_udf
from dotnetspider_spark.functions.identity import request_identity
from dotnetspider_spark.functions.urlops import is_fetchable, url_host
from dotnetspider_spark.operators.frontier import (
    dedup_push,
    politeness_budget,
    poll_order,
    select_fetch_batch,
)

FRONTIER_SCHEMA = (
    "url string, host string, method string, referer string, origin string, "
    "content string, headers map<string,string>, priority int, depth int, "
    "retried int, seq long, identity string"
)
_FRONTIER_COLS = [
    "url", "host", "method", "referer", "origin", "content", "headers",
    "priority", "depth", "retried", "seq", "identity",
]

# seq encoding: iteration in the top bits keeps seqs monotone across
# iterations; within an iteration children order by (parent block, link pos)
_ITER_SHIFT = 45  # (iter+1) << 45; block*2^20+pos stays under 2^45
_BLOCK_BITS = 24  # parent block
_POS_BITS = 20  # link position / retry marker


@dataclass
class CrawlConfig:
    dfs: bool = True  # default traverse strategy Dfs (DuplicateRemovedScheduler.cs:75)
    max_depth: int | None = None  # Spider.cs:66 default int.MaxValue
    cycle_retry_times: int = 5  # Spider.cs:186
    per_host_limit: int | None = 8  # politeness budget per iteration (SURVEY §2.2)
    iter_wall_ms: int = 1000  # iteration wall budget for delay-derived k
    global_limit: int | None = None  # exact-order emulation; 1 = reference poll
    robots_enabled: bool = True  # north-rule addition (absent in reference)
    use_bloom: bool = False  # bloom-pruned dedup (§7.4 hybrid — exact either way)
    bloom_expected_per_bucket: int = 1_000_000
    bloom_n_buckets: int = 32
    max_iterations: int = 100_000
    checkpoint_dir: str | None = None
    checkpoint_every: int = 1  # snapshot cadence (1 = every iteration)
    salt_buckets: int = 16
    max_link_pos: int = (1 << _POS_BITS) - 2
    verbose: bool = False  # print each iteration's metrics row


@dataclass
class CrawlRunResult:
    fetched: DataFrame  # fetched pages: frontier cols + iter, rank, status
    seen: DataFrame  # identity strings
    frontier: DataFrame  # remaining (empty when converged)
    metrics: list[dict] = field(default_factory=list)
    iterations: int = 0

    def fetch_order(self) -> list[str]:
        """URLs in engine poll order — (iter, batch rank) ascending."""
        return [
            r.url
            for r in self.fetched.orderBy("iter", "rank", "url").select("url").collect()
        ]


def seeds_to_frontier(seeds: DataFrame) -> DataFrame:
    """Normalize a seed DataFrame into frontier schema: derive host +
    identity, first-push-wins within the seed list (Reload semantics,
    QueueDuplicateRemovedScheduler.cs:137-155)."""
    df = seeds
    for col, default in [
        ("method", F.lit("GET")), ("referer", F.lit(None).cast("string")),
        ("origin", F.lit(None).cast("string")), ("content", F.lit(None).cast("string")),
        ("headers", F.lit(None).cast("map<string,string>")),
        ("priority", F.lit(0)), ("depth", F.lit(1)), ("retried", F.lit(0)),
    ]:
        if col not in df.columns:
            df = df.withColumn(col, default)
    if "seq" not in df.columns:
        df = df.withColumn(
            "seq", F.row_number().over(Window.orderBy("url")).cast("long") - 1
        )
    df = df.withColumn("host", url_host(F.col("url"))).withColumn(
        "identity",
        request_identity(
            F.col("url"), method=F.col("method"), referer=F.col("referer"),
            origin=F.col("origin"), content=F.col("content"),
            retried=F.col("retried"), headers=F.col("headers"),
        ),
    )
    return dedup_push(df.select(*_FRONTIER_COLS), seen=None)


def _robots_gate(batch: DataFrame, robots: DataFrame | None) -> DataFrame:
    """Drop rows any matching deny-rule forbids. Rules are tiny config
    (host, path_prefix, allow) — broadcast; most-specific longest prefix
    wins like real robots matchers; no rule = allow."""
    if robots is None:
        return batch
    path = F.coalesce(F.parse_url(F.col("url"), F.lit("PATH")), F.lit("/"))
    rules = F.broadcast(
        robots.select(
            F.col("host").alias("__rhost"),
            F.col("path_prefix").alias("__prefix"),
            F.col("allow").alias("__allow"),
        )
    )
    joined = batch.withColumn("__path", path).join(
        rules,
        (F.col("host") == F.col("__rhost"))
        & F.col("__path").startswith(F.col("__prefix")),
        "left",
    )
    best = Window.partitionBy("identity").orderBy(
        F.length(F.col("__prefix")).desc_nulls_last()
    )
    return (
        joined.withColumn("__rr", F.row_number().over(best))
        .filter(F.col("__rr") == 1)
        .filter(F.coalesce(F.col("__allow"), F.lit(True)))
        .drop("__rhost", "__prefix", "__allow", "__path", "__rr")
    )


def _discover_children(success: DataFrame, cfg: CrawlConfig, iter_base) -> DataFrame:
    """success(frontier cols + html + __block) -> child frontier rows.

    Link extraction, the junk gate (Page.cs:121-127), canonicalization
    (Selectable.cs:229-241) and the within-page first-occurrence dedup
    (TargetRequests HashSet, Page.cs:37) are FUSED into one pandas UDF
    (parse.extract_canonical_links_udf): one Python boundary crossing per
    page instead of one per raw link, and no per-page window shuffle.
    """
    canon = success.select(
        F.col("referer").alias("__p_referer"),
        F.col("origin").alias("__p_origin"),
        F.col("headers").alias("__p_headers"),
        F.col("depth").alias("__p_depth"),
        F.col("__block"),
        F.posexplode(
            extract_canonical_links_udf(F.col("html"), F.col("url"))
        ).alias("__pos", "url"),
    ).filter(is_fetchable(F.col("url")))
    child = canon.select(
        F.col("url"),
        url_host(F.col("url")).alias("host"),
        F.lit("GET").alias("method"),
        # inheritance: child keeps PARENT's referer/origin/headers
        # (Page.cs:157-181) — not the parent URL
        F.col("__p_referer").alias("referer"),
        F.col("__p_origin").alias("origin"),
        F.lit(None).cast("string").alias("content"),
        F.col("__p_headers").alias("headers"),
        F.lit(0).alias("priority"),
        (F.col("__p_depth") + 1).alias("depth"),
        F.lit(0).alias("retried"),
        (
            iter_base
            + F.col("__block") * (1 << _POS_BITS)
            + F.least(F.col("__pos") + 1, F.lit(cfg.max_link_pos))
        ).cast("long").alias("seq"),
    )
    if cfg.max_depth is not None:
        child = child.filter(F.col("depth") <= cfg.max_depth)
    return child.withColumn(
        "identity",
        request_identity(
            F.col("url"), method=F.col("method"), referer=F.col("referer"),
            origin=F.col("origin"), content=F.col("content"),
            retried=F.col("retried"), headers=F.col("headers"),
        ),
    )


def _with_block(batch: DataFrame) -> DataFrame:
    """Parent block id: scale-safe (host-hash, rank) encoding — no global
    barrier; used as the high bits of child seq numbers."""
    return batch.withColumn(
        "__block",
        F.pmod(F.xxhash64("host"), F.lit(1 << (_BLOCK_BITS - 6))) * (1 << 6)
        + F.least(F.col("rank"), F.lit(63)),
    )



class Checkpointer:
    """Manifest + metrics writer over the parquet snapshot layout.

    The crawl loop itself writes the state tables (frontier/seen/blooms/
    fetched as ``<root>/<table>/iter=N`` parquet dirs); this class adds
    the atomically-renamed ``_MANIFEST.json`` marking the last COMPLETE
    iteration (written after that iteration's state dirs, so a crash
    mid-iteration resumes from the previous consistent snapshot) and the
    per-host lineage/metrics rows (north rule: per-partition lineage).
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def save_metrics_and_manifest(self, it: int, metrics_rows: list[dict]) -> None:
        if metrics_rows:
            self.spark.createDataFrame(metrics_rows).write.mode("overwrite").parquet(
                f"{self.root}/metrics/iter={it}"
            )
        tmp = f"{self.root}/_MANIFEST.json.tmp"
        with open(tmp, "w") as f:
            json.dump({"last_iter": it, "ts": time.time()}, f)
        os.replace(tmp, f"{self.root}/_MANIFEST.json")

    def last_iter(self) -> int | None:
        try:
            with open(f"{self.root}/_MANIFEST.json") as f:
                return json.load(f)["last_iter"]
        except (FileNotFoundError, json.JSONDecodeError, KeyError):
            return None


def crawl(
    spark: SparkSession,
    corpus: DataFrame,
    seeds: DataFrame,
    cfg: CrawlConfig | None = None,
    robots: DataFrame | None = None,
    host_delays: DataFrame | None = None,
    resume: bool = False,
) -> CrawlRunResult:
    """Run the crawl to frontier exhaustion (or max_iterations).

    ``host_delays``: optional (host, crawl_delay_ms) table — per-host
    politeness budgets k=⌈iter_wall/delay⌉ (the reference's SleepTime
    made per-host, SURVEY §2.2); hosts without a row are capped only by
    ``per_host_limit``. Broadcast-joined (config-sized table).

    State model: cross-iteration state (frontier, seen deltas, blooms,
    fetched) lives in parquet snapshot tables under ``checkpoint_dir``
    (or a temp dir) — NOT in checkpointed RDDs. Spark 4's
    ``localCheckpoint`` copies the pre-checkpoint plan's statistics onto
    the truncated node (``LogicalRDD.rewriteStatsAndConstraints``), so
    size estimates compound multiplicatively across iterations until the
    driver stalls multiplying million-digit BigIntegers (observed via
    jstack; iteration walls grew ~3x per iteration). Parquet round-trips
    reset stats to file-size reality and ARE the engine's table design
    anyway (Iceberg snapshots in production). ``localCheckpoint`` is
    still used WITHIN an iteration, where plans are bounded.
    """
    import tempfile

    cfg = cfg or CrawlConfig()
    root = cfg.checkpoint_dir or tempfile.mkdtemp(prefix="spark-crawl-state-")
    ckpt = Checkpointer(spark, root)
    bloom_params = None
    blooms = None
    if cfg.use_bloom:
        from dotnetspider_spark.operators.bloom import BloomParams, build_blooms

        bloom_params = BloomParams(
            expected_per_bucket=cfg.bloom_expected_per_bucket,
            n_buckets=cfg.bloom_n_buckets,
        )
    # the scheduling path must never scan payload columns: project early
    pages = corpus.select("url", "status", "html")

    metrics: list[dict] = []
    start_iter = 0
    seen_paths: list[str]
    fetched_paths: list[str]

    if resume:
        last = ckpt.last_iter()
        if last is None:
            raise ValueError(f"no manifest under {root}")
        start_iter = last + 1
        frontier = spark.read.parquet(f"{root}/frontier/iter={last}")
        seen_paths = [f"{root}/seen/init"] + [
            f"{root}/seen/iter={j}"
            for j in range(last + 1)
            if os.path.isdir(f"{root}/seen/iter={j}")
        ]
        fetched_paths = [
            f"{root}/fetched/iter={j}"
            for j in range(last + 1)
            if os.path.isdir(f"{root}/fetched/iter={j}")
        ]
    else:
        seeds_to_frontier(seeds).write.mode("overwrite").parquet(
            f"{root}/frontier/init"
        )
        frontier = spark.read.parquet(f"{root}/frontier/init")
        frontier.select("identity").write.mode("overwrite").parquet(
            f"{root}/seen/init"
        )
        seen_paths = [f"{root}/seen/init"]
        fetched_paths = []
    seen = spark.read.parquet(*seen_paths).select("identity")

    it = start_iter
    exhausted = False
    while it < cfg.max_iterations and not exhausted:
        t0 = time.monotonic()
        n_frontier = frontier.count()
        if n_frontier == 0:
            break
        iter_base = F.lit((it + 1) << _ITER_SHIFT)

        # --- 1. poll: select this iteration's batch ------------------
        order = poll_order(cfg.dfs) + [F.col("url").asc()]
        if cfg.global_limit is not None:
            # exact reference poll order — ONE global window; test scale only
            w = Window.orderBy(*order)
            batch = (
                frontier.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= cfg.global_limit)
                .withColumn("__block", F.col("rank"))
            )
        elif host_delays is not None:
            delays = F.broadcast(host_delays.select("host", "crawl_delay_ms"))
            budget = politeness_budget(
                cfg.iter_wall_ms, F.coalesce(F.col("crawl_delay_ms"), F.lit(0))
            )
            if cfg.per_host_limit is not None:
                budget = F.least(budget, F.lit(cfg.per_host_limit))
            fr_b = frontier.join(delays, "host", "left").withColumn(
                "__budget", budget
            ).drop("crawl_delay_ms")
            batch = select_fetch_batch(
                fr_b, dfs=cfg.dfs, budget_col="__budget",
                salt_buckets=cfg.salt_buckets,
            ).withColumnRenamed("host_rank", "rank").drop("__budget")
            batch = _with_block(batch)
        else:
            batch = select_fetch_batch(
                frontier, dfs=cfg.dfs, per_host_limit=cfg.per_host_limit,
                salt_buckets=cfg.salt_buckets,
            ).withColumnRenamed("host_rank", "rank")
            batch = _with_block(batch)
        rest = frontier.join(batch.select("identity"), "identity", "left_anti")

        # --- 2. robots gate (denied rows are consumed) ---------------
        allowed = _robots_gate(batch, robots if cfg.robots_enabled else None)

        # --- 3. fetch (sandbox: corpus join; production: mapInPandas
        #        HTTP per host-partition). In-iteration checkpoint: the
        #        result is re-read by stages 4-7 --------------------------
        fetched_raw = allowed.join(pages, "url", "left").withColumn(
            "status", F.coalesce(F.col("status"), F.lit(404))
        )
        fetched_raw = fetched_raw.localCheckpoint(eager=True)

        success = fetched_raw.filter(F.col("status") == 200)
        transient = fetched_raw.filter(F.col("status") >= 500)
        retryable = transient.filter(F.col("retried") < cfg.cycle_retry_times)

        # --- 4. retry candidates: retried+1 => NEW identity ----------
        retries = retryable.select(
            "url", "host", "method", "referer", "origin", "content", "headers",
            "priority", "depth",
            (F.col("retried") + 1).alias("retried"),
            (iter_base + F.col("__block") * (1 << _POS_BITS)).cast("long").alias("seq"),
        ).withColumn(
            "identity",
            request_identity(
                F.col("url"), method=F.col("method"), referer=F.col("referer"),
                origin=F.col("origin"), content=F.col("content"),
                retried=F.col("retried"), headers=F.col("headers"),
            ),
        )

        # --- 5. link discovery from successes ------------------------
        children = _discover_children(success, cfg, iter_base)

        # --- 6. dedup-push into next frontier ------------------------
        candidates = children.select(*_FRONTIER_COLS).unionByName(
            retries.select(*_FRONTIER_COLS)
        )
        if cfg.use_bloom:
            from dotnetspider_spark.operators.bloom import (
                build_blooms,
                dedup_push_bloom,
            )

            if blooms is None:  # fold the seed identities in on first use
                build_blooms(seen, bloom_params).write.mode("overwrite").parquet(
                    f"{root}/blooms/iter={it}"
                )
                blooms = spark.read.parquet(f"{root}/blooms/iter={it}")
            fresh = dedup_push_bloom(candidates, seen, blooms, bloom_params)
        else:
            fresh = dedup_push(candidates, seen)
        fresh = fresh.localCheckpoint(eager=True)
        n_fresh = fresh.count()

        # --- 7. persist next state as parquet snapshots. Writes run
        #        once; read-back counts are parquet-footer metadata
        #        lookups, so each state transition costs ONE job ------
        if n_fresh > 0:
            fresh.select("identity").write.mode("overwrite").parquet(
                f"{root}/seen/iter={it}"
            )
            seen_paths.append(f"{root}/seen/iter={it}")
            seen = spark.read.parquet(*seen_paths).select("identity")
            if cfg.use_bloom:
                delta = spark.read.parquet(f"{root}/seen/iter={it}")
                build_blooms(
                    delta, bloom_params, existing=blooms
                ).write.mode("overwrite").parquet(f"{root}/blooms/iter={it + 1}")
                blooms = spark.read.parquet(f"{root}/blooms/iter={it + 1}")

        frontier_next = rest.select(*_FRONTIER_COLS).unionByName(fresh)
        frontier_next.write.mode("overwrite").parquet(f"{root}/frontier/iter={it}")
        frontier = spark.read.schema(FRONTIER_SCHEMA).parquet(
            f"{root}/frontier/iter={it}"
        )
        n_next = frontier.count()  # footer metadata, no scan
        if n_next == 0:
            exhausted = True

        success.select(
            *_FRONTIER_COLS, "status", "rank", F.lit(it).alias("iter")
        ).write.mode("overwrite").parquet(f"{root}/fetched/iter={it}")
        fetched_paths.append(f"{root}/fetched/iter={it}")

        # --- 8. metrics: per-host lineage + iteration aggregates -----
        outcome_counts = (
            fetched_raw.groupBy("host")
            .agg(
                F.count("*").alias("n_batch"),
                F.sum((F.col("status") == 200).cast("int")).alias("n_ok"),
                F.sum((F.col("status") >= 500).cast("int")).alias("n_transient"),
                F.sum((F.col("status") == 404).cast("int")).alias("n_missing"),
            )
            .collect()
        )
        row = {
            "iter": it,
            "n_frontier": n_frontier,
            "n_batch": sum(r.n_batch for r in outcome_counts),
            "n_ok": sum(r.n_ok for r in outcome_counts),
            "n_transient": sum(r.n_transient for r in outcome_counts),
            "n_missing": sum(r.n_missing for r in outcome_counts),
            "n_new": n_fresh,
            "n_hosts": len(outcome_counts),
            "wall_ms": int((time.monotonic() - t0) * 1000),
        }
        metrics.append(row)
        if cfg.verbose:
            print(f"[crawl] {row}", flush=True)
        if it % cfg.checkpoint_every == 0:
            ckpt.save_metrics_and_manifest(
                it,
                [{**row, "host": r.host, "host_ok": int(r.n_ok)} for r in outcome_counts],
            )
        it += 1

    fetched_schema = FRONTIER_SCHEMA + ", status int, rank int, iter int"
    empty = spark.createDataFrame([], fetched_schema)
    empty_frontier = spark.createDataFrame([], FRONTIER_SCHEMA)
    return CrawlRunResult(
        # explicit schema: iteration dirs may be empty (no part files)
        fetched=spark.read.schema(fetched_schema).parquet(*fetched_paths)
        if fetched_paths
        else empty,
        seen=seen,
        frontier=frontier if not exhausted else empty_frontier,
        metrics=metrics,
        iterations=it - start_iter,
    )
