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
(identities) — kept as DELTA parquet snapshots: the frontier is the
union of additive parts (``frontier/init``/``frontier/compact=N``
plus ``fresh/iter=N`` appends) anti-joined against consumed batch
identities (``consumed/iter=N``), compacted every ``compact_every``
iterations. Per-iteration I/O is therefore O(batch + new links), not
O(frontier) — the property that matters at the 10^10-row design point,
where rewriting the whole remaining frontier each iteration would be
the dominant cost. ``seen/iter=N`` deltas, ``fetched/iter=N``,
``errors/iter=N`` (the failing.log analog, Spider.cs:993-994) and
``metrics/iter=N`` (per-host lineage rows, written DISTRIBUTED — never
collected) complete the snapshot set; an atomically-renamed
``_MANIFEST.json`` records the last complete iteration plus the live
part lists, so a killed crawl resumes exactly (north rule: snapshot +
per-partition lineage; Iceberg in production — the sandbox ships no
Iceberg runtime jar, so the delta layout emulates its
manifest/snapshot/delete-file model over plain parquet).

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
    compact_every: int = 8  # frontier delta-compaction cadence (iterations)
    seen_compact_parts: int = 32  # fold seen deltas when parts exceed this
    #: store the compacted seen table BUCKETED by identity (catalog
    #: parquet table): the per-iteration dedup anti-join then reads the
    #: 10^10-row seen side in place — zero exchange on the big side, only
    #: the batch-sized candidate set shuffles (LSM read path: candidates
    #: first dedup vs the small recent deltas, then anti-join the
    #: bucketed compact). Plan shape proven by
    #: tests/test_plans.py::test_bucketed_seen_join_skips_seen_side_shuffle.
    bucketed_seen: bool = False
    seen_buckets: int = 32
    salt_buckets: int = 16
    max_link_pos: int = (1 << _POS_BITS) - 2
    verbose: bool = False  # print each iteration's metrics row
    #: SkipTargetRequestsWhenResultIsEmpty (Spider.cs:397,1155): when a
    #: processor reports zero result items for a page, do not extract its
    #: target links. Only meaningful with a ``processor``.
    skip_targets_when_result_empty: bool = False
    #: media-type file gate (HttpClientDownloader.cs:130-140): when the
    #: fetcher emits ``content_type``, successful fetches whose type is
    #: a file/media type (functions.content.is_media_type) skip decode /
    #: link discovery / extraction. True stores their rows (payload
    #: bytes included when present) under ``downloads/iter=N`` with the
    #: reference's host+path file_path (Downloader.cs:390-395); False —
    #: the reference's ``DownloadFiles`` default — ignores them. Either
    #: way they count as fetched successes and yield no children.
    download_files: bool = False
    #: order polls by (priority desc, seq) instead of seq only. The
    #: reference stores Priority but never reads it (Page.cs:9); its
    #: Broker DB schema orders by priority (DistributeDesign.md:149-161),
    #: so this is exposed as an OPT-IN — default stays reference-faithful.
    priority_first: bool = False
    #: opt-in crawler-trap guard (operators/traps.py; the Heritrix
    #: failure mode — absent in the reference, whose frontier grows
    #: unboundedly on a trap host until SleepTime slows the bleed):
    #: each iteration, newly DISCOVERED children are template-profiled
    #: per host, and hosts whose URL/template ratio explodes past
    #: ``trap_max_ratio`` (with >= ``trap_min_urls`` links in the
    #: batch) contribute no children that iteration. Detection is
    #: per-discovery-batch — a trap page emits its explosion in one
    #: parse — costing one extra aggregate over the persisted children
    #: (the parse UDF runs once) and a literal host filter; the flagged
    #: host list passes through the driver but is bounded by hosts
    #: flagged THIS batch, no cumulative table. Default OFF: the guard
    #: intentionally diverges from reference crawl results.
    trap_guard: bool = False
    trap_min_urls: int = 100
    trap_max_ratio: float = 8.0
    #: opt-in adaptive per-host backoff (operators/frontier.py
    #: adaptive_backoff; AIMD response to 429/503 — absent in the
    #: reference, whose politeness is the static SleepTime): each
    #: iteration reads the PREVIOUS iteration's fetch log (one
    #: column-pruned parquet read of host+status), shrinks throttling
    #: hosts' poll budgets by the multiplier, and parks >=50%-throttle
    #: hosts for one iteration (budget 0 — their frontier rows are NOT
    #: consumed, they simply wait). The one-iteration observation
    #: window makes the control loop self-correcting: a parked host
    #: produces no observations, so the next iteration it re-enters at
    #: multiplier 1 (the AIMD probe). Default OFF: backoff
    #: intentionally diverges from reference crawl ordering.
    adaptive_backoff: bool = False
    backoff_min_observations: int = 20
    #: opt-in REP page-directive policy (functions/linkpolicy.py —
    #: north-rule addition, absent in the reference which follows every
    #: href): discovery drops rel="nofollow"/"ugc"/"sponsored" anchors,
    #: drops ALL children of meta-robots-nofollow pages, and enqueues a
    #: page's <link rel="canonical"> target as an extra child (appended
    #: after the followed links, first-occurrence dedup preserved) so
    #: the canonical variant reaches the frontier. Same fused
    #: one-crossing parse budget as the default path. Default OFF:
    #: policy intentionally diverges from reference crawl results.
    honor_link_policy: bool = False

    def __post_init__(self):
        if self.use_bloom and self.bucketed_seen:
            # the dedup step can take only one path; silently dropping
            # the bucketed table the config asked for hid real behavior
            raise ValueError(
                "use_bloom and bucketed_seen are mutually exclusive: the "
                "dedup stage uses the bloom prune OR the bucketed-seen "
                "anti-join, not both — pick one"
            )


ERRORS_SCHEMA = (
    "url string, host string, identity string, depth int, retried int, "
    "status int, reason string, iter int"
)


@dataclass
class CrawlRunResult:
    fetched: DataFrame  # fetched pages: frontier cols + iter, rank, status
    seen: DataFrame  # identity strings
    frontier: DataFrame  # remaining (empty when converged)
    errors: DataFrame | None = None  # failing.log analog (ERRORS_SCHEMA)
    #: stored media payloads (download_files=True): url/host/identity/
    #: target_url/content_type[/bytes]/file_path/iter rows
    downloads: DataFrame | None = None
    metrics: list[dict] = field(default_factory=list)
    iterations: int = 0

    def fetch_order(self) -> list[str]:
        """URLs in engine poll order — (iter, batch rank) ascending."""
        return [
            r.url
            for r in self.fetched.orderBy("iter", "rank", "url").select("url").collect()
        ]


def _dense_seq_by_url(df: DataFrame) -> DataFrame:
    """Dense 0-based seq in url order WITHOUT a single-partition window.

    Range-partition on url (partition ids ascend with the range), rank
    within each partition, then add per-partition offsets computed from
    the partition counts (a collect of at most #partitions rows — the
    scalable zip-with-index). Equivalent to
    ``row_number().over(Window.orderBy(url)) - 1`` but every stage is
    distributed; at the 10^10-seed design point the old global window
    funnelled the entire seed set through one task.
    """
    ranged = df.repartitionByRange(F.col("url"))
    withpid = ranged.withColumn("__pid", F.spark_partition_id())
    w = Window.partitionBy("__pid").orderBy("url")
    # pin the partitioning: the count collect below and the final result
    # must see the SAME range boundaries (range partitioning samples)
    ranked = withpid.withColumn("__rn", F.row_number().over(w)).localCheckpoint(
        eager=True
    )
    counts = sorted(
        ranked.groupBy("__pid").agg(F.count("*").alias("__n")).collect(),
        key=lambda r: r["__pid"],
    )
    offset = {}
    acc = 0
    for r in counts:
        offset[r["__pid"]] = acc
        acc += r["__n"]
    if not offset:
        return df.withColumn("seq", F.lit(0).cast("long"))
    omap = F.create_map(
        *[F.lit(x) for pid, off in offset.items() for x in (pid, off)]
    )
    return ranked.withColumn(
        "seq", (omap[F.col("__pid")] + F.col("__rn") - 1).cast("long")
    ).drop("__pid", "__rn")


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
        elif col in ("method", "priority", "depth", "retried"):
            # present-but-NULL rows (e.g. Spider.run unions seed sources
            # with allowMissingColumns=True, which fills the narrower
            # frame's columns with NULL) must take the default too: a
            # NULL depth silently drops children at the depth gate, a
            # NULL retried disables cycle retry, and a NULL priority
            # diverges from the oracle under priority_first
            df = df.withColumn(col, F.coalesce(F.col(col), default))
    if "seq" not in df.columns:
        df = _dense_seq_by_url(df)
    else:
        # present-but-NULL seq rows (Spider.run unions seed sources with
        # allowMissingColumns=True) would be DESTROYED downstream:
        # min_by(struct, seq) over an all-NULL key returns a NULL struct,
        # silently losing those seeds. Assign them the same deterministic
        # url-ranked seq as the no-seq path, offset past any explicit seq
        # (2^40 — explicit seqs keep precedence; seq is a long)
        with_seq = df.filter(F.col("seq").isNotNull())
        null_seq = df.filter(F.col("seq").isNull()).drop("seq")
        df = with_seq.unionByName(
            _dense_seq_by_url(null_seq).withColumn(
                "seq", (F.col("seq") + F.lit(1 << 40)).cast("long")
            )
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


def _status_ok():
    """Fetch-success predicate: any 2xx (Downloader.cs:57-64
    ``EnsureSuccessStatusCode`` semantics). The corpus replay path only
    ever emits 200, but a real transport returns 201/204/206 etc. —
    those are fetched pages, not ``http_2xx`` error rows."""
    return (F.col("status") >= 200) & (F.col("status") < 300)


def _robots_flag(batch: DataFrame, robots: DataFrame | None) -> DataFrame:
    """Annotate each row with boolean ``__allowed``. Rules are tiny config
    (host, path_prefix, allow[, path_re]) — aggregated per host and
    BROADCAST equi-joined, then the most specific matching rule is
    picked by a JVM-side array fold: zero exchanges, zero windows, stays
    inside whole-stage codegen (the previous per-identity window added
    one shuffle per crawl iteration). Plain rules match by path prefix;
    wildcard rules (RFC 9309 ``*``/``$``) carry their anchored regex in
    ``path_re`` and match via ``rlike`` — specificity is the ORIGINAL
    pattern length in both cases and ties break to allow, same as
    Google's matcher. The match subject is path?query (Googlebot
    matches rules against the query string too — a plain prefix rule's
    verdict is unchanged by the appended suffix). A rules table without
    the ``path_re`` column (hand-built configs, older fixtures) is
    treated as all-prefix. No rule = allow. Denied rows are kept
    (flagged) so the loop can consume them AND log them to the errors
    table (failing.log analog) without recomputing the gate."""
    if robots is None:
        return batch.withColumn("__allowed", F.lit(True))
    if "path_re" not in robots.columns:
        robots = robots.withColumn("path_re", F.lit(None).cast("string"))
    # try_parse_url: an unparseable frontier URL (space, bad %-escape)
    # must not abort the iteration — it degrades to subject "/" and the
    # host's rules decide (no rules = allow), instead of killing the job
    path = F.coalesce(F.try_parse_url(F.col("url"), F.lit("PATH")), F.lit("/"))
    query = F.try_parse_url(F.col("url"), F.lit("QUERY"))
    subject = F.when(
        query.isNull() | (query == F.lit("")), path
    ).otherwise(F.concat(path, F.lit("?"), query))
    by_host = robots.groupBy("host").agg(
        F.collect_list(F.struct("path_prefix", "allow", "path_re")).alias(
            "__rules"
        )
    )
    joined = batch.withColumn("__path", subject).join(
        F.broadcast(by_host), "host", "left"
    )
    p = F.col("__path")
    _arr_t = "array<struct<path_prefix:string,allow:boolean,path_re:string>>"
    matched = F.filter(
        F.coalesce(F.col("__rules"), F.array().cast(_arr_t)),
        lambda r: F.when(
            r["path_re"].isNull(), p.startswith(r["path_prefix"])
        ).otherwise(F.rlike(p, r["path_re"])),
    )
    none_t = F.lit(None).cast(
        "struct<path_prefix:string,allow:boolean,path_re:string>"
    )
    # longest prefix wins; equal lengths tie-break to ALLOW (the Google
    # robots.txt spec's rule for equally-specific rules) — collect_list
    # order varies across partitions, so without this the verdict of an
    # allow/deny pair of identical length could flip between runs
    best = F.aggregate(
        matched,
        none_t,
        lambda acc, r: F.when(
            acc.isNull()
            | (F.length(r["path_prefix"]) > F.length(acc["path_prefix"]))
            | (
                (F.length(r["path_prefix"]) == F.length(acc["path_prefix"]))
                & r["allow"]
                & ~acc["allow"]
            ),
            r,
        ).otherwise(acc),
    )
    return joined.withColumn(
        "__allowed", F.coalesce(best["allow"], F.lit(True))
    ).drop("__rules", "__path")


def _robots_gate(batch: DataFrame, robots: DataFrame | None) -> DataFrame:
    """Filtering wrapper over :func:`_robots_flag` (kept for plan tests)."""
    if robots is None:
        return batch
    return _robots_flag(batch, robots).filter(F.col("__allowed")).drop("__allowed")


def _discover_children(success: DataFrame, cfg: CrawlConfig, iter_base) -> DataFrame:
    """success(frontier cols + html + __block) -> child frontier rows.

    Link extraction, the junk gate (Page.cs:121-127), canonicalization
    (Selectable.cs:229-241) and the within-page first-occurrence dedup
    (TargetRequests HashSet, Page.cs:37) are FUSED into one pandas UDF
    (parse.extract_canonical_links_udf): one Python boundary crossing per
    page instead of one per raw link, and no per-page window shuffle.
    """
    # relative links resolve against the POST-redirect URL when the
    # fetcher recorded one (page.TargetUrl, Downloader.cs:211-220)
    base = (
        F.coalesce(F.col("target_url"), F.col("url"))
        if "target_url" in success.columns
        else F.col("url")
    )
    if cfg.honor_link_policy:
        from dotnetspider_spark.functions.linkpolicy import (
            extract_policy_links_udf,
        )

        pol = extract_policy_links_udf(F.col("html"), base)
        # canonical target appended after the followed links (position
        # order of real links preserved for seq); array_distinct keeps
        # first occurrence, so a canonical already linked in-body does
        # not duplicate
        links = F.array_distinct(
            F.when(
                pol["canonical"].isNotNull() & (pol["canonical"] != base),
                F.concat(pol["children"], F.array(pol["canonical"])),
            ).otherwise(pol["children"])
        )
    else:
        links = extract_canonical_links_udf(F.col("html"), base)
    canon = success.select(
        F.col("referer").alias("__p_referer"),
        F.col("origin").alias("__p_origin"),
        F.col("headers").alias("__p_headers"),
        F.col("depth").alias("__p_depth"),
        F.col("__block"),
        F.posexplode(links).alias("__pos", "url"),
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


def _apply_backoff(fr_b: DataFrame, backoff) -> DataFrame:
    """Shrink the ``__budget`` column by the adaptive-backoff verdicts:
    cooldown hosts poll nothing this iteration (their frontier rows are
    not consumed — they wait), throttling hosts keep at least one slot
    (the AIMD probe that detects recovery). ``backoff`` is a broadcast
    (host, multiplier, cooldown) frame or None (no-op)."""
    if backoff is None:
        return fr_b
    adj = F.when(
        F.coalesce(F.col("cooldown"), F.lit(False)), F.lit(0)
    ).otherwise(
        F.greatest(
            F.floor(
                F.col("__budget")
                / F.coalesce(F.col("multiplier"), F.lit(1)).cast("double")
            ),
            F.lit(1),
        )
    )
    return (
        fr_b.join(backoff, "host", "left")
        .withColumn("__budget", adj.cast("int"))
        .drop("multiplier", "cooldown")
    )


class Checkpointer:
    """Manifest writer over the parquet delta-snapshot layout.

    The crawl loop writes the state tables (fresh/consumed/seen/blooms/
    fetched/errors/metrics as ``<root>/<table>/iter=N`` parquet dirs,
    frontier compactions as ``frontier/compact=N``); this class adds the
    atomically-renamed ``_MANIFEST.json`` marking the last COMPLETE
    iteration plus the live state-part lists (written after that
    iteration's state dirs, so a crash mid-iteration resumes from the
    previous consistent snapshot) — the Iceberg-manifest analog.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def save_manifest(self, it: int, state: dict) -> None:
        payload = {"last_iter": it, "ts": time.time(), **state}
        tmp = f"{self.root}/_MANIFEST.json.tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, f"{self.root}/_MANIFEST.json")
        # append-only versioned twin: one manifest per checkpointed
        # iteration, never overwritten — the Iceberg snapshot-list
        # analog. Data parts are themselves append-only (compaction
        # writes NEW dirs and drops old ones from the CURRENT lists
        # without deleting files), so any retained manifest remains a
        # consistent, readable snapshot until crawler.timetravel
        # .expire_snapshots reclaims it. Bytes are trivial: one small
        # JSON per iteration vs the iteration's parquet.
        os.makedirs(f"{self.root}/manifests", exist_ok=True)
        vtmp = f"{self.root}/manifests/.iter={it}.json.tmp"
        with open(vtmp, "w") as f:
            json.dump(payload, f)
        os.replace(vtmp, f"{self.root}/manifests/iter={it}.json")

    def load_manifest(self) -> dict | None:
        try:
            with open(f"{self.root}/_MANIFEST.json") as f:
                m = json.load(f)
            m["last_iter"]
            return m
        except (FileNotFoundError, json.JSONDecodeError, KeyError):
            return None

    def last_iter(self) -> int | None:
        m = self.load_manifest()
        return None if m is None else m["last_iter"]


def crawl(
    spark: SparkSession,
    corpus: DataFrame | None,
    seeds: DataFrame,
    cfg: CrawlConfig | None = None,
    robots: DataFrame | None = None,
    host_delays: DataFrame | None = None,
    resume: bool = False,
    processor=None,
    fetcher=None,
) -> CrawlRunResult:
    """Run the crawl to frontier exhaustion (or max_iterations).

    ``fetcher``: optional fetch stage (sources.fetchers protocol: a
    ``fetch(batch) -> DataFrame`` adding ``status``/``html`` and
    optionally ``target_url``/``content_type``/``encoding``/``bytes``).
    Default: ``CorpusFetcher(corpus)`` — offline replay. Pass
    ``HttpFetcher(transport_factory)`` for the live mapInPandas HTTP
    stage (Downloader.cs:57-64 mapping; tests drive it with
    ``DictTransport``).

    Post-redirect dedup (Downloader.cs:211-220 ``page.TargetUrl``): when
    a fetch lands on ``target_url != url``, the identity of a virgin GET
    for the final URL (same referer/origin/headers metadata the row's
    children would inherit) is recorded in ``seen``, so a later
    discovered link to the final URL is not fetched twice. Links are
    resolved against ``target_url``, and it is carried in the fetched
    output.

    ``host_delays``: optional (host, crawl_delay_ms) table — per-host
    politeness budgets k=⌈iter_wall/delay⌉ (the reference's SleepTime
    made per-host, SURVEY §2.2); hosts without a row are capped only by
    ``per_host_limit``. Broadcast-joined (config-sized table).

    ``processor``: optional ``Callable[[DataFrame], DataFrame]`` — given
    the success rows (frontier cols + ``html``), must return them with
    two added columns: ``n_results int`` (items the page processor
    yielded) and ``proc_error boolean`` (processor threw). Mirrors the
    reference's page-processor hook (Spider.cs:1129-1163):
    ``proc_error`` rows cycle-retry with retried+1 ⇒ new identity (like
    a transient fetch) and land in the errors table once retries are
    exhausted; ``n_results == 0`` rows skip target-link extraction when
    ``cfg.skip_targets_when_result_empty`` (SpiderTest.cs:162-174).

    State model: cross-iteration state lives in parquet DELTA snapshot
    tables under ``checkpoint_dir`` (or a temp dir) — NOT in checkpointed
    RDDs. Spark 4's ``localCheckpoint`` copies the pre-checkpoint plan's
    statistics onto the truncated node
    (``LogicalRDD.rewriteStatsAndConstraints``), so size estimates
    compound multiplicatively across iterations until the driver stalls
    multiplying million-digit BigIntegers (observed via jstack; iteration
    walls grew ~3x per iteration). Parquet round-trips reset stats to
    file-size reality and ARE the engine's table design anyway (Iceberg
    snapshots in production). ``localCheckpoint`` is still used WITHIN an
    iteration, where plans are bounded.

    Delta layout: the live frontier is ``union(frontier_parts) ANTI JOIN
    union(consumed_parts)`` where frontier_parts = seeds (or last
    compaction) + per-iteration ``fresh/iter=N`` appends and
    consumed_parts = per-iteration batch identities. Per-iteration write
    volume is O(batch + new links), not O(frontier); every
    ``cfg.compact_every`` iterations the view is materialized to
    ``frontier/compact=N`` and both part lists reset, bounding plan
    depth. ``seen`` is ``seen/init`` + the identity column of every
    fresh part (column-pruned parquet read — no second write). The
    frontier size is tracked arithmetically (n - consumed + fresh), so
    no per-iteration count scan of the frontier exists at all.
    """
    import tempfile

    cfg = cfg or CrawlConfig()
    if cfg.adaptive_backoff and (
        cfg.global_limit is not None
        or (cfg.per_host_limit is None and host_delays is None)
    ):
        # in these modes no budget column exists for the multiplier to
        # shrink — backoff would silently be inert while still paying
        # the per-iteration log read + aggregate; failing loudly beats
        # a 100%-throttling host being polled at full rate unwarned
        raise ValueError(
            "adaptive_backoff needs a per-host budget to act on: set "
            "per_host_limit (or pass host_delays) and do not combine "
            "with global_limit"
        )
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
    if fetcher is None:
        if corpus is None:
            # fail fast with configuration context — CorpusFetcher(None)
            # would otherwise crash mid-iteration with a bare
            # AttributeError after the seed write already ran
            raise ValueError(
                "crawl() needs a corpus DataFrame or an explicit fetcher "
                "(no ambient network in this engine)"
            )
        from dotnetspider_spark.sources.fetchers import CorpusFetcher

        # the scheduling path must never scan payload columns: the
        # fetcher projects (url, status, html) only
        fetcher = CorpusFetcher(corpus)

    metrics: list[dict] = []
    start_iter = 0

    import hashlib

    _tag = hashlib.md5(root.encode()).hexdigest()[:10]
    seen_table: str | None = None  # catalog name of the bucketed compact
    seen_table_buckets = cfg.seen_buckets  # layout of the LIVE table's files

    def write_seen_table(df: DataFrame, version: int) -> str:
        name = f"seen_{_tag}_v{version}"
        (
            df.select("identity")
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(cfg.seen_buckets, "identity")
            .sortBy("identity")
            .option("path", f"{root}/seen_bucketed/v={version}")
            .saveAsTable(name)
        )
        return name

    def restore_seen_table(name: str, path: str, buckets: int) -> None:
        # the bucket count MUST be the one the files were written with —
        # re-declaring with the current cfg.seen_buckets would mis-declare
        # the layout and the bucketed anti-join would silently miss seen
        # identities (re-crawling duplicates); the manifest persists it
        if not spark.catalog.tableExists(name):
            spark.sql(
                f"CREATE TABLE {name} (identity STRING) USING parquet "
                f"CLUSTERED BY (identity) SORTED BY (identity) "
                f"INTO {buckets} BUCKETS LOCATION '{path}'"
            )

    if resume:
        m = ckpt.load_manifest()
        if m is None:
            raise ValueError(f"no manifest under {root}")
        start_iter = m["last_iter"] + 1
        frontier_parts = list(m["frontier_parts"])
        consumed_parts = list(m["consumed_parts"])
        seen_parts = list(m["seen_parts"])
        fetched_paths = list(m["fetched_paths"])
        errors_paths = list(m.get("errors_paths", []))
        downloads_paths = list(m.get("downloads_paths", []))
        n_frontier = int(m["n_frontier"])
        seen_table = m.get("seen_table")
        if seen_table is not None:
            seen_table_buckets = int(m.get("seen_table_buckets") or cfg.seen_buckets)
            restore_seen_table(seen_table, m["seen_table_path"], seen_table_buckets)
    else:
        seeds_to_frontier(seeds).write.mode("overwrite").parquet(
            f"{root}/frontier/init"
        )
        init = spark.read.schema(FRONTIER_SCHEMA).parquet(f"{root}/frontier/init")
        frontier_parts = [f"{root}/frontier/init"]
        consumed_parts = []
        fetched_paths = []
        errors_paths = []
        downloads_paths = []
        n_frontier = init.count()  # parquet footer metadata, no scan
        if cfg.bucketed_seen:
            seen_table = write_seen_table(
                spark.read.schema("identity string").parquet(
                    f"{root}/frontier/init"
                ),
                0,
            )
            seen_parts = []
        else:
            seen_parts = [f"{root}/frontier/init"]

    def frontier_view() -> DataFrame:
        fr = spark.read.schema(FRONTIER_SCHEMA).parquet(*frontier_parts)
        if consumed_parts:
            cons = spark.read.schema("identity string").parquet(*consumed_parts)
            fr = fr.join(cons, "identity", "left_anti")
        return fr

    def seen_deltas() -> DataFrame | None:
        if not seen_parts:
            return None
        # seen/identity lives inside frontier-schema parts: explicit
        # 1-column schema = column-pruned footer+identity read only
        return spark.read.schema("identity string").parquet(*seen_parts)

    def seen_view() -> DataFrame:
        d = seen_deltas()
        if seen_table is None:
            assert d is not None
            return d
        big = spark.table(seen_table).select("identity")
        return big if d is None else big.unionByName(d)

    seen = seen_view()
    robots_cfg = robots if cfg.robots_enabled else None

    it = start_iter
    exhausted = False
    while it < cfg.max_iterations and not exhausted:
        t0 = time.monotonic()
        if n_frontier == 0:
            break
        frontier = frontier_view()
        iter_base = F.lit((it + 1) << _ITER_SHIFT)

        # --- 1a. opt-in adaptive backoff: read LAST iteration's fetch
        #         statuses (column-pruned parquet read, host+status
        #         only) and derive per-host budget multipliers. The
        #         one-iteration window keeps the control loop
        #         self-correcting (see CrawlConfig.adaptive_backoff).
        backoff = None
        if cfg.adaptive_backoff and it > 0:
            # throttle statuses (429/503) are NOT successes, so the
            # observation log is fetched (2xx/media) UNION errors —
            # both persisted per iteration with host + status
            logs = [
                # robots-denied rows log status NULL and were never
                # SENT — counting them dilutes the throttle rate and
                # can suppress a deserved cooldown
                spark.read.parquet(p)
                .select("host", "status")
                .filter(F.col("status").isNotNull())
                for p in (
                    f"{root}/fetched/iter={it - 1}",
                    f"{root}/errors/iter={it - 1}",
                )
                if os.path.isdir(p)
            ]
            if logs:
                from dotnetspider_spark.operators.frontier import (
                    adaptive_backoff as _adaptive_backoff,
                )

                log = logs[0]
                for extra in logs[1:]:
                    log = log.unionByName(extra)
                backoff = F.broadcast(
                    _adaptive_backoff(
                        log,
                        min_observations=cfg.backoff_min_observations,
                    ).select("host", "multiplier", "cooldown")
                )

        # --- 1. poll: select this iteration's batch ------------------
        order = poll_order(cfg.dfs, cfg.priority_first) + [F.col("url").asc()]
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
            fr_b = _apply_backoff(fr_b, backoff)
            batch = select_fetch_batch(
                fr_b, dfs=cfg.dfs, budget_col="__budget",
                salt_buckets=cfg.salt_buckets,
                priority_first=cfg.priority_first,
            ).withColumnRenamed("host_rank", "rank").drop("__budget")
            batch = _with_block(batch)
        elif backoff is not None and cfg.per_host_limit is not None:
            # backoff without per-host robots delays: the static limit
            # becomes the budget column so the multiplier can shrink it
            fr_b = _apply_backoff(
                frontier.withColumn(
                    "__budget", F.lit(cfg.per_host_limit)
                ),
                backoff,
            )
            batch = select_fetch_batch(
                fr_b, dfs=cfg.dfs, budget_col="__budget",
                salt_buckets=cfg.salt_buckets,
                priority_first=cfg.priority_first,
            ).withColumnRenamed("host_rank", "rank").drop("__budget")
            batch = _with_block(batch)
        else:
            batch = select_fetch_batch(
                frontier, dfs=cfg.dfs, per_host_limit=cfg.per_host_limit,
                salt_buckets=cfg.salt_buckets,
                priority_first=cfg.priority_first,
            ).withColumnRenamed("host_rank", "rank")
            batch = _with_block(batch)
        # --- 1b+2 fused: ONE job materializes the batch AND persists the
        #        consumed delta. The parquet write is the checkpoint (the
        #        batch is re-read from it, truncating the rank plan) and
        #        its identity column IS the consumed anti-join part
        #        (column-pruned read, like the seen deltas) — previously
        #        a localCheckpoint job + a separate identity write.
        #        O(batch) I/O either way; the frontier is NOT rewritten.
        batch.write.mode("overwrite").parquet(f"{root}/consumed/iter={it}")
        batch = spark.read.parquet(f"{root}/consumed/iter={it}")
        consumed_parts.append(f"{root}/consumed/iter={it}")
        n_consumed = batch.count()  # parquet footer metadata, no scan

        # --- 3. robots gate (denied rows are consumed AND logged) ----
        flagged = _robots_flag(batch, robots_cfg)
        allowed = flagged.filter(F.col("__allowed")).drop("__allowed")
        denied = flagged.filter(~F.col("__allowed")).drop("__allowed")

        # --- 4. fetch via the pluggable fetcher (corpus join replay or
        #        mapInPandas HTTP per host-partition). In-iteration
        #        checkpoint: the result is re-read by later stages -----
        fetched_raw = fetcher.fetch(allowed)
        # only fetchers that can redirect emit target_url; skip the whole
        # redirect bookkeeping (one count job + possible delta write per
        # iteration) when the stage can't produce one
        track_redirects = "target_url" in fetched_raw.columns
        if not track_redirects:
            fetched_raw = fetched_raw.withColumn("target_url", F.col("url"))
        fetched_raw = fetched_raw.localCheckpoint(eager=True)

        # --- 4b. post-redirect dedup (page.TargetUrl, Downloader.cs:
        #         211-220): successful fetches that landed elsewhere mark
        #         the FINAL url's identity seen, so later links to it are
        #         not fetched twice. Must land before this iteration's
        #         dedup-push (children may already link to the target) --
        if track_redirects:
            redirected = fetched_raw.filter(
                _status_ok() & (F.col("target_url") != F.col("url"))
            )
            if "redirect_hops" in fetched_raw.columns:
                # multi-hop chains: EVERY visited hop (intermediates +
                # final) is marked seen, so a later link to any point of
                # the chain is a dup (Downloader.cs:57-64 follows the
                # whole chain in one request)
                hop_url = F.explode("redirect_hops").alias("__hop")
                redirected = redirected.select(
                    hop_url, "referer", "origin", "headers"
                ).withColumnRenamed("__hop", "target_url")
            extra_seen = (
                redirected.select(
                    request_identity(
                        F.col("target_url"), method=F.lit("GET"),
                        referer=F.col("referer"), origin=F.col("origin"),
                        content=F.lit(None).cast("string"),
                        retried=F.lit(0), headers=F.col("headers"),
                    ).alias("identity")
                )
                .distinct()
            )
            # write first, count from parquet footers — ONE job instead
            # of a count job plus a second job recomputing the same
            # filter+distinct for the write (the fresh-delta pattern)
            extra_seen.write.mode("overwrite").parquet(
                f"{root}/seen_extra/iter={it}"
            )
            if (
                spark.read.schema("identity string")
                .parquet(f"{root}/seen_extra/iter={it}")
                .count()
                > 0
            ):
                seen_parts.append(f"{root}/seen_extra/iter={it}")
                seen = seen_view()
                if cfg.use_bloom and blooms is not None:
                    from dotnetspider_spark.operators.bloom import build_blooms

                    build_blooms(
                        spark.read.schema("identity string").parquet(
                            f"{root}/seen_extra/iter={it}"
                        ),
                        bloom_params,
                        existing=blooms,
                    ).write.mode("overwrite").parquet(
                        f"{root}/blooms/iter={it}_redir"
                    )
                    blooms = spark.read.parquet(f"{root}/blooms/iter={it}_redir")

        success = fetched_raw.filter(_status_ok())
        transient = fetched_raw.filter(F.col("status") >= 500)
        retryable = transient.filter(F.col("retried") < cfg.cycle_retry_times)

        # --- 4c. media-type file gate (HttpClientDownloader.cs:130-140):
        #         successes whose Content-Type marks a FILE payload are
        #         not decoded/parsed/extracted. download_files=True
        #         stores them under downloads/iter=N with the
        #         reference's host+path file_path (Downloader.cs:390-395
        #         CreateFilePath; its "file already exists" skip is the
        #         upstream identity dedup); False (the DownloadFiles
        #         default) ignores them. Either way they remain fetched
        #         successes and yield no children -------------------
        media = None
        if cfg.download_files and "content_type" not in fetched_raw.columns:
            # same loudness contract as the use_bloom/bucketed_seen
            # check: the config asked for media downloads but this
            # fetcher cannot say what is media — completing the crawl
            # with downloads=None and no diagnostic hides real behavior
            raise ValueError(
                "download_files=True needs a fetcher that emits "
                "content_type (HttpFetcher, or CorpusFetcher with "
                "content_cols including 'content_type') — this fetcher "
                f"returned columns {fetched_raw.columns}"
            )
        if "content_type" in fetched_raw.columns:
            from dotnetspider_spark.functions.content import (
                download_file_path,
                is_media_type,
            )

            m_flag = is_media_type(F.col("content_type"))
            media = success.filter(m_flag)
            success = success.filter(~m_flag)
            if cfg.download_files:
                media.select(
                    "url", "host", "identity", "target_url", "content_type",
                    *(["bytes"] if "bytes" in media.columns else []),
                    download_file_path(F.col("target_url")).alias("file_path"),
                ).withColumn("iter", F.lit(it)).write.mode(
                    "overwrite"
                ).parquet(f"{root}/downloads/iter={it}")
                downloads_paths.append(f"{root}/downloads/iter={it}")

        # --- 5. page processor hook (Spider.cs:1129-1163) ------------
        if processor is not None:
            proc = processor(success).localCheckpoint(eager=True)
            proc_failed = proc.filter(F.col("proc_error"))
            success = proc.filter(~F.col("proc_error"))
            proc_retryable = proc_failed.filter(
                F.col("retried") < cfg.cycle_retry_times
            )
            linkable = success
            if cfg.skip_targets_when_result_empty:
                # SkipTargetRequestsWhenResultIsEmpty (Spider.cs:397,1155)
                linkable = success.filter(F.col("n_results") > 0)
        else:
            proc_failed = None
            proc_retryable = None
            linkable = success

        # --- 6. retry candidates: retried+1 => NEW identity ----------
        retry_src = retryable if proc_retryable is None else retryable.unionByName(
            proc_retryable, allowMissingColumns=True
        )
        retries = retry_src.select(
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

        # --- 7. link discovery from successes ------------------------
        children = _discover_children(linkable, cfg, iter_base)

        # --- 7b. opt-in trap guard: drop children of hosts whose
        #         discovered-URL/template ratio exploded this batch ----
        n_trap_hosts = 0
        trap_cached = None
        if cfg.trap_guard:
            from dotnetspider_spark.operators.traps import trap_detection

            # persist children: the guard's profile aggregate is an
            # extra action over the parse-UDF lineage, which must not
            # re-extract every page's links (the loop's fetched_raw
            # pattern); unpersisted after the fresh write materializes
            trap_cached = children.persist()
            children = trap_cached
            # flagged hosts are tiny by construction (hosts flagged
            # THIS batch); collecting them lets the drop be a literal
            # filter — no second evaluation of the profile aggregate
            # on the anti-join's build side
            flagged_hosts = [
                r.host
                for r in trap_detection(
                    children,
                    min_urls=cfg.trap_min_urls,
                    max_ratio=cfg.trap_max_ratio,
                    host_col="host",
                )
                .filter(F.col("trap"))
                .select("host")
                .collect()
            ]
            n_trap_hosts = len(flagged_hosts)
            if flagged_hosts:
                # NULL-safe: `~NULL.isin(...)` is NULL under 3VL and a
                # bare filter would silently drop unparseable-host
                # children (the try_parse_url degradation path) any
                # iteration the guard fires
                children = children.filter(
                    F.col("host").isNull()
                    | ~F.col("host").isin(flagged_hosts)
                )

        # --- 8. dedup-push into next frontier ------------------------
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
        elif seen_table is not None:
            # LSM read path: within-batch + recent-delta dedup first
            # (small side), then anti-join the bucketed compact — the
            # big seen side is read in place, no exchange
            fresh = dedup_push(candidates, seen_deltas()).join(
                spark.table(seen_table).hint("merge").select("identity"),
                "identity",
                "left_anti",
            )
        else:
            fresh = dedup_push(candidates, seen)
        # --- 9. persist deltas — the write IS the materialization (one
        #        job, replacing localCheckpoint + count + write); the
        #        count is a parquet-footer metadata lookup -------------
        fresh.write.mode("overwrite").parquet(f"{root}/fresh/iter={it}")
        if trap_cached is not None:  # parse lineage materialized; release
            trap_cached.unpersist()
        n_fresh = spark.read.parquet(f"{root}/fresh/iter={it}").count()
        if n_fresh > 0:
            frontier_parts.append(f"{root}/fresh/iter={it}")
            seen_parts.append(f"{root}/fresh/iter={it}")
            seen = seen_view()
            if cfg.use_bloom:
                delta = spark.read.schema("identity string").parquet(
                    f"{root}/fresh/iter={it}"
                )
                build_blooms(
                    delta, bloom_params, existing=blooms
                ).write.mode("overwrite").parquet(f"{root}/blooms/iter={it + 1}")
                blooms = spark.read.parquet(f"{root}/blooms/iter={it + 1}")
        n_frontier = n_frontier - n_consumed + n_fresh
        if n_frontier == 0:
            exhausted = True

        fetched_out = success.select(
            *_FRONTIER_COLS, "status", "rank", "target_url",
            F.lit(it).alias("iter"),
        )
        if media is not None:
            fetched_out = fetched_out.unionByName(
                media.select(
                    *_FRONTIER_COLS, "status", "rank", "target_url",
                    F.lit(it).alias("iter"),
                )
            )
        fetched_out.write.mode("overwrite").parquet(f"{root}/fetched/iter={it}")
        fetched_paths.append(f"{root}/fetched/iter={it}")

        # --- 10. errors table: the failing.log analog ----------------
        #         (Spider.cs:993-994) — failed rows PERSISTED, not just
        #         counted: denied / missing / retries-exhausted /
        #         unclassified status / processor-exception ----------
        reason = (
            F.when(F.col("status") == 404, F.lit("missing"))
            .when(
                (F.col("status") >= 500)
                & (F.col("retried") >= cfg.cycle_retry_times),
                F.lit("retries_exhausted"),
            )
            .when(
                ~_status_ok() & (F.col("status") < 500),
                F.concat(F.lit("http_"), F.col("status").cast("string")),
            )
        )
        err_cols = [
            "url", "host", "identity", "depth", "retried", "status", "reason",
        ]
        errs = (
            fetched_raw.withColumn("reason", reason)
            .filter(F.col("reason").isNotNull())
            .select(*err_cols)
        )
        errs = errs.unionByName(
            denied.select(
                "url", "host", "identity", "depth", "retried",
                F.lit(None).cast("int").alias("status"),
                F.lit("robots_denied").alias("reason"),
            )
        )
        if proc_failed is not None:
            errs = errs.unionByName(
                proc_failed.filter(
                    F.col("retried") >= cfg.cycle_retry_times
                ).select(
                    "url", "host", "identity", "depth", "retried", "status",
                    F.lit("processor_exception").alias("reason"),
                )
            )
        errs.withColumn("iter", F.lit(it)).write.mode("overwrite").parquet(
            f"{root}/errors/iter={it}"
        )
        errors_paths.append(f"{root}/errors/iter={it}")

        # --- 11. metrics: per-host lineage written DISTRIBUTED (north
        #         rule: per-partition lineage; never collected — at
        #         10^6+ hosts a collect here is a driver bottleneck).
        #         Iteration scalars piggyback on the SAME job via
        #         observe() (previously a second agg+collect job);
        #         n_hosts falls out of the per-host table's own row
        #         count (footer metadata) ----------------------------
        from pyspark.sql import Observation

        obs = Observation(f"crawl-iter-{it}")
        metrics_src = fetched_raw
        if n_consumed > 0:
            # a zero-row batch (every host parked by adaptive backoff)
            # runs the write as a zero-task job, so the Observation
            # never fires and .get ASSERTS instead of returning zeros —
            # observe only when there is something to observe
            metrics_src = metrics_src.observe(
                obs,
                F.count(F.lit(1)).alias("n_fetch"),
                F.sum(_status_ok().cast("int")).alias("n_ok"),
                F.sum((F.col("status") >= 500).cast("int")).alias(
                    "n_transient"
                ),
                F.sum((F.col("status") == 404).cast("int")).alias(
                    "n_missing"
                ),
            )
        metrics_src.groupBy("host").agg(
            F.count("*").alias("n_batch"),
            F.sum(_status_ok().cast("int")).alias("n_ok"),
            F.sum((F.col("status") >= 500).cast("int")).alias("n_transient"),
            F.sum((F.col("status") == 404).cast("int")).alias("n_missing"),
        ).withColumn("iter", F.lit(it)).write.mode("overwrite").parquet(
            f"{root}/metrics/iter={it}"
        )
        n_hosts = spark.read.schema("host string").parquet(
            f"{root}/metrics/iter={it}"
        ).count()
        if n_consumed > 0:
            scal = obs.get
            n_fetch = int(scal["n_fetch"] or 0)
            n_ok = int(scal["n_ok"] or 0)
            n_tr = int(scal["n_transient"] or 0)
            n_miss = int(scal["n_missing"] or 0)
        else:
            n_fetch = n_ok = n_tr = n_miss = 0
        row = {
            "iter": it,
            "n_frontier": n_frontier + n_consumed - n_fresh,  # at iteration start
            "n_batch": n_fetch,
            "n_ok": n_ok,
            "n_transient": n_tr,
            "n_missing": n_miss,
            # unclassified statuses (3xx/4xx≠404) — previously silent
            "n_other": n_fetch - n_ok - n_tr - n_miss,
            "n_denied": n_consumed - n_fetch,
            "n_new": n_fresh,
            "n_hosts": n_hosts,
            "n_trap_hosts": n_trap_hosts,
            "wall_ms": int((time.monotonic() - t0) * 1000),
        }
        metrics.append(row)
        if cfg.verbose:
            print(f"[crawl] {row}", flush=True)

        # --- 12. compaction: bound the part-list / plan depth --------
        if (it + 1) % cfg.compact_every == 0 and not exhausted:
            frontier_view().write.mode("overwrite").parquet(
                f"{root}/frontier/compact={it}"
            )
            frontier_parts = [f"{root}/frontier/compact={it}"]
            consumed_parts = []
            # seen accretes one delta part per iteration; above the part
            # budget, fold them into one identity-only part (LSM-style
            # tiering: O(seen) rewrite amortized over >=32 iterations,
            # keeps the dedup anti-join a bounded-fan-in union at the
            # 1000-iteration design point)
            if len(seen_parts) > cfg.seen_compact_parts:
                if cfg.bucketed_seen:
                    old = seen_table
                    seen_table = write_seen_table(seen_view(), it)
                    seen_table_buckets = cfg.seen_buckets
                    seen_parts = []
                    if old is not None:
                        spark.sql(f"DROP TABLE IF EXISTS {old}")
                else:
                    seen_view().write.mode("overwrite").parquet(
                        f"{root}/seen/compact={it}"
                    )
                    seen_parts = [f"{root}/seen/compact={it}"]
                seen = seen_view()

        if it % cfg.checkpoint_every == 0:
            ckpt.save_manifest(
                it,
                {
                    "frontier_parts": frontier_parts,
                    "consumed_parts": consumed_parts,
                    "seen_parts": seen_parts,
                    "fetched_paths": fetched_paths,
                    "errors_paths": errors_paths,
                    "downloads_paths": downloads_paths,
                    "n_frontier": n_frontier,
                    "seen_table": seen_table,
                    # layout the CURRENT table's files were written with
                    "seen_table_buckets": seen_table_buckets if seen_table else None,
                    "seen_table_path": (
                        f"{root}/seen_bucketed/v={seen_table.rsplit('_v', 1)[1]}"
                        if seen_table
                        else None
                    ),
                },
            )
        it += 1

    fetched_schema = (
        FRONTIER_SCHEMA + ", status int, rank int, target_url string, iter int"
    )
    empty = spark.createDataFrame([], fetched_schema)
    empty_frontier = spark.createDataFrame([], FRONTIER_SCHEMA)
    return CrawlRunResult(
        # explicit schema: iteration dirs may be empty (no part files)
        fetched=spark.read.schema(fetched_schema).parquet(*fetched_paths)
        if fetched_paths
        else empty,
        seen=seen,
        frontier=frontier_view() if not exhausted else empty_frontier,
        errors=spark.read.schema(ERRORS_SCHEMA).parquet(*errors_paths)
        if errors_paths
        else spark.createDataFrame([], ERRORS_SCHEMA),
        downloads=spark.read.parquet(*downloads_paths) if downloads_paths else None,
        metrics=metrics,
        iterations=it - start_iter,
    )
