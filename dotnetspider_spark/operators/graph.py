"""Distributed connected components — the near-dup clustering stage.

A 100 TB dedup pipeline ends with CLUSTERING: MinHash/SimHash candidate
pairs (operators/textdedup.py) form a graph whose connected components
are the duplicate groups; one canonical document per component survives.
The reference has no analog (its dedup is per-request identity), so this
is a driver-mandate training-data operator.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — public):

- large-star: per node u over the SYMMETRIC adjacency, connect every
  strictly-larger neighbor to m(u) = min(Γ(u) ∪ {u});
- small-star: per node u over edges directed high→low, connect every
  smaller-or-equal neighbor (and u itself) to m(u);

iterated to a fixpoint, at which every component is a star centered on
its minimum node id. Converges in O(log² n) rounds (2-3 in practice for
near-dup graphs, whose components are band-collision cliques), each
round two shuffles keyed on node ids — no vertex ever sees more than its
own adjacency, no driver-side graph state.

State between rounds is parquet-round-tripped (same Spark 4
localCheckpoint-stats-compounding hazard the crawl loop documents —
loop.py ``crawl`` docstring); the convergence check reads one count plus
an order-independent xxhash64 aggregate, not a set comparison.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _drop_stale(path: str) -> None:
    """Delete a superseded iteration snapshot so iterative state stays
    bounded at ~2 copies instead of one per round (a 25-round CC over a
    large graph would otherwise keep 26 full edge-set snapshots on
    disk). Local paths only — the mkdtemp default; callers passing a
    remote state_dir manage their own retention."""
    import os
    import shutil

    if os.path.isdir(path):
        shutil.rmtree(path, ignore_errors=True)


def _canon(edges: DataFrame, a: str, b: str) -> DataFrame:
    """Distinct undirected edges as (hi, lo), self-loops dropped."""
    return (
        edges.select(
            F.greatest(F.col(a), F.col(b)).alias("hi"),
            F.least(F.col(a), F.col(b)).alias("lo"),
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """(hi,lo) edges -> for each u, attach strictly-larger neighbors to
    min(Γ(u) ∪ {u})."""
    sym = edges.select(F.col("hi").alias("u"), F.col("lo").alias("v")).unionAll(
        edges.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    )
    m = sym.groupBy("u").agg(F.min("v").alias("__mn")).select(
        "u", F.least(F.col("__mn"), F.col("u")).alias("m")
    )
    return (
        sym.filter(F.col("v") > F.col("u"))
        .join(m, "u")
        .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """(hi,lo) edges -> for each u, attach all smaller neighbors and u
    itself to min(Γ⁻(u) ∪ {u}) = min(lo) (lo < hi always here)."""
    m = edges.groupBy("hi").agg(F.min("lo").alias("m"))
    with_m = edges.join(m, "hi")
    attach_lo = with_m.select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
    attach_hi = m.select(F.col("hi"), F.col("m").alias("lo"))
    return (
        attach_lo.unionAll(attach_hi)
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
    )


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        # bit_xor: order-independent set digest with no ANSI overflow
        # (edges are distinct, so xor-cancellation needs a hash collision)
        F.coalesce(F.bit_xor(F.xxhash64("hi", "lo")), F.lit(0)).alias("h"),
    ).first()
    return int(row.n), int(row.h)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
    state_dir: str | None = None,
) -> DataFrame:
    """Label every vertex of the undirected graph with its component's
    MINIMUM vertex id. Returns (id, component); isolated vertices absent
    from ``edges`` are absent from the result (union them in with
    component=id if needed — they never shuffle here).
    """
    spark = edges.sparkSession
    root = state_dir or tempfile.mkdtemp(prefix="spark-cc-state-")
    cur = _canon(edges, src, dst)
    cur.write.mode("overwrite").parquet(f"{root}/iter=0")
    cur = spark.read.parquet(f"{root}/iter=0")
    fp = _fingerprint(cur)
    for it in range(1, max_iterations + 1):
        nxt = _small_star(_large_star(cur))
        nxt.write.mode("overwrite").parquet(f"{root}/iter={it}")
        nxt = spark.read.parquet(f"{root}/iter={it}")
        _drop_stale(f"{root}/iter={it - 1}")  # consumed by the write above
        nfp = _fingerprint(nxt)
        cur = nxt
        if nfp == fp:
            break
        fp = nfp
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iterations} rounds")
    # fixpoint = stars: (hi, lo=root). Roots label themselves.
    members = cur.select(F.col("hi").alias("id"), F.col("lo").alias("component"))
    roots = cur.select(F.col("lo").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    return members.unionByName(roots).distinct()


def dedup_keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Near-dup dedup tail: candidate pairs -> components -> keep the
    minimum-id document per duplicate group (plus every unpaired doc).
    The anti-join side carries only ids — document text never shuffles."""
    cc = connected_components(pairs, src=src, dst=dst)
    losers = cc.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 10,
    damping: float = 0.85,
    state_dir: str | None = None,
    tol: float | None = None,
) -> DataFrame:
    """PageRank power iteration over the crawl link graph (Page & Brin
    1998) — the classic frontier-prioritization signal (feed the scores
    into ``select_fetch_batch(priority_first=True)``).

    Standard formulation with dangling-mass redistribution: every node
    starts at 1/N; each iteration
    ``rank(v) = (1-d)/N + d * (Σ_{u→v} rank(u)/out(u) + dangling/N)``
    where ``dangling`` is the total rank of nodes with no out-links.

    Scale shape: per iteration one join keyed on ``src`` (contribs) and
    one aggregation keyed on ``dst`` — both partition-parallel on node
    ids; the dangling mass is a single scalar aggregate. State is
    parquet-round-tripped between iterations (the Spark-4 checkpoint
    stats-compounding hazard the CC operator documents). Returns
    (id, rank) over all nodes appearing as src or dst.

    ``tol``: optional L1 convergence stop — iteration ends early when
    ``Σ|rank_t - rank_{t-1}| < tol`` (one extra scalar aggregate per
    iteration over the already-joined old/new ranks, the same pattern
    as the CC fingerprint; ``n_iter`` stays the hard cap).
    """
    spark = edges.sparkSession
    root = state_dir or tempfile.mkdtemp(prefix="spark-pr-state-")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e.write.mode("overwrite").parquet(f"{root}/edges")
    e = spark.read.parquet(f"{root}/edges")
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    nodes.write.mode("overwrite").parquet(f"{root}/nodes")
    nodes = spark.read.parquet(f"{root}/nodes")
    n = nodes.count()
    if n == 0:  # no links extracted: empty scores, not a ZeroDivisionError
        return nodes.withColumn("rank", F.lit(0.0))
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    deg.write.mode("overwrite").parquet(f"{root}/deg")
    deg = spark.read.parquet(f"{root}/deg")

    ranks = nodes.select("id", F.lit(1.0 / n).alias("rank"))
    for it in range(1, n_iter + 1):
        # persisted: consumed by TWO actions per iteration (the dangling
        # scalar and the ranks write) — unpersisted, the rank-deg join
        # would execute twice per round
        with_deg = (
            ranks.join(deg, ranks["id"] == deg["src"], "left")
            .select("id", "rank", "out_deg")
            .persist()
        )
        try:
            dangling = (
                with_deg.filter(F.col("out_deg").isNull())
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                .first()[0]
            )
            contribs = (
                e.join(with_deg.filter(F.col("out_deg").isNotNull()),
                       e["src"] == F.col("id"))
                .select(F.col("dst").alias("id"),
                        (F.col("rank") / F.col("out_deg")).alias("c"))
                .groupBy("id")
                .agg(F.sum("c").alias("contrib"))
            )
            base = (1.0 - damping) / n + damping * dangling / n
            new_ranks = nodes.join(contribs, "id", "left").select(
                "id",
                (F.lit(base)
                 + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))).alias("rank"),
            )
            new_ranks.write.mode("overwrite").parquet(f"{root}/iter={it}")
            new_ranks = spark.read.parquet(f"{root}/iter={it}")
            if tol is not None:
                # L1 delta vs previous ranks: one join keyed on id over
                # two parquet-backed sides, one scalar agg
                delta = (
                    new_ranks.select("id", F.col("rank").alias("__new"))
                    .join(ranks.select("id", F.col("rank").alias("__old")),
                          "id")
                    .agg(F.sum(F.abs(F.col("__new") - F.col("__old"))))
                    .first()[0]
                )
                ranks = new_ranks
                if delta is not None and delta < tol:
                    _drop_stale(f"{root}/iter={it - 1}")
                    break  # finally still unpersists with_deg
            else:
                ranks = new_ranks
        finally:
            with_deg.unpersist()
        _drop_stale(f"{root}/iter={it - 1}")
    return ranks


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 10,
    state_dir: str | None = None,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over the crawl link
    graph — PageRank's query-independent companion: authorities are
    pages many good hubs point AT (fetch-priority signal for content
    pages), hubs are pages that point at many good authorities
    (priority signal for index/listing pages a crawler should keep
    fresh).

    Standard mutual recursion with L1 normalization each half-step so
    scores stay a distribution (L1 keeps the oracle portable — the sum
    is one scalar aggregate and needs no sqrt):

    ``auth'(v) = Σ_{u→v} hub(u)``, then ``auth = auth'/Σauth'``;
    ``hub'(u)  = Σ_{u→v} auth(v)``, then ``hub = hub'/Σhub'``.

    Scale shape per iteration: two joins keyed on node id against the
    (deduped) edge table and two node-keyed aggregations — all
    partition-parallel, plus two scalar normalization aggregates.
    State is parquet-round-tripped between iterations (the same
    Spark-4 checkpoint-stats hazard :func:`pagerank` documents).
    Isolated nodes (no in/out links among src∪dst) keep score 0 on
    the missing side via the left-join coalesce.

    Returns (id, auth, hub) over all nodes appearing as src or dst.
    """
    spark = edges.sparkSession
    root = state_dir or tempfile.mkdtemp(prefix="spark-hits-state-")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e.write.mode("overwrite").parquet(f"{root}/edges")
    e = spark.read.parquet(f"{root}/edges")
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    nodes.write.mode("overwrite").parquet(f"{root}/nodes")
    nodes = spark.read.parquet(f"{root}/nodes")
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "id", F.lit(0.0).alias("auth"), F.lit(0.0).alias("hub")
        )

    state = nodes.select(
        "id", F.lit(1.0 / n).alias("auth"), F.lit(1.0 / n).alias("hub")
    )
    for it in range(1, n_iter + 1):
        # auth half-step: sum inbound hub mass per dst
        auth_raw = (
            e.join(state.select(F.col("id").alias("src"), "hub"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("hub").alias("__a"))
        )
        auth_n = nodes.join(auth_raw, "id", "left").select(
            "id", F.coalesce("__a", F.lit(0.0)).alias("__a")
        ).persist()  # consumed by the scalar sum AND the hub half-step
        try:
            a_tot = auth_n.agg(F.sum("__a")).first()[0] or 1.0
            auth = auth_n.select(
                "id", (F.col("__a") / F.lit(a_tot)).alias("auth")
            )
            # hub half-step: sum outbound (new) auth mass per src
            hub_raw = (
                e.join(auth.select(F.col("id").alias("dst"), "auth"), "dst")
                .groupBy(F.col("src").alias("id"))
                .agg(F.sum("auth").alias("__h"))
            )
            hub_n = nodes.join(hub_raw, "id", "left").select(
                "id",
                F.coalesce("__h", F.lit(0.0)).alias("__h"),
            ).persist()
            try:
                h_tot = hub_n.agg(F.sum("__h")).first()[0] or 1.0
                new_state = auth.join(
                    hub_n.select(
                        "id", (F.col("__h") / F.lit(h_tot)).alias("hub")
                    ),
                    "id",
                )
                new_state.write.mode("overwrite").parquet(f"{root}/iter={it}")
                state = spark.read.parquet(f"{root}/iter={it}")
            finally:
                hub_n.unpersist()
        finally:
            auth_n.unpersist()
        _drop_stale(f"{root}/iter={it - 1}")
    return state


def opic(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 2,
    state_dir: str | None = None,
) -> DataFrame:
    """OPIC — On-line Page Importance Computation (Abiteboul, Preda &
    Cobena, WWW 2003), the frontier-prioritization signal designed FOR
    crawlers: unlike PageRank it needs no convergence before being
    useful, so a crawl can rank its frontier from the very first
    iterations. This is the batch (synchronous) variant: every node
    starts with cash ``1/N``; each iteration banks the node's current
    cash into its history, then distributes that cash equally across
    its out-links, with the cash of dangling nodes (no out-links)
    redistributed uniformly to all nodes:

    ``history'(v) = history(v) + cash(v)``
    ``cash'(v)    = Σ_{u→v} cash(u)/out(u) + dangling/N``

    Importance estimate after k iterations is ``(history + cash)``
    normalized by total banked mass — returned as ``importance`` so the
    caller can feed it straight into
    ``select_fetch_batch(priority_first=True)``.

    Scale shape per iteration (same discipline as :func:`pagerank`):
    one join keyed on ``src`` and one aggregation keyed on ``dst`` —
    partition-parallel on node ids; dangling mass is a single scalar
    aggregate; state parquet-round-trips between iterations (the
    Spark-4 checkpoint stats-compounding hazard the CC operator
    documents). No driver-side graph state at any point.

    Returns (id, cash, history, importance) over all src∪dst nodes.
    """
    spark = edges.sparkSession
    root = state_dir or tempfile.mkdtemp(prefix="spark-opic-state-")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e.write.mode("overwrite").parquet(f"{root}/edges")
    e = spark.read.parquet(f"{root}/edges")
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    nodes.write.mode("overwrite").parquet(f"{root}/nodes")
    nodes = spark.read.parquet(f"{root}/nodes")
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "id",
            F.lit(0.0).alias("cash"),
            F.lit(0.0).alias("history"),
            F.lit(0.0).alias("importance"),
        )
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    deg.write.mode("overwrite").parquet(f"{root}/deg")
    deg = spark.read.parquet(f"{root}/deg")

    state = nodes.select(
        "id", F.lit(1.0 / n).alias("cash"), F.lit(0.0).alias("history")
    )
    for it in range(1, n_iter + 1):
        with_deg = (
            state.join(deg, state["id"] == deg["src"], "left")
            .select("id", "cash", "history", "out_deg")
            .persist()  # consumed by the dangling scalar AND the state write
        )
        try:
            dangling = (
                with_deg.filter(F.col("out_deg").isNull())
                .agg(F.coalesce(F.sum("cash"), F.lit(0.0)))
                .first()[0]
            )
            contribs = (
                e.join(
                    with_deg.filter(F.col("out_deg").isNotNull()).select(
                        F.col("id").alias("src"), "cash", "out_deg"
                    ),
                    "src",
                )
                .select(
                    F.col("dst").alias("id"),
                    (F.col("cash") / F.col("out_deg")).alias("c"),
                )
                .groupBy("id")
                .agg(F.sum("c").alias("contrib"))
            )
            new_state = (
                with_deg.select("id", "cash", "history")
                .join(contribs, "id", "left")
                .select(
                    "id",
                    (
                        F.coalesce("contrib", F.lit(0.0))
                        + F.lit(dangling / n)
                    ).alias("cash"),
                    (F.col("history") + F.col("cash")).alias("history"),
                )
            )
            new_state.write.mode("overwrite").parquet(f"{root}/iter={it}")
            state = spark.read.parquet(f"{root}/iter={it}")
        finally:
            with_deg.unpersist()
        _drop_stale(f"{root}/iter={it - 1}")
    # total banked+pending mass is exactly (n_iter+1) * initial total = a
    # constant, but compute it from the state so truncation error matches
    # the oracle's same-order arithmetic
    total = state.agg(
        F.sum(F.col("history") + F.col("cash")).alias("__t")
    )
    return state.crossJoin(F.broadcast(total)).select(
        "id",
        "cash",
        "history",
        ((F.col("history") + F.col("cash")) / F.col("__t")).alias("importance"),
    )


def trustrank(
    edges: DataFrame,
    trusted: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 10,
    damping: float = 0.85,
    state_dir: str | None = None,
    tol: float | None = None,
) -> DataFrame:
    """TrustRank — personalized PageRank whose teleport vector is a
    curated whitelist (Gyongyi, Garcia-Molina & Pedersen, VLDB 2004):
    trust flows out from known-good seed hosts, so link-spam farms that
    inflate plain PageRank score near zero. The frontier composition is
    the same as ``pagerank``: feed scores into
    ``select_fetch_batch(priority_first=True)`` (or demote hosts below
    a trust floor).

    Formulation: ``t(v) = 1/|S|`` for seeds (intersected with the graph
    — trust cannot be parked on absent ids), else 0; ``r_0 = t``;
    ``r_{k+1}(v) = (1-d)·t(v) + d·(Σ_{u→v} r_k(u)/out(u) +
    dangling_k·t(v))`` — dangling mass teleports back through the
    trust vector, the personalized-PageRank treatment.

    Scale shape is identical to ``pagerank`` (one src-keyed join + one
    dst-keyed agg per iteration, scalar dangling agg, parquet-round-
    tripped state); the trust vector rides the node table as one extra
    double column. ``trusted``: DataFrame whose first column holds the
    seed node ids. ``tol``: optional L1 early stop, ``n_iter`` caps.
    """
    spark = edges.sparkSession
    root = state_dir or tempfile.mkdtemp(prefix="spark-tr-state-")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e.write.mode("overwrite").parquet(f"{root}/edges")
    e = spark.read.parquet(f"{root}/edges")
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    seed_ids = trusted.select(
        F.col(trusted.columns[0]).cast("string").alias("id")
    ).distinct()
    in_graph = nodes.join(seed_ids, "id", "left_semi")
    trust = nodes.join(
        in_graph.withColumn("__seed", F.lit(1)), "id", "left"
    )
    trust.write.mode("overwrite").parquet(f"{root}/trust_raw")
    trust = spark.read.parquet(f"{root}/trust_raw")
    s = trust.filter(F.col("__seed").isNotNull()).count()
    if s == 0:
        raise ValueError("trustrank: no trusted seed appears in the graph")
    trust = trust.select(
        "id",
        F.when(F.col("__seed").isNotNull(), F.lit(1.0 / s))
        .otherwise(F.lit(0.0))
        .alias("tv"),
    )
    trust.write.mode("overwrite").parquet(f"{root}/trust")
    trust = spark.read.parquet(f"{root}/trust")
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    deg.write.mode("overwrite").parquet(f"{root}/deg")
    deg = spark.read.parquet(f"{root}/deg")

    ranks = trust.select("id", F.col("tv").alias("rank"))
    for it in range(1, n_iter + 1):
        with_deg = (
            ranks.join(deg, ranks["id"] == deg["src"], "left")
            .select("id", "rank", "out_deg")
            .persist()
        )
        try:
            dangling = (
                with_deg.filter(F.col("out_deg").isNull())
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                .first()[0]
            )
            contribs = (
                e.join(with_deg.filter(F.col("out_deg").isNotNull()),
                       e["src"] == F.col("id"))
                .select(F.col("dst").alias("id"),
                        (F.col("rank") / F.col("out_deg")).alias("c"))
                .groupBy("id")
                .agg(F.sum("c").alias("contrib"))
            )
            teleport = (1.0 - damping) + damping * dangling
            new_ranks = trust.join(contribs, "id", "left").select(
                "id",
                (F.lit(teleport) * F.col("tv")
                 + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))
                 ).alias("rank"),
            )
            new_ranks.write.mode("overwrite").parquet(f"{root}/iter={it}")
            new_ranks = spark.read.parquet(f"{root}/iter={it}")
            if tol is not None:
                delta = (
                    new_ranks.select("id", F.col("rank").alias("__new"))
                    .join(ranks.select("id", F.col("rank").alias("__old")),
                          "id")
                    .agg(F.sum(F.abs(F.col("__new") - F.col("__old"))))
                    .first()[0]
                )
                ranks = new_ranks
                if delta is not None and delta < tol:
                    _drop_stale(f"{root}/iter={it - 1}")
                    break
            else:
                ranks = new_ranks
        finally:
            with_deg.unpersist()
        _drop_stale(f"{root}/iter={it - 1}")
    return ranks
