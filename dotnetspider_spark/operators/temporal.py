"""Temporal / order-statistics operators.

Two primitives a crawl warehouse needs constantly and plain SQL makes
awkward at scale:

- ``asof_join``: join each fact row to the most recent dimension
  snapshot at-or-before its timestamp (config-as-of-fetch, robots
  snapshot in force when a URL was fetched, price/quota in force when
  a batch was planned). The reference resolves this implicitly — its
  single process mutates ``Site``/config in place, so "the config at
  fetch time" is just the current object (Spider.cs run loop); a
  distributed engine must reconstruct it from a snapshot log.
- ``exact_quantiles``: exact per-group order statistics (p50/p90/p99
  fetch latency per host) without a global sort and without the
  approximation of ``percentile_approx`` — monitor-grade numbers the
  reference prints from in-memory lists (SpiderMonitor counters).

Both are pure DataFrame compositions — no UDFs, fully codegen'd.

Scale notes (the part that matters at 10^10 rows):

- ``asof_join`` is the UNION + running-``last`` formulation, NOT a
  range join: a range/theta join on ``l.ts >= r.ts`` explodes to
  O(|L| x |R|) per key before aggregation, while the union sorts each
  key's merged timeline once — one shuffle on the key, O((|L|+|R|)
  log) per partition, zero row amplification. Snapshot logs are tiny
  next to fact streams, so the union adds ~nothing to the shuffle.
- ``exact_quantiles`` ranks within each group (one shuffle on the
  group key) and joins the tiny per-group counts back broadcast — the
  full-detail side is never re-shuffled a second time and never
  globally sorted. Per-host cardinalities are politeness-bounded
  (a host fetched every ``delay`` ms for a year is ~10^7 rows), so a
  per-key window holds; for truly unbounded keys switch the caller to
  a salted two-level variant as in frontier.select_fetch_batch.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "exact_quantiles"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: Sequence[str] = (),
) -> DataFrame:
    """Backward (inclusive) as-of join: every ``left`` row picks up the
    ``payload`` columns of the latest ``right`` row with the same
    ``key`` and ``right_ts <= left_ts``; rows with no such snapshot get
    NULL payloads (left-outer semantics, matching DuckDB/pandas
    ``ASOF LEFT JOIN``).

    Contract: ``right`` has at most one row per (key, right_ts) —
    collapse duplicates upstream (the oracle and tests do the same), a
    tie inside one timestamp has no defined "latest". Equal timestamps
    on the two sides match (inclusive): the union sorts right rows
    before left rows within a timestamp.

    Shape: union the two sides tagged 0/1, one window per key ordered
    by (ts, side) carrying ``last(payload, ignorenulls)`` — a single
    hash shuffle on ``key``, no row amplification (vs the O(|L|x|R|)
    blowup of the naive ``l.ts >= r.ts`` theta join that AQE cannot
    save). Payload rides as one struct so the running ``last`` is a
    single column regardless of arity.
    """
    payload = list(payload) or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    pstruct = F.struct(*[F.col(c) for c in payload])
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        pstruct.alias("__p"),
    )
    ptype = r.schema["__p"].dataType
    l = left.select(
        "*",
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(ptype).alias("__p"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__p", ignorenulls=True).over(w))
    out = matched.filter(F.col("__side") == 1)
    cols = [F.col(c) for c in left.columns]
    cols += [F.col("__m")[c].alias(c) for c in payload]
    return out.select(*cols)


def exact_quantiles(
    df: DataFrame,
    group: str,
    value: str,
    ps: Sequence[float] = (0.5, 0.9, 0.99),
    tie_break: str | None = None,
) -> DataFrame:
    """Exact per-group discrete quantiles: for each p, the value at
    1-indexed rank ``ceil(p * n)`` within the group's ascending sort —
    the classic "lower" discrete quantile (SQL ``quantile_disc``), no
    interpolation, so the result is always an observed value and the
    definition is engine-portable (the DuckDB oracle states the same
    window expression rather than trusting a builtin to agree).

    Shape: rank with one window shuffle on ``group`` (``tie_break``
    only fixes WHICH duplicate row is at a rank — the value at the
    rank is order-independent), agg the per-group counts from the same
    pass, keep only rows whose rank hits a requested quantile index.
    The count side is |groups| rows — broadcast back, detail side
    shuffles exactly once, nothing is globally sorted.
    """
    order = [F.col(value)] + ([F.col(tie_break)] if tie_break else [])
    w = Window.partitionBy(group).orderBy(*order)
    ranked = df.select(
        F.col(group), F.col(value), F.row_number().over(w).alias("__rn")
    )
    counts = df.groupBy(group).agg(F.count(F.lit(1)).alias("__n"))
    j = ranked.join(F.broadcast(counts), group)
    picks = None
    for p in ps:
        hit = F.col("__rn") == F.ceil(F.lit(float(p)) * F.col("__n"))
        picks = hit if picks is None else (picks | hit)
    hits = j.filter(picks)
    agg = [
        F.min(
            F.when(
                F.col("__rn") == F.ceil(F.lit(float(p)) * F.col("__n")),
                F.col(value),
            )
        ).alias(f"p{str(p)[2:].ljust(2, '0')}")
        for p in ps
    ]
    return hits.groupBy(group).agg(
        F.max("__n").cast("long").alias("n"), *agg
    )
