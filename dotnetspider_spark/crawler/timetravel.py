"""Snapshot time travel over the crawl checkpoint — the Iceberg
``VERSION AS OF`` / ``expire_snapshots`` analog for the delta-parquet
state layout.

The loop checkpoints every iteration: state tables are append-only
parquet part dirs (compaction writes NEW dirs and merely drops old
ones from the CURRENT manifest's lists — files stay), and
``Checkpointer.save_manifest`` now also writes an append-only
``manifests/iter=N.json`` per checkpoint. Together those give real
snapshot isolation: any retained manifest reconstructs the exact
frontier / seen / fetched state after iteration N, long after the
crawl moved on — audits ("what did the frontier look like when the
trap hit?"), incremental diffing (:func:`operators.frontier
.crawl_delta` between two snapshots), and point-in-time restarts all
read history without replaying it.

The reference has no analog — its scheduler state is process memory,
gone on exit (QueueDuplicateRemovedScheduler.cs holds a List + HashSet);
the Broker design persists only the CURRENT queue. Snapshot history is
what the distributed re-expression adds, per the north rule's
"checkpointed snapshots carrying per-partition lineage + metrics".

Scale notes: a snapshot read costs exactly what a resume costs — the
manifest's part lists are opened directly (column-pruned parquet
reads), nothing is copied at snapshot time. Retention is the only real
cost (un-expired parts hold disk), which is what
:func:`expire_snapshots` bounds — delete-by-unreference, never
delete-by-age-of-file, so a kept manifest can never dangle.
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

from dotnetspider_spark.crawler.loop import FRONTIER_SCHEMA

__all__ = [
    "list_snapshots",
    "load_snapshot_manifest",
    "frontier_as_of",
    "seen_as_of",
    "fetched_as_of",
    "expire_snapshots",
]

_MANIFEST_RE = re.compile(r"^iter=(\d+)\.json$")

#: state-table subdirs that compaction supersedes (expiry candidates);
#: fact logs (fetched/errors/metrics/downloads) are never compacted
#: away, so every live manifest references their full history and
#: unreference-based expiry leaves them alone by construction.
_STATE_SUBDIRS = (
    "frontier",
    "fresh",
    "consumed",
    "seen",
    "seen_extra",
    "seen_bucketed",
)


def list_snapshots(root: str) -> list[int]:
    """Iterations with a retained versioned manifest, ascending."""
    d = f"{root}/manifests"
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        m = _MANIFEST_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def load_snapshot_manifest(root: str, iteration: int) -> dict:
    """The exact manifest checkpointed at ``iteration`` (no
    nearest-match fallback: with the default checkpoint_every=1 every
    iteration has one, and a sparser cadence should fail loudly rather
    than silently answer for a different iteration)."""
    path = f"{root}/manifests/iter={iteration}.json"
    try:
        with open(path) as f:
            return json.load(f)
    except FileNotFoundError:
        have = list_snapshots(root)
        raise ValueError(
            f"no snapshot manifest for iteration {iteration} under {root} "
            f"(retained: {have})"
        ) from None


def frontier_as_of(
    spark: SparkSession, root: str, iteration: int
) -> DataFrame:
    """The PENDING frontier exactly as iteration ``iteration+1`` would
    have seen it: fresh parts anti-joined against consumed identities,
    the same reconstruction a resume performs."""
    m = load_snapshot_manifest(root, iteration)
    fr = spark.read.schema(FRONTIER_SCHEMA).parquet(*m["frontier_parts"])
    if m["consumed_parts"]:
        cons = spark.read.schema("identity string").parquet(
            *m["consumed_parts"]
        )
        fr = fr.join(cons, "identity", "left_anti")
    return fr


def seen_as_of(spark: SparkSession, root: str, iteration: int) -> DataFrame:
    """The seen identity set after iteration ``iteration`` (1 column).

    Bucketed-seen snapshots are read by PATH, not via the catalog: the
    loop drops superseded table NAMES (metadata only — the tables are
    external, files stay), and a path read needs no bucket metadata
    because time travel only unions/inspects, it doesn't anti-join."""
    m = load_snapshot_manifest(root, iteration)
    parts: list[DataFrame] = []
    if m.get("seen_table_path"):
        parts.append(
            spark.read.schema("identity string").parquet(m["seen_table_path"])
        )
    if m["seen_parts"]:
        parts.append(
            spark.read.schema("identity string").parquet(*m["seen_parts"])
        )
    if not parts:
        return spark.createDataFrame([], "identity string")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def fetched_as_of(
    spark: SparkSession, root: str, iteration: int
) -> DataFrame | None:
    """All rows fetched in iterations <= ``iteration`` (the fact log's
    prefix, read from the manifest's path list); None before the first
    fetch."""
    m = load_snapshot_manifest(root, iteration)
    if not m["fetched_paths"]:
        return None
    return spark.read.parquet(*m["fetched_paths"])


def expire_snapshots(root: str, keep_last: int = 2) -> dict:
    """Reclaim history: keep the newest ``keep_last`` versioned
    manifests (the current ``_MANIFEST.json`` twin is always among
    them — it is the newest), delete older manifest files, then delete
    any STATE part dir no kept manifest references. Fact-log dirs
    (fetched/errors/metrics/downloads) are only ever deleted if
    unreferenced too — which, being append-only lists, cannot happen
    while any manifest survives.

    Returns {"kept": [iters], "deleted_manifests": n, "deleted_dirs":
    [paths]} for the caller's audit log. Delete-by-unreference only: a
    kept snapshot remains fully readable afterwards (the test pins
    this)."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    snaps = list_snapshots(root)
    keep = snaps[-keep_last:]
    drop = snaps[: -keep_last] if keep_last < len(snaps) else []

    referenced: set[str] = set()
    for it in keep:
        m = load_snapshot_manifest(root, it)
        for key in (
            "frontier_parts",
            "consumed_parts",
            "seen_parts",
            "fetched_paths",
            "errors_paths",
            "downloads_paths",
        ):
            # realpath, not normpath: manifests may record the root as
            # written at CRAWL time ("./ckpt") while expire is called
            # with an absolute or symlinked spelling — a string compare
            # would find nothing referenced and delete state the kept
            # snapshots still need. realpath alone cannot anchor a
            # RELATIVE manifest path recorded under a different cwd, so
            # the (state-subdir, child) suffix rides along as a second
            # key — under-deleting is the safe direction here.
            for p in m.get(key) or []:
                referenced.add(os.path.realpath(p))
                parts = os.path.normpath(p).split(os.sep)
                if len(parts) >= 2:
                    referenced.add((parts[-2], parts[-1]))
        if m.get("seen_table_path"):
            p = m["seen_table_path"]
            referenced.add(os.path.realpath(p))
            parts = os.path.normpath(p).split(os.sep)
            if len(parts) >= 2:
                referenced.add((parts[-2], parts[-1]))

    deleted_dirs: list[str] = []
    for sub in _STATE_SUBDIRS:
        base = f"{root}/{sub}"
        if not os.path.isdir(base):
            continue
        for child in sorted(os.listdir(base)):
            path = f"{base}/{child}"
            if (
                os.path.realpath(path) not in referenced
                and (sub.split(os.sep)[-1], child) not in referenced
            ):
                shutil.rmtree(path, ignore_errors=True)
                deleted_dirs.append(path)

    for it in drop:
        try:
            os.remove(f"{root}/manifests/iter={it}.json")
        except FileNotFoundError:
            pass

    return {
        "kept": keep,
        "deleted_manifests": len(drop),
        "deleted_dirs": deleted_dirs,
    }
