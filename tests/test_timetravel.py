"""Snapshot time travel over the crawl checkpoint (crawler/timetravel).

Ground truth: the crawl is deterministic, so the state a FULL run's
snapshot-N reconstructs must equal the final state of an identical run
STOPPED at iteration N. Expiry is delete-by-unreference: kept
snapshots must remain fully readable afterwards.
"""

from __future__ import annotations

import pytest

from dotnetspider_spark.crawler.loop import Checkpointer, CrawlConfig, crawl
from dotnetspider_spark.crawler.timetravel import (
    expire_snapshots,
    fetched_as_of,
    frontier_as_of,
    list_snapshots,
    load_snapshot_manifest,
    seen_as_of,
)
from dotnetspider_spark.testing.datagen import (
    CorpusConfig,
    gen_corpus,
    gen_robots,
    gen_seeds,
)

TINY = CorpusConfig(n_pages=60, n_hosts=4)


@pytest.fixture(scope="module")
def corpus(spark):
    df = gen_corpus(spark, TINY, parallelism=2).cache()
    df.count()
    yield df
    df.unpersist()


def _run(spark, corpus, ck, max_iterations=None):
    kw = dict(dfs=True, max_depth=3, per_host_limit=8, checkpoint_dir=ck)
    if max_iterations is not None:
        kw["max_iterations"] = max_iterations
    return crawl(
        spark,
        corpus,
        gen_seeds(spark, TINY, k=4),
        CrawlConfig(**kw),
        robots=gen_robots(spark, TINY),
    )


def _ids(df):
    return {r.identity for r in df.select("identity").collect()}


def test_snapshot_equals_stopped_run(spark, corpus, tmp_path_factory):
    ck_full = str(tmp_path_factory.mktemp("tt_full"))
    ck_stop = str(tmp_path_factory.mktemp("tt_stop"))
    _run(spark, corpus, ck_full)
    _run(spark, corpus, ck_stop, max_iterations=2)

    it = Checkpointer(spark, ck_stop).last_iter()
    assert it is not None
    # the full run retained a manifest for that same iteration
    assert it in list_snapshots(ck_full)

    assert _ids(frontier_as_of(spark, ck_full, it)) == _ids(
        frontier_as_of(spark, ck_stop, it)
    )
    assert _ids(seen_as_of(spark, ck_full, it)) == _ids(
        seen_as_of(spark, ck_stop, it)
    )
    f_full, f_stop = (
        fetched_as_of(spark, ck_full, it),
        fetched_as_of(spark, ck_stop, it),
    )
    assert (f_full is None) == (f_stop is None)
    if f_full is not None:
        assert {r.url for r in f_full.select("url").collect()} == {
            r.url for r in f_stop.select("url").collect()
        }


def test_snapshots_are_monotone_and_final_matches_result(
    spark, corpus, tmp_path_factory
):
    ck = str(tmp_path_factory.mktemp("tt_mono"))
    res = _run(spark, corpus, ck)
    snaps = list_snapshots(ck)
    assert snaps == sorted(snaps) and len(snaps) >= 2
    seen_sets = [_ids(seen_as_of(spark, ck, it)) for it in snaps]
    for a, b in zip(seen_sets, seen_sets[1:]):
        assert a <= b  # seen set only grows
    assert seen_sets[-1] == _ids(res.seen)
    # final pending frontier of an exhausted crawl is empty
    assert frontier_as_of(spark, ck, snaps[-1]).count() == 0


def test_expire_keeps_newest_readable_and_drops_old(
    spark, corpus, tmp_path_factory
):
    ck = str(tmp_path_factory.mktemp("tt_exp"))
    res = _run(spark, corpus, ck)
    snaps = list_snapshots(ck)
    assert len(snaps) >= 3
    before = _ids(seen_as_of(spark, ck, snaps[-1]))

    out = expire_snapshots(ck, keep_last=1)
    assert out["kept"] == [snaps[-1]]
    assert out["deleted_manifests"] == len(snaps) - 1
    assert list_snapshots(ck) == [snaps[-1]]

    # kept snapshot fully readable after deletion (forces file reads)
    assert _ids(seen_as_of(spark, ck, snaps[-1])) == before == _ids(res.seen)
    assert frontier_as_of(spark, ck, snaps[-1]).count() == 0
    f = fetched_as_of(spark, ck, snaps[-1])
    assert f is not None and f.count() > 0

    # expired snapshots fail loudly, not wrongly
    with pytest.raises(ValueError, match="no snapshot manifest"):
        load_snapshot_manifest(ck, snaps[0])


def test_expire_rejects_keep_zero(tmp_path):
    with pytest.raises(ValueError):
        expire_snapshots(str(tmp_path), keep_last=0)


def test_expire_with_different_root_spelling_keeps_state(
    spark, corpus, tmp_path_factory
):
    """Manifests record paths as spelled at CRAWL time; expiring via a
    relative spelling of the same root must not delete state the kept
    snapshot references (regression: normpath string-compare treated
    every referenced dir as unreferenced)."""
    import os

    ck = str(tmp_path_factory.mktemp("tt_spell"))
    res = _run(spark, corpus, ck)
    snaps = list_snapshots(ck)
    before = _ids(seen_as_of(spark, ck, snaps[-1]))

    cwd = os.getcwd()
    os.chdir(os.path.dirname(ck))
    try:
        rel = os.path.basename(ck)
        expire_snapshots(rel, keep_last=1)
    finally:
        os.chdir(cwd)
    # kept snapshot fully readable through the ORIGINAL absolute root
    assert _ids(seen_as_of(spark, ck, snaps[-1])) == before == _ids(res.seen)
    f = fetched_as_of(spark, ck, snaps[-1])
    assert f is not None and f.count() > 0
