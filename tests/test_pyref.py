"""Oracle self-tests: the reference's own test semantics, ported from the
cited lines (SURVEY §5) and run against the pure-Python oracle. These pin
the oracle; the Spark engine is then pinned against the oracle in
test_crawl.py."""

from __future__ import annotations

from dotnetspider_spark.pyref.oracle import (
    HashSetDuplicateRemover,
    QueueDuplicateRemovedScheduler,
    Request,
    canonicalize,
)


def _push_urls(sched, urls):
    for i, u in enumerate(urls):
        sched.push(Request(url=u, seq=i))


def test_queue_dfs_lifo():
    # QueueSchedulerTest.cs:34-51 — push a,a,a,b -> poll b; left 1; total 2
    s = QueueDuplicateRemovedScheduler(dfs=True)
    _push_urls(s, ["http://a/", "http://a/", "http://a/", "http://b/"])
    assert s.poll().url == "http://b/"
    assert s.left == 1
    assert s.total == 2


def test_queue_bfs_fifo():
    # QueueSchedulerTest.cs:53-71 — push a,b,a,a -> poll a; left 1; total 2
    s = QueueDuplicateRemovedScheduler(dfs=False)
    _push_urls(s, ["http://a/", "http://b/", "http://a/", "http://a/"])
    assert s.poll().url == "http://a/"
    assert s.left == 1
    assert s.total == 2


def test_queue_bulk_unique_counts():
    # QueueSchedulerTest.cs:11-32 analog — 1000 rounds of {a,a,a,b,unique}
    # -> total 1002 unique; after 1000 polls, 2 left
    s = QueueDuplicateRemovedScheduler(dfs=True)
    seq = 0
    for i in range(1000):
        for u in ["http://a/", "http://a/", "http://a/", "http://b/", f"http://u{i}/"]:
            s.push(Request(url=u, seq=seq))
            seq += 1
    assert s.total == 1002
    for _ in range(1000):
        assert s.poll() is not None
    assert s.left == 2


def test_poll_empty_returns_none():
    s = QueueDuplicateRemovedScheduler()
    assert s.poll() is None
    assert s.left == 0


def test_dup_remover_first_false_then_true():
    # HashSetDuplicateRemoverTest.cs:11-39
    r = HashSetDuplicateRemover()
    pattern = [
        r.is_duplicate(Request(url=u))
        for u in ["http://a/", "http://a/", "http://b/", "http://b/"]
    ]
    assert pattern == [False, True, False, True]


def test_identity_invariants():
    # RequestExtensions.cs:12-17 / Design.md:13-20 / RequestTest.cs:68-89
    base = Request(url="http://x/")
    assert base.identity() != Request(url="http://x/", headers={"k": "v"}).identity()
    assert base.identity() != Request(url="http://x/", content="c").identity()
    assert base.identity() != Request(url="http://x/", method="POST").identity()
    assert base.identity() != Request(url="http://x/", retried=1).identity()
    # depth is NOT hashed
    assert (
        Request(url="http://x/", depth=1).identity()
        == Request(url="http://x/", depth=9).identity()
    )
    # null and empty headers hash the same (RequestTest.cs:68-89)
    assert base.identity() == Request(url="http://x/", headers={}).identity()


def test_canonicalize_rules():
    # Selectable.cs:229-241 + Page.cs:121-127,202-222 + CleanPound
    base = "http://h.example/p/1.html"
    assert canonicalize(base, "../p/2.html") == "http://h.example/p/2.html"
    assert canonicalize(base, "/p/3.html") == "http://h.example/p/3.html"
    assert canonicalize(base, "http://other.example/x.html") == "http://other.example/x.html"
    assert canonicalize(base, "p/4.html") == "http://h.example/p/p/4.html"
    assert canonicalize(base, "//h2.example/y.html") == "http://h2.example/y.html"
    assert canonicalize(base, "#frag") is None
    assert canonicalize(base, "") is None
    assert canonicalize(base, "javascript:void(0)") is None
    assert canonicalize(base, "mailto:x@example.com") is None
    assert canonicalize(base, "http://a.example/x.html#sec") == "http://a.example/x.html"


def test_corpus_config_rejects_wrapping_chain():
    import pytest as _pytest

    from dotnetspider_spark.testing.datagen import CorpusConfig

    with _pytest.raises(ValueError, match="redirect_chain_len"):
        CorpusConfig(redirect_every=10, redirect_chain_len=8)
    # boundary: 3 + L == every is allowed
    CorpusConfig(redirect_every=10, redirect_chain_len=7)


def test_pyref_multi_hop_redirect_and_budget():
    """Pure-python oracle semantics for redirect chains: hop identities
    marked seen on success; budget exhaustion -> http_301 error."""
    from dotnetspider_spark.pyref.oracle import Request, crawl as pycrawl
    from dotnetspider_spark.testing.datagen import (
        CorpusConfig, gen_corpus_local, page_url, seed_rows,
    )

    cfg = CorpusConfig(
        n_pages=40, n_hosts=2, redirect_every=11, redirect_chain_len=3,
        with_payload=False,
    )
    local = {r["url"]: r for r in gen_corpus_local(cfg)}
    # find a chain head: a redirecting page whose target also redirects
    heads = [
        u for u, r in local.items()
        if r.get("redirect_to")
        and local.get(r["redirect_to"], {}).get("redirect_to")
    ]
    assert heads, "fixture must contain a multi-hop chain"
    head = heads[0]
    seeds = [Request(url=head, depth=1, seq=0)]
    res = pycrawl(cfg, seeds, dfs=True, max_depth=1)
    assert res.fetch_order == [head]
    # every hop of the chain is individually seen
    cur = local[head]
    while cur.get("redirect_to"):
        nxt = cur["redirect_to"]
        assert Request(url=nxt).identity() in res.seen
        cur = local[nxt]
    # budget exhaustion: 12-hop chain, 10-hop budget
    cfg2 = CorpusConfig(
        n_pages=40, n_hosts=2, redirect_every=16, redirect_chain_len=12,
        with_payload=False,
    )
    local2 = {r["url"]: r for r in gen_corpus_local(cfg2)}

    def chain_len(u):
        n = 0
        while local2.get(u, {}).get("redirect_to"):
            u = local2[u]["redirect_to"]
            n += 1
        return n

    deep = [u for u in local2 if chain_len(u) > 10]
    assert deep, "fixture must contain a chain deeper than the budget"
    res2 = pycrawl(
        cfg2, [Request(url=deep[0], depth=1, seq=0)], dfs=True, max_depth=1
    )
    assert res2.fetch_order == []
    assert [(u, reason) for (u, _r, reason) in res2.errors] == [
        (deep[0], "http_301")
    ]
