"""Paged lazy frontier generator (PagingQueueDuplicateRemovedScheduler
.cs:56-155 analog): distributed page -> request generation, claim state
in an atomic manifest, exactly-once across a kill-and-resume."""

from __future__ import annotations

import pyspark.sql.functions as F

from dotnetspider_spark.crawler.loop import seeds_to_frontier
from dotnetspider_spark.operators.frontier import dedup_push
from dotnetspider_spark.sources.paging import PagedFrontierGenerator

PAGE_SIZE = 7
N_PAGES = 10


def _page_rows(page_id: int) -> list[dict]:
    # deterministic per-page request generation (LoadRequests analog);
    # one URL appears on two pages to exercise cross-claim dedup
    rows = [
        {"url": f"http://h{page_id % 3}.example/p{page_id}/r{i}"}
        for i in range(PAGE_SIZE)
    ]
    if page_id == 4:
        rows.append({"url": "http://h0.example/p1/r0"})  # dup of page 1
    return rows


def _drain(spark, gen, state_dir, stop_after=None, crash_before_complete=False):
    """Claim/push/complete loop; optionally stop early or 'crash' after
    pushing a claim but before completing it."""
    n_claims = 0
    while True:
        nxt = gen.claim_next()
        if nxt is None:
            return n_claims
        claim, seeds = nxt
        fresh = seeds_to_frontier(seeds)
        try:
            seen = spark.read.parquet(f"{state_dir}/seen").select("identity")
            fresh = dedup_push(fresh, seen)
        except Exception:
            pass  # first claim: no seen yet
        fresh.write.mode("append").parquet(f"{state_dir}/frontier")
        fresh.select("identity").write.mode("append").parquet(f"{state_dir}/seen")
        n_claims += 1
        if crash_before_complete and n_claims == stop_after:
            return n_claims  # crash: claim pushed but NOT completed
        gen.complete(claim)
        if stop_after is not None and n_claims >= stop_after:
            return n_claims


def _expected_urls():
    urls = set()
    for p in range(N_PAGES):
        urls |= {r["url"] for r in _page_rows(p)}
    return urls


def test_paged_generation_is_lazy_and_complete(spark, tmp_path):
    state = str(tmp_path / "pg")
    gen = PagedFrontierGenerator(spark, N_PAGES, _page_rows, state, pages_per_claim=3)
    # lazy: each claim materializes only pages_per_claim * page_size rows
    claim, seeds = gen.claim_next()
    assert (claim.page_lo, claim.page_hi) == (0, 3)
    assert seeds.count() == 3 * PAGE_SIZE
    gen.complete(claim)
    _drain(spark, gen, state)
    # drain the first claim's rows too (it was completed pre-drain)
    first = seeds_to_frontier(seeds)
    got = {
        r.url
        for r in spark.read.parquet(f"{state}/frontier").select("url").collect()
    } | {r.url for r in first.select("url").collect()}
    assert got == _expected_urls()


def test_kill_and_resume_generates_exactly_once(spark, tmp_path):
    state = str(tmp_path / "pg2")
    gen = PagedFrontierGenerator(spark, N_PAGES, _page_rows, state, pages_per_claim=2)
    # run 3 claims but CRASH before completing the 3rd: its rows are
    # already pushed, the manifest says it isn't done
    _drain(spark, gen, state, stop_after=3, crash_before_complete=True)
    # restart from the manifest: the incomplete claim is REGENERATED
    gen2 = PagedFrontierGenerator(spark, N_PAGES, _page_rows, state, pages_per_claim=2)
    assert gen2.remaining_pages() == N_PAGES - 4  # two completed claims
    _drain(spark, gen2, state)
    frontier = spark.read.parquet(f"{state}/frontier")
    # exactly-once: every request exactly one row, nothing lost, nothing
    # doubled (the regenerated claim's rows were dropped by dedup_push)
    assert {r.url for r in frontier.select("url").collect()} == _expected_urls()
    assert frontier.count() == frontier.select("identity").distinct().count()
    # the deliberate cross-page duplicate collapsed to one row
    assert (
        frontier.filter(F.col("url") == "http://h0.example/p1/r0").count() == 1
    )
