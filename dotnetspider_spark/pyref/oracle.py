"""Pure-Python oracle: the reference's scheduler semantics, reimplemented.

This is the test oracle mandated by SURVEY.md §5/§7.3 — a 1:1 behavioral
port (from the cited lines, not the code) of:

- request identity: MD5(Referer+Origin+Method+Content+Url+retried+
  JSON(Headers)) — RequestExtensions.cs:12-17, invariants Design.md:13-20.
- ``HashSetDuplicateRemover`` — test-and-add exact seen set
  (HashSetDuplicateRemover.cs:25-35).
- ``QueueDuplicateRemovedScheduler`` — dedup-then-enqueue Push
  (DuplicateRemovedScheduler.cs:81-98), Poll DFS=LIFO / BFS=FIFO
  (QueueDuplicateRemovedScheduler.cs:57-91), success/error/total counters
  (:110-131), poll-on-empty returns None.
- the single-threaded crawl loop (Spider.cs:753-831, HandleRequest
  :1095-1210): fetch -> retry-on-transient (retried+1 => NEW identity,
  re-enters past dedup, <= CycleRetryTimes=5, PageExtensions.cs:5-28) ->
  link extraction + canonicalization (Selectable.cs:229-241) + junk/scheme
  filters (Page.cs:121-127,202-222) -> fragment strip
  (BasePageProcessor.cs:36,78-81) -> depth gate (Page.cs:151-152) ->
  dedup-push of children in link order.

Robots gating is NOT in the reference (SURVEY §2.2); the north rule adds
it, so the oracle models it identically to the engine: a denied URL is
dropped pre-fetch and never enters the fetched order (it still occupies
frontier/seen state, exactly like the engine).

The oracle is deliberately slow-and-simple (dicts + lists); it runs on
the t1/t2 corpora only.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field
from urllib.parse import urljoin

from dotnetspider_spark.testing.datagen import CorpusConfig, gen_corpus_local

_URL_OK = re.compile(r"^https?://")


def headers_json(headers: dict[str, str] | None) -> str:
    if not headers:
        return "{}"
    return "{" + ",".join(f'"{k}":"{headers[k]}"' for k in sorted(headers)) + "}"


@dataclass
class Request:
    url: str
    method: str = "GET"
    referer: str | None = None
    origin: str | None = None
    content: str | None = None
    headers: dict[str, str] | None = None
    priority: int = 0
    depth: int = 1
    retried: int = 0
    seq: int = 0

    def identity(self) -> str:
        parts = (
            (self.referer or "")
            + (self.origin or "")
            + (self.method or "GET")
            + (self.content or "")
            + (self.url or "")
            + str(self.retried)
            + headers_json(self.headers)
        )
        return hashlib.md5(parts.encode("utf-8")).hexdigest()


class HashSetDuplicateRemover:
    """Exact seen set: first sight False, duplicate True."""

    def __init__(self) -> None:
        self._seen: set[str] = set()

    def is_duplicate(self, req: Request) -> bool:
        ident = req.identity()
        if ident in self._seen:
            return True
        self._seen.add(ident)
        return False

    @property
    def total(self) -> int:
        return len(self._seen)

    def reset(self) -> None:
        self._seen.clear()


class QueueDuplicateRemovedScheduler:
    """Dedup-then-enqueue queue; DFS pops newest, BFS oldest.

    ``priority_first`` is the engine's opt-in (priority desc, then
    LIFO/FIFO) poll order — the reference stores Priority but never reads
    it (Page.cs:9); its Broker DB design orders on it
    (DistributeDesign.md:149-161)."""

    def __init__(self, dfs: bool = True, priority_first: bool = False) -> None:
        self.dfs = dfs  # default traverse strategy Dfs (DuplicateRemovedScheduler.cs:75)
        self.priority_first = priority_first
        self.remover = HashSetDuplicateRemover()
        self.queue: list[Request] = []
        self.success = 0
        self.error = 0

    def push(self, req: Request) -> None:
        if not self.remover.is_duplicate(req):
            self.queue.append(req)

    def poll(self) -> Request | None:
        if not self.queue:
            return None
        if self.priority_first:
            # max priority; within it newest seq (DFS) or oldest (BFS)
            best = max(
                range(len(self.queue)),
                key=lambda i: (
                    self.queue[i].priority,
                    self.queue[i].seq if self.dfs else -self.queue[i].seq,
                ),
            )
            return self.queue.pop(best)
        return self.queue.pop(-1 if self.dfs else 0)

    @property
    def left(self) -> int:
        return len(self.queue)

    @property
    def total(self) -> int:
        return self.remover.total


def canonicalize(base_url: str, link: str) -> str | None:
    """Junk filter + RFC-3986 resolve + fragment strip + scheme gate."""
    if not link or link.startswith("#") or link.lower().startswith("javascript:"):
        return None
    absu = urljoin(base_url, link)
    absu = absu.split("#", 1)[0]
    if len(absu) < 6 or not _URL_OK.match(absu):
        return None
    return absu


@dataclass
class CrawlResult:
    fetch_order: list[str] = field(default_factory=list)  # urls in fetch order
    seen: set[str] = field(default_factory=set)  # identities
    success: int = 0
    error: int = 0
    fetched_pages: dict[str, int] = field(default_factory=dict)  # url -> depth
    #: failing.log analog (Spider.cs:993-994): (url, retried, reason)
    errors: list[tuple[str, int, str]] = field(default_factory=list)


def crawl(
    cfg: CorpusConfig,
    seeds: list[Request],
    dfs: bool = True,
    max_depth: int | None = None,
    cycle_retry_times: int = 5,
    robots_deny_prefix: str | None = "/private/",
    processor=None,
    skip_targets_when_result_empty: bool = False,
    priority_first: bool = False,
    max_redirects: int = 10,
) -> CrawlResult:
    """Single-threaded reference crawl over the synthetic corpus.

    ``processor``: optional ``Callable[[str, dict], int]`` given
    (url, corpus page) returning the processor's result-item count; a
    raise models a processor exception -> cycle retry like a transient
    fetch (Spider.cs:1129-1140). With ``skip_targets_when_result_empty``
    a zero return suppresses link extraction for that page
    (Spider.cs:397,1155; SpiderTest.cs:162-174).
    """
    corpus = {r["url"]: r for r in gen_corpus_local(cfg)}
    sched = QueueDuplicateRemovedScheduler(dfs=dfs, priority_first=priority_first)
    res = CrawlResult()
    seq_counter = max((s.seq for s in seeds), default=-1) + 1

    for s in seeds:
        sched.push(s)

    def cycle_retry(req: Request) -> bool:
        """Re-push with retried+1 (NEW identity); False when exhausted."""
        nonlocal seq_counter
        if req.retried >= cycle_retry_times:
            return False
        retry = Request(
            url=req.url,
            method=req.method,
            referer=req.referer,
            origin=req.origin,
            content=req.content,
            headers=req.headers,
            depth=req.depth,
            retried=req.retried + 1,
            seq=seq_counter,
        )
        seq_counter += 1
        sched.push(retry)
        return True

    while True:
        req = sched.poll()
        if req is None:
            break
        # robots pre-fetch gate (north-rule addition, mirrored by engine)
        if robots_deny_prefix is not None:
            path = "/" + req.url.split("/", 3)[3] if req.url.count("/") >= 3 else "/"
            if path.startswith(robots_deny_prefix):
                res.errors.append((req.url, req.retried, "robots_denied"))
                continue
        page = corpus.get(req.url)
        # redirect-chain replay (page.TargetUrl, Downloader.cs:211-220 +
        # the <=max_redirects auto-follow budget, Downloader.cs:57-64):
        # serve the FINAL page's status/content; links resolve against
        # the final URL; on success every visited hop's virgin-GET
        # identity is marked seen. A chain still redirecting after the
        # budget surfaces the last hop's own 3xx row -> http_3xx error.
        target_url = req.url
        hops: list[str] = []
        while (
            page is not None
            and page.get("redirect_to")
            and len(hops) < max_redirects
        ):
            target_url = page["redirect_to"]
            hops.append(target_url)
            page = corpus.get(target_url)
        if page is not None and page.get("redirect_to"):
            # budget exhausted mid-chain: final response is the 3xx row
            sched.error += 1
            res.error += 1
            res.errors.append(
                (req.url, req.retried, f"http_{page['status']}")
            )
            continue
        if page is None or page["status"] == 404:
            sched.error += 1
            res.error += 1
            res.errors.append((req.url, req.retried, "missing"))
            continue
        if page["status"] == 500:
            # transient: cycle retry with retried+1 (new identity)
            if not cycle_retry(req):
                sched.error += 1
                res.error += 1
                res.errors.append((req.url, req.retried, "retries_exhausted"))
            continue
        # processor hook: exception => cycle retry (Spider.cs:1129-1140)
        n_results = None
        if processor is not None:
            try:
                n_results = processor(req.url, page)
            except Exception:
                if not cycle_retry(req):
                    sched.error += 1
                    res.error += 1
                    res.errors.append(
                        (req.url, req.retried, "processor_exception")
                    )
                continue
        # successful fetch
        sched.success += 1
        res.success += 1
        res.fetch_order.append(req.url)
        res.fetched_pages[req.url] = req.depth
        for hop_url in hops:
            # post-redirect dedup: a later link to ANY visited hop
            # (intermediate or final) is a dup
            sched.remover._seen.add(
                Request(
                    url=hop_url,
                    referer=req.referer,
                    origin=req.origin,
                    headers=dict(req.headers) if req.headers else None,
                ).identity()
            )
        # link discovery: canonicalize in document order, first-dup wins
        child_depth = req.depth + 1
        if max_depth is not None and child_depth > max_depth:
            continue
        if skip_targets_when_result_empty and n_results == 0:
            continue
        seen_in_page: set[str] = set()
        for link in page["out_links"]:
            canon = canonicalize(target_url, link)
            if canon is None or canon in seen_in_page:
                continue
            seen_in_page.add(canon)
            # child inherits the PARENT's Referer (only set when blank,
            # Page.cs:173-176) — for a seed crawl that stays None, so a
            # URL's identity does not depend on which page discovered it
            child = Request(
                url=canon,
                referer=req.referer,
                headers=dict(req.headers) if req.headers else None,
                origin=req.origin,
                depth=child_depth,
                retried=0,
                seq=seq_counter,
            )
            seq_counter += 1
            sched.push(child)

    res.seen = set(sched.remover._seen)
    return res
