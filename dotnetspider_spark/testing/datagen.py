"""Deterministic synthetic web corpus (FIXTURES.md §A1) — no external data.

One pure function :func:`corpus_row` defines every page; the Spark
generator (``mapInPandas`` over ``spark.range`` — rows are materialized
executor-side, never on the driver) and the pure-Python oracle
(:mod:`dotnetspider_spark.pyref`) both call it, so the engine and the
oracle crawl byte-identical webs.

The web graph is closed (links only target pages < n_pages), Zipf-skewed
over hosts (hot-host head for the skew-salting path), and deliberately
messy: relative links, ``javascript:``, fragments, off-domain, empty —
exercising the reference's canonicalization + junk filters
(Selectable.cs:229-241, Page.cs:121-127,202-222).

Payload columns follow BASELINE.json input_hint exactly:
``image_id:string, bytes:binary, w:int, h:int, fmt:string,
caption:string, phash:long``.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class CorpusConfig:
    n_pages: int = 2000
    n_hosts: int = 20
    seed: int = 42
    with_payload: bool = True  # False for huge scheduling-only benches
    links_per_page: int = 8
    neardup_every: int = 97  # page i with i % neardup_every == 1 is a near-dup of i-1
    fail_500_every: int = 53  # transient -> retry path
    fail_404_every: int = 71  # permanent
    private_every: int = 37  # lives under /private/ (robots-denied prefix)
    #: >0: page i with 3 <= i % redirect_every < 3 + redirect_chain_len
    #: (i>3) is a 301 redirect to page i-1, so residues 3..3+L-1 form a
    #: CHAIN of up to L hops ending at residue 2. chain_len=1 keeps the
    #: original single-hop rule byte-identical. Redirect wins over the
    #: 500/404 moduli. 0 = off, keeping pre-existing fixtures identical.
    redirect_every: int = 0
    #: chain length L; requires 3 + L <= redirect_every so a chain can't
    #: wrap onto the next chain's head. L > max_redirects (10) exercises
    #: the budget-exhaustion path (final response still 3xx -> error).
    redirect_chain_len: int = 1

    def __post_init__(self):
        if self.redirect_every > 0 and (
            3 + self.redirect_chain_len > self.redirect_every
        ):
            raise ValueError(
                "redirect_chain_len must satisfy 3 + L <= redirect_every "
                f"(got L={self.redirect_chain_len}, "
                f"every={self.redirect_every})"
            )


CORPUS_COLUMNS = [
    "page_id", "url", "host", "out_links", "html",
    "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
    "status", "crawl_delay_ms", "redirect_to",
]

CORPUS_SCHEMA = (
    "page_id long, url string, host string, out_links array<string>, "
    "html string, image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, status int, crawl_delay_ms int, "
    "redirect_to string"
)


def _host_of(i: int, cfg: CorpusConfig) -> int:
    """Zipf-ish host assignment: square-law head so host 0 is hot."""
    u = (hashlib.md5(f"{cfg.seed}|host|{i}".encode()).digest()[0] / 255.0) ** 2
    return min(int(u * cfg.n_hosts), cfg.n_hosts - 1)


def page_url(i: int, cfg: CorpusConfig) -> str:
    h = _host_of(i, cfg)
    path = "private" if (i % cfg.private_every == 0 and i > 0) else "p"
    return f"http://host{h}.example/{path}/{i}.html"


def host_delay_ms(host: str) -> int:
    """Per-host politeness delay: 0 / 100 / 500 by stable hash."""
    d = hashlib.md5(f"delay|{host}".encode()).digest()[0] % 3
    return (0, 100, 500)[d]


def _image(i: int, cfg: CorpusConfig):
    from dotnetspider_spark.codec.jpeg import encode_jpeg
    from dotnetspider_spark.codec.png import (
        decode_image,
        encode_png,
        phash64,
    )

    base_i = i - 1 if (i % cfg.neardup_every == 1 and i > 1) else i
    rng = np.random.default_rng([cfg.seed, 7, base_i])
    w = int(8 + rng.integers(0, 25))
    h = int(8 + rng.integers(0, 25))
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    if base_i != i:  # near-duplicate: flip one pixel of the base image
        px = px.copy()
        px[0, 0] = (255 - px[0, 0]) % 256
    fmt = "jpeg" if i % 5 == 0 else "png"
    # lossy rows carry REAL baseline JPEG since round 5 (codec/jpeg.py)
    # so every corpus-driven pipeline — crawl, validate, phash dedup —
    # exercises the production decode path, not the FJPG stand-in
    data = encode_jpeg(px, 92) if fmt == "jpeg" else encode_png(px)
    # phash is defined over the DECODED pixels (what a consumer sees), so
    # recomputing it from `bytes` always round-trips, lossy formats included
    return data, w, h, fmt, phash64(decode_image(data, fmt))


def corpus_row(i: int, cfg: CorpusConfig) -> dict:
    """The single source of truth for page i. Pure, deterministic."""
    url = page_url(i, cfg)
    host = url.split("/")[2]
    if (
        cfg.redirect_every > 0
        and i > 3
        and 3 <= i % cfg.redirect_every < 3 + cfg.redirect_chain_len
    ):
        # 301 stub: no content of its own — fetchers follow the hop and
        # serve the TARGET's status/html with target_url recorded
        return {
            "page_id": i, "url": url, "host": host, "out_links": [],
            "html": "", "image_id": "", "bytes": b"", "w": 1, "h": 1,
            "fmt": "png", "caption": "", "phash": 0, "status": 301,
            "crawl_delay_ms": host_delay_ms(host),
            "redirect_to": page_url(i - 1, cfg),
        }
    rng = np.random.default_rng([cfg.seed, 3, i])
    n_links = int(rng.integers(0, cfg.links_per_page + 1))
    out_links: list[str] = []
    for j in range(n_links):
        tgt = int(rng.integers(0, cfg.n_pages))
        t_url = page_url(tgt, cfg)
        style = int(rng.integers(0, 6))
        if style == 0:
            out_links.append(t_url)  # absolute
        elif style == 1:  # host-relative
            out_links.append("/" + t_url.split("/", 3)[3])
        elif style == 2:  # document-relative
            out_links.append("../" + t_url.split("/", 3)[3])
        elif style == 3:  # protocol-relative
            out_links.append("//" + t_url.split("/", 2)[2])
        else:
            out_links.append(t_url)
    junk_kind = int(rng.integers(0, 4))
    junk = ["", "#top", "javascript:void(0)", "mailto:x@example.com"][junk_kind]

    caption = f"Synthetic caption {i}: a {['red','blue','green','ochre'][i % 4]} test card — host {host}."
    if cfg.with_payload:
        data, w, h, fmt, ph = _image(i, cfg)
        image_id = hashlib.sha1(url.encode()).hexdigest()
    else:
        data, w, h, fmt, ph, image_id = b"", 1, 1, "png", 0, ""

    anchors = "".join(f'<a href="{u}">l{k}</a>' for k, u in enumerate(out_links))
    html = (
        f"<html><body>{anchors}<a href=\"{junk}\">j</a>"
        f'<img src="/img/{image_id}.{fmt}"/><p class="cap">{caption}</p>'
        f"</body></html>"
    )

    status = 200
    if i > 0 and i % cfg.fail_500_every == 0:
        status = 500
    elif i > 0 and i % cfg.fail_404_every == 0:
        status = 404
    return {
        "page_id": i,
        "url": url,
        "host": host,
        "out_links": out_links,
        "html": html,
        "image_id": image_id,
        "bytes": data,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": caption,
        "phash": ph,
        "status": status,
        "crawl_delay_ms": host_delay_ms(host),
        "redirect_to": None,
    }


def gen_corpus_local(cfg: CorpusConfig) -> list[dict]:
    """Materialize the whole corpus in-process (oracle / tiny fixtures)."""
    return [corpus_row(i, cfg) for i in range(cfg.n_pages)]


def gen_corpus(spark, cfg: CorpusConfig, parallelism: int = 32):
    """Distributed corpus as a DataFrame: spark.range -> mapInPandas.

    Scale note: generation is embarrassingly parallel and executor-side;
    at 10^7+ pages set ``with_payload=False`` (scheduling benches don't
    read bytes, and the frontier path must never scan them anyway).
    """
    import pandas as pd

    # redirect-free corpora omit the redirect_to column entirely, so the
    # fetch stage (CorpusFetcher) statically skips redirect bookkeeping —
    # no probe scan, no hop join, byte-identical to the pre-redirect plan
    cols = (
        CORPUS_COLUMNS
        if cfg.redirect_every > 0
        else [c for c in CORPUS_COLUMNS if c != "redirect_to"]
    )
    schema = (
        CORPUS_SCHEMA
        if cfg.redirect_every > 0
        else CORPUS_SCHEMA.replace(", redirect_to string", "")
    )

    def gen(batches):
        for pdf in batches:
            rows = [corpus_row(int(i), cfg) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=cols)

    return (
        spark.range(0, cfg.n_pages, numPartitions=parallelism)
        .mapInPandas(gen, schema=schema)
    )


# ------------------------------------------------------------------ robots


def robots_rows(cfg: CorpusConfig) -> list[dict]:
    """Per-host rules: /private/ denied everywhere; host0 also denies /p/9
    (a concrete prefix) to exercise rule matching beyond one global rule."""
    rows = []
    for h in range(cfg.n_hosts):
        host = f"host{h}.example"
        rows.append({"host": host, "path_prefix": "/private/", "allow": False})
        rows.append({"host": host, "path_prefix": "/p/", "allow": True})
    return rows


def gen_robots(spark, cfg: CorpusConfig):
    return spark.createDataFrame(
        robots_rows(cfg), "host string, path_prefix string, allow boolean"
    )


# ------------------------------------------------------------------- seeds


def seed_rows(cfg: CorpusConfig, k: int = 10) -> list[dict]:
    """k seed requests: pages 0..k-1 (depth=1 per Page.cs:47-50)."""
    return [
        {
            "url": page_url(i, cfg),
            "method": "GET",
            "referer": None,
            "origin": None,
            "content": None,
            "headers": None,
            "priority": 0,
            "depth": 1,
            "retried": 0,
            "seq": i,
        }
        for i in range(k)
    ]


SEED_SCHEMA = (
    "url string, method string, referer string, origin string, "
    "content string, headers map<string,string>, priority int, depth int, "
    "retried int, seq long"
)


def gen_seeds(spark, cfg: CorpusConfig, k: int = 10):
    return spark.createDataFrame(seed_rows(cfg, k), SEED_SCHEMA)
