"""Spider facade + robots parser + content handlers + fetchers tests."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dotnetspider_spark.extraction.model import EntityModel, Field
from dotnetspider_spark.functions import handlers as H
from dotnetspider_spark.functions.robots import parse_robots_txt, robots_rules_table
from dotnetspider_spark.sinks.tables import ParquetTable
from dotnetspider_spark.sources.fetchers import CorpusFetcher, HttpFetcher
from dotnetspider_spark.spider import Spider
from dotnetspider_spark.testing.datagen import CorpusConfig, gen_corpus, gen_robots, page_url

CFG = CorpusConfig(n_pages=200, n_hosts=6)


@pytest.fixture(scope="module")
def corpus(spark):
    df = gen_corpus(spark, CFG, parallelism=2).cache()
    df.count()
    yield df
    df.unpersist()


def test_spider_end_to_end(spark, corpus, tmp_path):
    table = ParquetTable(spark, str(tmp_path / "cards"), ["page_no"])
    model = EntityModel(
        name="card",
        fields=(
            Field("page_no", "regex", r"/(\d+)\.html", dtype="bigint", source="url"),
            Field("caption", "css-cap", ""),
        ),
    )
    result = (
        Spider(spark)
        .add_seeds([page_url(i, CFG) for i in range(4)])
        .set_corpus(corpus)
        .add_robots(gen_robots(spark, CFG))
        .traverse(dfs=True)
        .depth(3)
        .politeness(6)
        .add_entity_model(model)
        .add_pipeline(table, mode="insert_ignore")
        .run()
    )
    n_fetched = result.crawl.fetched.count()
    assert n_fetched > 0
    assert result.items["card"].count() == n_fetched
    stored = table.read()
    assert stored.count() == stored.select("page_no").distinct().count()
    cap = stored.filter(F.col("caption").isNotNull()).count()
    assert cap == stored.count()


ROBOTS_TXT = """
# comments ignored
User-agent: googlebot
Disallow: /only-google/

User-agent: *
Crawl-delay: 1.5
Disallow: /private/
Disallow: /tmp*/x
Allow: /private/ok/
Disallow:
"""


def test_inline_seeds_and_seed_df_both_crawl(spark, corpus):
    """add_seeds() + add_seed_df() combine — neither source is silently
    dropped (r3 review: a CLI config with both `seeds:` and `seed_file:`
    lost the inline ones)."""
    seed_df = spark.createDataFrame(
        [(page_url(0, CFG), 0)], "url string, seq long"
    )
    res = (
        Spider(spark)
        .add_seed_df(seed_df)
        .add_seeds([page_url(1, CFG)])
        .set_corpus(corpus)
        .depth(2)
        .run()
    )
    fetched = res.crawl.fetched.select("url", "depth").collect()
    urls = {r.url for r in fetched}
    assert page_url(0, CFG) in urls
    assert page_url(1, CFG) in urls
    # depth 2 so CHILD discovery runs: the union fills the narrow
    # seed_df's missing columns with NULL, and a NULL depth silently
    # dropped every child at the depth gate (r3 review #1 — the old
    # depth(1) version of this test could never see it)
    assert all(r.depth is not None for r in fetched)
    assert any(r.depth == 2 for r in fetched), "no children were crawled"


def test_entity_model_without_corpus_fails_before_crawl(spark):
    """The corpus-required validation must fire BEFORE any crawl work
    (r3 review: it previously raised after the full crawl completed)."""
    from dotnetspider_spark.sources.fetchers import DictTransport

    spider = (
        Spider(spark)
        .add_seeds(["http://v.example/"])
        .set_fetcher(HttpFetcher(DictTransport({}), n_partitions=1))
        .add_entity_model(
            EntityModel(name="m", fields=(Field("u", "env", "url"),))
        )
    )
    with pytest.raises(ValueError, match="set_corpus"):
        spider.run()


def test_crawl_without_corpus_or_fetcher_fails_fast(spark):
    from dotnetspider_spark.crawler.loop import crawl

    seeds = spark.createDataFrame([("http://v.example/", 0)], "url string, seq long")
    with pytest.raises(ValueError, match="corpus DataFrame or an explicit fetcher"):
        crawl(spark, None, seeds)


def test_parse_robots_txt_groups_and_rules():
    rules = parse_robots_txt(ROBOTS_TXT, agent="dotnetspider")
    by_prefix = {r["path_prefix"]: r for r in rules}
    assert by_prefix["/private/"]["allow"] is False
    assert by_prefix["/private/"]["path_re"] is None
    assert by_prefix["/private/ok/"]["allow"] is True
    # wildcard Disallow carried intact with its anchored regex
    assert by_prefix["/tmp*/x"]["allow"] is False
    assert by_prefix["/tmp*/x"]["path_re"] == "^/tmp.*/x"
    # empty Disallow -> allow-all marker
    assert by_prefix["/"]["allow"] is True
    assert all(r["crawl_delay_ms"] == 1500 for r in rules)
    # exact agent group wins over '*'
    g = parse_robots_txt(ROBOTS_TXT, agent="googlebot")
    assert {r["path_prefix"] for r in g} == {"/only-google/"}


def test_pattern_to_regex_wildcards_and_anchor():
    from dotnetspider_spark.functions.robots import pattern_to_regex

    assert pattern_to_regex("/a*b$") == "^/a.*b$"
    assert pattern_to_regex("/w*") == "^/w.*"
    assert pattern_to_regex("/plain") == "^/plain"
    # embedded '$' is a literal, only the trailing one anchors
    assert pattern_to_regex("/p$q$") == "^/p\\$q$"
    # regex metacharacters in paths are escaped
    assert pattern_to_regex("/a.b(c)") == "^/a\\.b\\(c\\)"


def test_robots_rules_table(spark):
    docs = spark.createDataFrame(
        [("h1.example", ROBOTS_TXT), ("h2.example", "User-agent: *\nDisallow: /x/")],
        "host string, robots_txt string",
    )
    rules = robots_rules_table(docs).collect()
    hosts = {r.host for r in rules}
    assert hosts == {"h1.example", "h2.example"}
    h2 = [r for r in rules if r.host == "h2.example"]
    assert len(h2) == 1 and h2[0].path_prefix == "/x/" and not h2[0].allow


def test_robots_sitemaps(spark):
    from dotnetspider_spark.functions.robots import robots_sitemaps

    docs = spark.createDataFrame(
        [
            (
                "h1.example",
                "# robots\nSiteMap: http://h1.example/a.xml\n"
                "User-agent: *\nDisallow: /q\n"
                "  sitemap: https://h1.example/b.xml\t # comment tail\n"
                "Sitemap: /relative.xml\n"
                "Sitemap:\n"
                "NotASitemap: http://h1.example/no.xml",
            ),
            ("h2.example", "User-agent: *\nDisallow: /x/"),
        ],
        "host string, robots_txt string",
    )
    rows = robots_sitemaps(docs).collect()
    got = sorted((r.host, r.sitemap_url) for r in rows)
    # mixed case + in-group + comment-tail strip all honored; relative,
    # empty, and non-sitemap keys dropped; h2 contributes nothing
    assert got == [
        ("h1.example", "http://h1.example/a.xml"),
        ("h1.example", "https://h1.example/b.xml"),
    ]


def test_content_handlers(spark):
    df = spark.createDataFrame(
        [("<html><script>var x=1;</script><b>Hello</b> <i>world</i> BLOCKED</html>",)],
        "content string",
    )
    out = df.select(
        H.plain_text_handler(F.col("content")).alias("plain"),
        H.cutout_handler(F.col("content"), "<b>", "</b>", 3, 0).alias("cut"),
        H.regex_handler(F.col("content"), r"<b>\w+</b>").alias("rx"),
        H.skip_when_contains(F.col("content"), "BLOCKED").alias("bypass"),
        H.retry_when_contains(F.col("content"), "RATELIMIT").alias("retry"),
        H.to_upper_handler(F.lit("ab")).alias("up"),
    ).first()
    assert out.plain == "Hello world BLOCKED"
    assert out.cut == "Hello"
    assert out.rx == "<b>Hello</b>"
    assert out.bypass is True and out.retry is False
    assert out.up == "AB"


def test_corpus_fetcher_and_http_stub(spark, corpus):
    batch = corpus.select("url").limit(10)
    fetched = CorpusFetcher(corpus).fetch(batch)
    assert fetched.filter(F.col("status") == 200).count() > 0
    missing = spark.createDataFrame([("http://nowhere.example/x",)], "url string")
    assert CorpusFetcher(corpus).fetch(missing).first().status == 404
    # HttpFetcher is no longer a stub: it requires an INJECTED transport
    # (no ambient network in the sandbox) — the full mapInPandas stage is
    # exercised through DictTransport in tests/test_fetchers.py
    with pytest.raises(TypeError):
        HttpFetcher()


def test_spider_processor_and_errors(spark, corpus):
    """Spider facade wires the processor hook + errors table through:
    proc_error pages cycle-retry then land in errors; zero-result pages
    stop contributing links (Spider.cs:397,1129-1163)."""

    def proc(df):
        pid = F.nullif(
            F.regexp_extract(F.col("url"), r"/(\d+)\.html$", 1), F.lit("")
        ).cast("long")
        return df.withColumn("proc_error", F.pmod(pid, F.lit(11)) == 5).withColumn(
            "n_results", F.when(F.pmod(pid, F.lit(4)) == 1, 0).otherwise(1)
        )

    res = (
        Spider(spark)
        .add_seeds([page_url(i, CFG) for i in range(4)])
        .set_corpus(corpus)
        .add_robots(gen_robots(spark, CFG))
        .depth(3)
        .retry_times(1)
        .set_processor(proc)
        .skip_when_result_empty()
        .run()
    )
    reasons = {r.reason for r in res.errors.select("reason").distinct().collect()}
    assert "processor_exception" in reasons
    # no fetched page may be a proc-error page
    bad = res.crawl.fetched.filter(
        F.pmod(
            F.regexp_extract(F.col("url"), r"/(\d+)\.html$", 1).cast("long"),
            F.lit(11),
        )
        == 5
    )
    assert bad.count() == 0


def test_seed_df_without_seq_is_not_silently_lost(spark, corpus):
    """A seed_df LACKING the seq column gets NULL seq from the
    allowMissingColumns union; min_by(struct, seq) over an all-NULL key
    returns a NULL struct, which used to turn those seeds into all-NULL
    frontier rows (url=None) — never crawled, no diagnostic. They must
    crawl, ordered after explicitly-sequenced seeds."""
    seed_df = spark.createDataFrame([(page_url(0, CFG),)], "url string")
    res = (
        Spider(spark)
        .add_seed_df(seed_df)
        .add_seeds([page_url(1, CFG)])
        .set_corpus(corpus)
        .depth(1)
        .run()
    )
    fetched = res.crawl.fetched.select("url", "seq").collect()
    urls = {r.url for r in fetched}
    assert page_url(0, CFG) in urls and page_url(1, CFG) in urls
    assert all(r.seq is not None for r in fetched)
    # explicit seqs keep precedence: the null-seq seed sorts after
    by_url = {r.url: r.seq for r in fetched}
    assert by_url[page_url(0, CFG)] > by_url[page_url(1, CFG)]


def test_entity_extraction_uses_post_redirect_html(spark):
    """A 301 source url's corpus row is an empty stub; the html actually
    fetched lives under target_url. Extraction must join the corpus on
    the POST-redirect url (Downloader.cs:211-220 replaces the request
    url) — joining on the original url extracted zero items from every
    redirected page."""
    from dotnetspider_spark.testing.datagen import gen_corpus

    cfg = CorpusConfig(n_pages=40, n_hosts=2, redirect_every=10)
    corpus = gen_corpus(spark, cfg, parallelism=2)
    redirect_url = page_url(13, cfg)  # 13 % 10 == 3, i > 3 -> 301 stub
    model = EntityModel(
        name="cap", fields=(Field("caption", "css-cap", ""),)
    )
    res = (
        Spider(spark)
        .add_seeds([redirect_url])
        .set_corpus(corpus)
        .depth(1)
        .add_entity_model(model)
        .run()
    )
    fetched = res.crawl.fetched.collect()
    assert len(fetched) == 1 and fetched[0].url == redirect_url
    items = res.items["cap"].collect()
    assert len(items) == 1, "redirected page extracted nothing"
    assert items[0].caption  # the TARGET page's caption, not the stub's


def test_add_feeds_seeds_crawl_with_freshness_order(spark, corpus):
    """Spider.add_feeds: feed entries seed the crawl (fetchability-
    gated) and composable with add_seeds."""
    rss = (
        '<rss version="2.0"><channel>'
        f"<item><link>{page_url(2, CFG)}</link>"
        "<pubDate>Wed, 01 Jan 2020 00:01:00 GMT</pubDate></item>"
        "<item><link>mailto:x@y.example</link></item>"
        f"<item><link>{page_url(3, CFG)}</link>"
        "<pubDate>Wed, 01 Jan 2020 00:00:00 GMT</pubDate></item>"
        "</channel></rss>"
    )
    feeds = spark.createDataFrame(
        [("h", rss)], "host string, feed_xml string"
    )
    res = (
        Spider(spark)
        .add_feeds(feeds)
        .add_seeds([page_url(1, CFG)])
        .set_corpus(corpus)
        .depth(1)
        .run()
    )
    urls = {r.url for r in res.crawl.fetched.select("url").collect()}
    assert {page_url(1, CFG), page_url(2, CFG), page_url(3, CFG)} <= urls
    assert not any(u.startswith("mailto:") for u in urls)


def test_add_seed_df_after_add_feeds_keeps_both(spark, corpus):
    rss = (
        f'<rss version="2.0"><channel><item><link>{page_url(2, CFG)}'
        "</link></item></channel></rss>"
    )
    feeds = spark.createDataFrame([("h", rss)], "host string, feed_xml string")
    seed_df = spark.createDataFrame([(page_url(0, CFG), 0)],
                                    "url string, seq long")
    res = (
        Spider(spark).add_feeds(feeds).add_seed_df(seed_df)
        .set_corpus(corpus).depth(1).run()
    )
    urls = {r.url for r in res.crawl.fetched.select("url").collect()}
    assert {page_url(0, CFG), page_url(2, CFG)} <= urls
