"""DOM engine + XPath/CSS selectors + multi-node entity extraction.

Ports the reference's Extraction.Test cases:
- SelectorTest.cs:9-58 (Regex/Css/Xpath over the same html strings)
- EntityExtractorTest.cs:14-38 (row selector -> N entity rows, env
  fields, relative xpath fields, positional predicates)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dotnetspider_spark.extraction.dom import (
    css_all,
    links,
    node_value,
    parse_html,
    xpath_all,
)
from dotnetspider_spark.extraction.model import (
    INDEX,
    EntityModel,
    Field,
    extract,
    extract_rows,
)

# SelectorTest.cs:9 — the exact html strings from the reference test
HTML = '<div><h1>test<a href="xxx">aabbcc</a></h1></div>'
HTML2 = (
    "<div><a href='http://whatever.com/aaa'></a></div>"
    "<div><a href='http://whatever.com/bbb'></a></div>"
)


# ------------------------------------------------------------ pure engine


def test_xpath_selector_cases():
    root = parse_html(HTML)
    # Selectors.XPath("//a/@href").Select(_html) == "xxx" (SelectorTest.cs:55-58)
    assert xpath_all(root, "//a/@href") == ["xxx"]
    r2 = parse_html(HTML2)
    assert xpath_all(r2, "//a/@href") == [
        "http://whatever.com/aaa",
        "http://whatever.com/bbb",
    ]
    # positional predicate selects per-parent position
    assert xpath_all(r2, "/div[2]/a/@href") == ["http://whatever.com/bbb"]
    # attribute-equality and contains predicates
    h = "<div><p class='cap big'>one</p><p class='cap'>two</p></div>"
    r = parse_html(h)
    assert [node_value(n, "inner_text") for n in xpath_all(r, "//p[@class='cap']")] == ["two"]
    assert [node_value(n, "inner_text") for n in xpath_all(r, "//p[contains(@class,'cap')]")] == ["one", "two"]
    assert xpath_all(r, "//p/text()") == ["one", "two"]
    assert [node_value(n, "inner_text") for n in xpath_all(r, "//p[last()]")] == ["two"]


def test_css_selector_cases():
    root = parse_html(HTML)
    # Selectors.Css("div h1 a").Select(_html).OuterHtml (SelectorTest.cs:46-52)
    nodes = css_all(root, "div h1 a")
    assert nodes[0].outer_html == '<a href="xxx">aabbcc</a>'
    assert nodes[0].inner_html == "aabbcc"
    # Selectors.Css("div h1 a", "href").Select(_html) == "xxx"
    assert nodes[0].attrs["href"] == "xxx"
    # combinators + attr selectors
    h = (
        '<div id="top"><span class="a b" data-x="foo">s1</span>'
        '<p><span class="a">s2</span></p></div>'
    )
    r = parse_html(h)
    assert [n.inner_text for n in css_all(r, "#top > span")] == ["s1"]
    assert [n.inner_text for n in css_all(r, "span.a")] == ["s1", "s2"]
    assert [n.inner_text for n in css_all(r, "span.a.b")] == ["s1"]
    assert [n.inner_text for n in css_all(r, "[data-x^=fo]")] == ["s1"]
    assert [n.inner_text for n in css_all(r, "p span, #top > span")] == ["s1", "s2"]


def test_dom_forgiving_parse_and_values():
    # unclosed <li>, void elements, entity refs
    r = parse_html("<ul><li>a<li>b</ul><img src='i.png'><p>x &amp; y</p>")
    assert [n.inner_text for n in xpath_all(r, "//li")] == ["a", "b"]
    assert xpath_all(r, "//img/@src") == ["i.png"]
    assert xpath_all(r, "//p")[0].inner_text == "x & y"
    assert xpath_all(r, "//p")[0].inner_html == "x &amp; y"
    # Links(): descendant-or-self @href + @src (Selectable.cs:119-139)
    assert links(xpath_all(r, "//ul")) == []
    assert links([r]) == ["i.png"]
    # whitespace-only attr values are skipped (XPathSelector.cs:70-85)
    r2 = parse_html("<a href='  '>x</a><a href=' ok '>y</a>")
    assert xpath_all(r2, "//a/@href") == ["ok"]


# JD-style list page (EntityExtractorTest.cs shape, 3 rows)
_LIST_PAGE = """<ul>
<li class='gl-item'><div class='j-sku-item first' data-sku='100' venderid='v0'>
 <div><a href='http://item/100'>i0</a></div>
 <div class='p-shop' data-shop_name='shop0'></div>
 <div class='p-name'><a><em>product zero</em></a></div></div></li>
<li class='gl-item'><div class='j-sku-item' data-sku='101' venderid='v1'>
 <div><a href='http://item/101'>i1</a></div>
 <div class='p-shop' data-shop_name='shop1'></div>
 <div class='p-name'><a><em>product one</em></a></div></div></li>
<li class='gl-item'><div class='j-sku-item' data-sku='102'>
 <div><a href='http://item/102'>i2</a></div>
 <div class='p-shop'></div>
 <div class='p-name'><a><em>product two</em></a></div></div></li>
</ul>"""

_MODEL = EntityModel(
    name="product",
    selector="//li[@class='gl-item']/div[contains(@class,'j-sku-item')]",
    fields=(
        Field("sku", "xpath", "./@data-sku", dtype="bigint"),
        Field("url2", "xpath", "./div[1]/a/@href"),
        Field("shop", "xpath", ".//div[@class='p-shop']/@data-shop_name"),
        Field("pname", "xpath", ".//div[@class='p-name']/a/em", value_option="inner_text"),
        Field("cat", "env", "cat"),
        Field("idx", "env", INDEX, dtype="int"),
    ),
)


@pytest.fixture()
def list_pages(spark):
    return spark.createDataFrame(
        [("p1", _LIST_PAGE, "phones")], "url string, html string, cat string"
    )


def test_extract_rows_multi_node(spark, list_pages):
    out = extract_rows(_MODEL, list_pages, keep_cols=("url",)).collect()
    assert len(out) == 3  # one row per region node (ModelExtractor.cs:57-66)
    assert [r.sku for r in out] == [100, 101, 102]
    assert [r.idx for r in out] == [0, 1, 2]  # EnviromentFields.Index
    assert out[0].url2 == "http://item/100"
    assert out[1].shop == "shop1"
    assert out[2].shop is None  # missing attr -> null
    assert out[0].pname == "product zero"
    assert all(r.cat == "phones" for r in out)  # env property column


def test_field_sql_formula_excel_formatter_analog(spark, list_pages):
    """ExcelFormatter analog (ExcelFormatter.cs:18-46): a per-field SQL
    formula over the extracted value — [value] = the field itself, other
    fields in scope — applied after extraction, before NotNull."""
    model = EntityModel(
        name="product",
        selector="//li[@class='gl-item']/div[contains(@class,'j-sku-item')]",
        fields=(
            Field("sku", "xpath", "./@data-sku", dtype="bigint"),
            Field(
                "pname",
                "xpath",
                ".//div[@class='p-name']/a/em",
                value_option="inner_text",
                sql_formula="upper(substring([value], 1, 7))",
            ),
            Field(
                "label",
                "const",
                "",
                sql_formula="concat(pname, '#', cast(sku AS STRING))",
            ),
            Field(
                "shop",
                "xpath",
                ".//div[@class='p-shop']/@data-shop_name",
                sql_formula="coalesce([value], 'noshop')",
                not_null=True,  # formula runs first -> no row is dropped
            ),
        ),
    )
    out = extract_rows(model, list_pages).collect()
    assert [r.pname for r in out] == ["PRODUCT", "PRODUCT", "PRODUCT"]
    assert [r.label for r in out] == ["PRODUCT#100", "PRODUCT#101", "PRODUCT#102"]
    assert [r.shop for r in out] == ["shop0", "shop1", "noshop"]


def test_extract_rows_take_and_notnull(spark, list_pages):
    # Take slices the NODE LIST before extraction (ModelExtractor.cs:52-55)
    head = EntityModel(
        name="p", selector=_MODEL.selector, take=2, take_from_head=True,
        fields=(Field("sku", "xpath", "./@data-sku", dtype="bigint"),),
    )
    assert [r.sku for r in extract_rows(head, list_pages).collect()] == [100, 101]
    tail = EntityModel(
        name="p", selector=_MODEL.selector, take=2, take_from_head=False,
        fields=(Field("sku", "xpath", "./@data-sku", dtype="bigint"),),
    )
    assert [r.sku for r in extract_rows(tail, list_pages).collect()] == [101, 102]
    # NotNull drops the row when the field is null (ModelExtractor.cs:87-90)
    nn = EntityModel(
        name="p", selector=_MODEL.selector,
        fields=(
            Field("sku", "xpath", "./@data-sku", dtype="bigint"),
            Field("shop", "xpath", ".//div[@class='p-shop']/@data-shop_name",
                  not_null=True),
        ),
    )
    assert [r.sku for r in extract_rows(nn, list_pages).collect()] == [100, 101]


def test_extract_rows_css_selector_and_count(spark, list_pages):
    m = EntityModel(
        name="p", selector="li.gl-item div.j-sku-item", selector_kind="css",
        fields=(
            Field("sku", "css", "", attr="data-sku", dtype="bigint"),
            Field("n_divs", "xpath", ".//div", value_option="count", dtype="int"),
        ),
    )
    # css "" selects nothing; use the self-attr via xpath instead
    m = EntityModel(
        name="p", selector="li.gl-item div.j-sku-item", selector_kind="css",
        fields=(
            Field("sku", "xpath", "./@data-sku", dtype="bigint"),
            Field("link", "css", "div a", attr="href"),
            Field("n_divs", "xpath", ".//div", value_option="count", dtype="int"),
        ),
    )
    out = extract_rows(m, list_pages).collect()
    assert [r.sku for r in out] == [100, 101, 102]
    assert out[0].link == "http://item/100"
    assert all(r.n_divs == 3 for r in out)


def test_extract_single_node_xpath_css(spark, list_pages):
    m = EntityModel(
        name="page",
        fields=(
            Field("first_sku", "xpath", "//div[contains(@class,'j-sku-item')]/@data-sku"),
            Field("first_name", "css", "div.p-name a em", value_option="inner_text"),
            Field("outer", "css", "div.p-name a em", value_option="outer_html"),
        ),
    )
    r = extract(m, list_pages).collect()[0]
    assert r.first_sku == "100"
    assert r.first_name == "product zero"
    assert r.outer == "<em>product zero</em>"


def test_region_links_udf(spark):
    from dotnetspider_spark.crawler.parse import extract_region_links_udf

    html = (
        "<div class='nav'><a href='/next?page=2&amp;x=%20y'>n</a>"
        "<img src='sprite.png'></div>"
        "<div class='ads'><a href='/spam'>ad</a></div>"
    )
    df = spark.createDataFrame([(html,)], "html string")
    out = df.select(
        extract_region_links_udf(F.col("html"), ("//div[@class='nav']",)).alias("l")
    ).collect()[0].l
    # UrlDecode + HtmlDecode applied (XPathRequestExtractor.cs:29-34);
    # the ads region is never scanned
    assert out == ["/next?page=2&x= y", "sprite.png"]


# ------------------------------------------------------ JSONPath (full)


def test_jsonpath_evaluator_grammar():
    """JsonPathSelector.cs delegates to Newtonsoft SelectTokens; the
    stdlib evaluator must cover the practical grammar with the same
    match order (document order, pre-order descent)."""
    from dotnetspider_spark.functions.jsonpath import jsonpath_eval as jp

    doc = {
        "store": {
            "book": [
                {"title": "A", "price": 8.95, "tag": "x"},
                {"title": "B", "price": 12.99},
                {"title": "C", "price": 22.99, "tag": "y"},
            ],
            "bicycle": {"price": 19.95},
        },
        "n": 3,
    }
    assert jp(doc, "$.store.book[0].title") == ["A"]
    assert jp(doc, "$.store.book[*].title") == ["A", "B", "C"]
    assert jp(doc, "$.store.book[-1].title") == ["C"]
    assert jp(doc, "$.store.book[0:2].title") == ["A", "B"]
    assert jp(doc, "$..price") == [8.95, 12.99, 22.99, 19.95]
    assert jp(doc, "$.store.book[?(@.price > 10)].title") == ["B", "C"]
    assert jp(doc, "$.store.book[?(@.tag == 'y')].title") == ["C"]
    assert jp(doc, "$..book[1].title") == ["B"]
    assert jp(doc, "$['store']['bicycle'].price") == [19.95]
    assert jp(doc, "$.missing") == []


def test_jsonpath_col_dispatch_and_field_kind(spark):
    """Simple paths stay on get_json_object (no Python in the plan);
    extended paths evaluate via the pandas UDF with identical scalar
    rendering. The jsonpath Field kind accepts both."""
    import pyspark.sql.functions as F

    from dotnetspider_spark.extraction.model import EntityModel, Field, extract
    from dotnetspider_spark.functions.jsonpath import is_simple_path, json_path_col

    assert is_simple_path("$.a.b[0]") and not is_simple_path("$..b")
    df = spark.createDataFrame(
        [('{"a":{"b":[{"v":1},{"v":7}]}}', "u1"), ('{"a":{"b":[]}}', "u2")],
        "js string, url string",
    )
    out = df.select(
        json_path_col(F.col("js"), "$.a.b[0].v").alias("simple"),
        json_path_col(F.col("js"), "$..v", mode="all").alias("deep"),
        json_path_col(F.col("js"), "$.a.b[?(@.v > 3)].v").alias("filt"),
    ).collect()
    got = {tuple(r) for r in out}
    assert got == {("1", "[1,7]", "7"), (None, "[]", None)}

    model = EntityModel(
        name="j",
        fields=(
            Field("deep_first", "jsonpath", "$..v", source="js"),
            Field("plain", "jsonpath", "$.a.b[1].v", source="js"),
        ),
    )
    rows = {
        r.plain: r.deep_first
        for r in extract(model, df, content_col="js", page_key="url").collect()
    }
    assert rows == {"7": "1", None: None}


def test_jsonpath_reference_selector_cases():
    """Direct port of SelectorTest.cs:60-85 (Selector_JsonPath) over the
    reference's own JSON fixture: wildcard book authors and a category
    predicate filter."""
    import json

    from dotnetspider_spark.functions.jsonpath import jsonpath_eval as jp

    text = json.loads(
        '{ "store": { "book": ['
        '{ "category": "reference", "author": "Nigel Rees",'
        '  "title": "Sayings of the Century", "price": 8.95 },'
        '{ "category": "fiction", "author": "Evelyn Waugh",'
        '  "title": "Sword of Honour", "price": 12.99,'
        '  "isbn": "0-553-21311-3" } ],'
        '"bicycle": { "color": "red", "price": 19.95 } } }'
    )
    authors = jp(text, "$.store.book[*].author")
    assert authors[0] == "Nigel Rees"  # Select() = first match
    assert "Nigel Rees" in authors and "Evelyn Waugh" in authors
    ref = jp(text, "$.store.book[?(@.category == 'reference')]")
    assert len(ref) == 1 and ref[0]["author"] == "Nigel Rees"
    assert ref[0]["price"] == 8.95


def test_html_selectable_reference_cases(spark):
    """Verbatim port of HtmlTest.cs:9-48 (Selectable): regex over raw
    text, relative-xpath anchor values, Links() canonicalization of
    relative hrefs against the page base, and outbound-link removal."""
    import pyspark.sql.functions as F

    from dotnetspider_spark.crawler.parse import _canonical_links
    from dotnetspider_spark.extraction.dom import (
        links,
        node_value,
        parse_html,
        xpath_all,
    )
    from dotnetspider_spark.functions.urlops import url_host

    # HtmlSelect: Regex("(.*)") over "aaaaaaab"
    import re

    assert re.search("(.*)", "aaaaaaab").group(1) == "aaaaaaab"
    # DonotFixAllRelativeHrefs: .//a values untouched
    root = parse_html('<div><a href="aaaa.com">aaaaaaab</a></div>')
    assert [node_value(n, "innertext") for n in xpath_all(root, ".//a")] == [
        "aaaaaaab"
    ]
    # FixAllRelativeHrefs: relative href resolves against the base
    import pandas as pd

    got = _canonical_links(
        pd.Series(['<div><a href="/a/b">aaaaaaab</a></div>']),
        pd.Series(["http://www.b.com"]),
    )
    assert list(got[0]) == ["http://www.b.com/a/b"]
    # RemoveOutboundLinks: a link to another registrable domain is
    # dropped when the filter is on (Selectable ctor third arg = true)
    df = spark.createDataFrame(
        [("http://www.b.com/page", "http://www.aaaa.com/x")],
        "page_url string, link string",
    )
    from dotnetspider_spark.functions.urlops import registrable_domain

    kept = df.filter(
        registrable_domain(url_host(F.col("link")))
        == registrable_domain(url_host(F.col("page_url")))
    )
    assert kept.count() == 0


def test_model_extractor_reference_cases(spark):
    """Verbatim port of ModelExtractorTest.cs:20-80: a null model
    selector extracts one row per page from page-relative field XPaths;
    a row selector //div[@class='aaaa'] with field '.' yields one entity
    row per matched node."""
    from dotnetspider_spark.extraction.model import EntityModel, Field, extract

    HTML = (
        "<div><div class='title'>i am title</div>"
        "<div class='dotnetspider'>i am dotnetspider</div></div>"
        "<div><div class='aaaa'>a</div><div class='aaaa'>b</div></div>"
    )
    pages = spark.createDataFrame([("p1", HTML)], "url string, html string")

    # NullModelSelector / NullEntityModelSelector
    null_model = EntityModel(
        name="n",
        fields=(
            Field("title", "xpath", ".//div[@class='title']"),
            Field("dotnetspider", "xpath", ".//div[@class='dotnetspider']"),
        ),
    )
    row = extract(null_model, pages, content_col="html", page_key="url").first()
    assert row.title == "i am title"
    assert row.dotnetspider == "i am dotnetspider"

    # ModelSelector / EntityModelSelector: 2 rows, field '.'
    row_model = EntityModel(
        name="e",
        selector="//div[@class='aaaa']",
        fields=(Field("title", "xpath", "."),),
    )
    out = extract(row_model, pages, content_col="html", page_key="url")
    titles = sorted(r.title for r in out.collect())
    assert titles == ["a", "b"]


def test_entity_extractor_real_page(spark):
    """Port of EntityExtractorTest.cs:14-38 over the reference's REAL
    280 KB Jd.html product-list page (read from the reference tree at
    test time, never copied): 60 entity rows from a contains()-predicate
    row selector, positional/attribute/descendant field XPaths, and
    environment fields — every first-row value the reference asserts."""
    import datetime
    import os
    from urllib.parse import urljoin

    import pyspark.sql.functions as F
    import pytest as _pytest

    from dotnetspider_spark.extraction.model import INDEX, EntityModel, Field, extract

    fixture = "/root/reference/src/DotnetSpider.Extraction.Test/Jd.html"
    if not os.path.exists(fixture):
        _pytest.skip("reference fixture not available")
    html = open(fixture, encoding="utf-8").read()
    pages = spark.createDataFrame(
        [("http://item.jd.com/3031737.htm", html, "手机", 110)],
        "url string, html string, cat string, cat3 int",
    )
    model = EntityModel(
        name="product",
        selector="//li[@class='gl-item']/div[contains(@class,'j-sku-item')]",
        fields=(
            Field("idx", "env", INDEX, dtype="int"),
            Field("category_name", "env", "cat"),
            Field("category_id", "env", "cat3", dtype="int"),
            Field("purl", "xpath", "./div[1]/a/@href"),
            Field("sku", "xpath", "./@data-sku"),
            Field("shop_name", "xpath", ".//div[@class='p-shop']/@data-shop_name"),
            Field("name", "xpath", ".//div[@class='p-name']/a/em"),
            Field("vender_id", "xpath", "./@venderid"),
            Field("jdzy_shop_id", "xpath", "./@jdzy_shop_id"),
            Field("run_id", "env", "today"),
        ),
    )
    out = extract(model, pages, content_col="html", page_key="url")
    rows = out.orderBy("idx").collect()
    assert len(rows) == 60  # Assert.Equal(60, results.Count())
    first = rows[0]
    assert first.category_name == "手机"
    assert first.category_id == 110
    # the reference's Selectable fixes relative hrefs against the page
    # url; the entity field yields the raw protocol-relative href, which
    # resolves to the reference's expected absolute URL
    assert urljoin("http://item.jd.com/3031737.htm", first.purl) == (
        "http://item.jd.com/3031737.html"
    )
    assert first.sku == "3031737"
    assert first.shop_name == "荣耀官方旗舰店"
    assert first.name.strip() == "荣耀 NOTE 8 4GB+32GB 全网通版 冰河银"
    assert first.vender_id == "1000000904"
    assert first.jdzy_shop_id == "1000000904"
    assert str(first.run_id).startswith(
        datetime.date.today().strftime("%Y/%m/%d")
    )


def test_positional_predicate_per_parent_and_attr_presence():
    """//x[N] counts within each parent (the // abbreviation expands to
    /descendant-or-self::node()/child::x[N]); CSS [attr] matches
    valueless attributes."""
    from dotnetspider_spark.extraction.dom import (
        css_all,
        node_value,
        parse_html,
        xpath_all,
    )

    root = parse_html("<ul><li>a</li><li>x</li></ul><ul><li>b</li></ul>")
    assert [node_value(n, "innertext") for n in xpath_all(root, "//li[1]")] == [
        "a", "b",
    ]
    assert [
        node_value(n, "innertext") for n in xpath_all(root, "//li[last()]")
    ] == ["x", "b"]
    root2 = parse_html("<div><input disabled><input name='x'></div>")
    assert len(css_all(root2, "[disabled]")) == 1
    assert len(css_all(root2, "input[disabled]")) == 1


def test_extract_rows_jsonpath_field(spark):
    """A jsonpath field inside a row-selector model evaluates against
    the region's embedded JSON text (sourceless) or a carried page
    column (source=...)."""
    from dotnetspider_spark.extraction.model import EntityModel, Field, extract

    html = (
        "<ul>"
        '<li class="j">{"sku": {"id": 11}}</li>'
        '<li class="j">{"sku": {"id": 22}}</li>'
        "</ul>"
    )
    pages = spark.createDataFrame(
        [("p1", html, '{"page_meta": {"cat": "phones"}}')],
        "url string, html string, meta string",
    )
    model = EntityModel(
        name="j",
        selector="//li[@class='j']",
        fields=(
            Field("sku_id", "jsonpath", "$.sku.id", dtype="bigint"),
            Field("cat", "jsonpath", "$..cat", source="meta"),
        ),
    )
    out = extract(model, pages, content_col="html", page_key="url")
    rows = sorted((r.sku_id, r.cat) for r in out.collect())
    assert rows == [(11, "phones"), (22, "phones")]
