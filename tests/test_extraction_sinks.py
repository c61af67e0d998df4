"""Entity-model extraction + sink write-mode tests (SURVEY §2.6-2.8)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dotnetspider_spark.extraction.model import EntityModel, Field, extract
from dotnetspider_spark.functions import formatters as fmt
from dotnetspider_spark.sinks.tables import ParquetTable
from dotnetspider_spark.testing.datagen import CorpusConfig, gen_corpus

CFG = CorpusConfig(n_pages=80, n_hosts=4)


@pytest.fixture(scope="module")
def corpus(spark):
    df = gen_corpus(spark, CFG, parallelism=2).cache()
    df.count()
    yield df
    df.unpersist()


def test_entity_model_extracts_typed_fields(spark, corpus):
    model = EntityModel(
        name="page_card",
        fields=(
            Field("page_no", "regex", r"/(\d+)\.html", dtype="bigint",
                  source="page_url"),
            Field("caption", "css-cap", ""),
            Field("color", "regex", r"a (red|blue|green|ochre) test"),
            Field("n_anchors", "regex-count", r"<a href", dtype="int"),
            Field("host_upper", "column", "host", formatters=(
                lambda c: fmt.character_case_fmt(c, upper=True),
            )),
        ),
    )
    out = extract(model, corpus.withColumnRenamed("url", "page_url"),
                  content_col="html", page_key="page_url")
    rows = {r.page_no: r for r in out.collect()}
    assert len(rows) == CFG.n_pages
    r0 = rows[0]
    assert r0.caption.startswith("Synthetic caption 0:")
    assert r0.color == "red"
    assert r0.host_upper == r0.host_upper.upper()
    assert isinstance(r0.n_anchors, int) and r0.n_anchors >= 1


def test_entity_model_not_null_and_take(spark, corpus):
    model = EntityModel(
        name="takes",
        fields=(
            Field("page_no", "regex", r"/p/(\d+)\.html", dtype="bigint", not_null=True),
        ),
        take=5,
        take_from_head=True,
    )
    out = extract(model, corpus, content_col="url", page_key="url")
    got = [r.page_no for r in out.collect()]
    assert len(got) == 5  # NotNull dropped /private/ pages, Take kept 5


def _events(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10, 100),
            (1, "b", 11, 101),
            (2, "c", 12, 102),
        ],
        "k int, v string, x int, seq int",
    )


def test_sink_insert_and_ignore(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t1"), ["k"])
    t.insert_ignore(_events(spark), seq_col="seq")
    # within batch, first per key wins
    got = {r.k: r.v for r in t.read().collect()}
    assert got == {1: "a", 2: "c"}
    # second batch: existing keys ignored, new key inserted
    b2 = spark.createDataFrame([(1, "z", 0, 200), (3, "d", 13, 201)],
                               "k int, v string, x int, seq int")
    t.insert_ignore(b2, seq_col="seq")
    got = {r.k: r.v for r in t.read().collect()}
    assert got == {1: "a", 2: "c", 3: "d"}


def test_sink_upsert_last_wins(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t2"), ["k"])
    t.upsert(_events(spark), seq_col="seq")
    got = {r.k: r.v for r in t.read().collect()}
    assert got == {1: "b", 2: "c"}  # last write per key wins
    b2 = spark.createDataFrame([(2, "z", 99, 300), (4, "e", 14, 301)],
                               "k int, v string, x int, seq int")
    t.upsert(b2, seq_col="seq")
    got = {(r.k): (r.v, r.x) for r in t.read().collect()}
    assert got == {1: ("b", 11), 2: ("z", 99), 4: ("e", 14)}


def test_sink_update_only_touches_update_cols(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t3"), ["k"])
    t.insert(_events(spark).drop("seq"))
    upd = spark.createDataFrame([(1, "VV", 999, 1), (9, "nope", 0, 2)],
                                "k int, v string, x int, seq int")
    t.update(upd, update_cols=["v"], seq_col="seq")
    got = {r.k: (r.v, r.x) for r in t.read().collect()}
    # k=1 rows updated v only (x untouched); k=9 dropped (no insert)
    assert got[2] == ("c", 12)
    assert 9 not in got
    assert {v for v, _ in [got[1]]} == {"VV"}
    ks = t.read().filter(F.col("k") == 1).collect()
    assert all(r.v == "VV" for r in ks)
    assert {r.x for r in ks} == {10, 11}


def test_table_name_postfix_resolution():
    """Schema.TableNamePostfix (Schema.cs:58-90): date-rolled table
    names; Monday follows the documented intent (see docstring re the
    reference's off-by-one on non-Sundays)."""
    import datetime

    from dotnetspider_spark.sinks.tables import resolve_table_name

    d = datetime.date(2017, 12, 12)  # a Tuesday
    assert resolve_table_name("t", "none", d) == "t"
    assert resolve_table_name("t", "today", d) == "t_2017_12_12"
    assert resolve_table_name("t", "monday", d) == "t_2017_12_11"
    assert resolve_table_name("t", "first_day_of_month", d) == "t_2017_12_01"
    assert resolve_table_name("t", "month", d) == "t_2017_12"
    assert resolve_table_name("t", "last_month", d) == "t_2017_11"
    # Sunday rolls back to the previous Monday
    assert resolve_table_name("t", "monday", datetime.date(2017, 12, 17)) == (
        "t_2017_12_11"
    )
