"""BM25 retrieval + host reputation (operators/retrieval.py)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from dotnetspider_spark.operators.retrieval import bm25_topk, host_reputation


DOCS = [
    (0, "spark shuffle spark join"),
    (1, "shuffle"),
    (2, "vector vector vector vector vector"),
    (3, "the quick brown fox"),
    (4, "spark"),
]


def _bm25_ref(query, k1=1.2, b=0.75):
    """Pure-python Lucene-variant BM25 over DOCS."""
    toks = {i: t.split() for i, t in DOCS}
    n = len(DOCS)
    avg = sum(len(v) for v in toks.values()) / n
    df = {
        q: sum(1 for v in toks.values() if q in v)
        for q in query
    }
    out = {}
    for i, words in toks.items():
        s = 0.0
        for q in query:
            tf = words.count(q)
            if tf == 0 or df[q] == 0:
                continue
            idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(words) / avg))
        if s > 0:
            out[i] = round(s, 6)
    return out


def test_bm25_matches_pure_python_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: r.score
        for r in bm25_topk(df, ["spark", "vector"], k=10).collect()
    }
    assert got == _bm25_ref(["spark", "vector"])


def test_bm25_orders_and_limits_deterministically(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = bm25_topk(df, ["spark", "shuffle", "vector"], k=2).collect()
    ref = _bm25_ref(["spark", "shuffle", "vector"])
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert [(r.doc_id, r.score) for r in rows] == want


def test_bm25_rejects_empty_query(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, [])


def test_bm25_plans_top_k_and_filters_before_groupby(spark):
    """Plan gates: the final k is TakeOrderedAndProject (no global sort
    materialization) and the query-term filter sits below the tf
    aggregation (only matching tokens are aggregated)."""
    import contextlib
    import io

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = bm25_topk(df, ["spark"], k=3)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan, plan
    # the isin filter must appear in the plan (pushed below the agg)
    assert "spark" in plan and "Filter" in plan


def test_host_reputation_aggregates(spark):
    rows = [
        ("a.example", "one two three"),
        ("a.example", " ".join(["tok"] * 25)),
        ("b.example", "x"),
    ]
    df = spark.createDataFrame(rows, "host string, text string")
    got = {r.host: r for r in host_reputation(df).collect()}
    a = got["a.example"]
    assert (a.n_docs, a.avg_tokens, a.frac_long) == (2, 14.0, 0.5)
    b = got["b.example"]
    assert (b.n_docs, b.avg_tokens, b.frac_long) == (1, 1.0, 0.0)


def test_anchor_text_agg_counts_and_top(spark):
    from dotnetspider_spark.operators.retrieval import anchor_text_agg

    rows = [
        ("a", "p1", "home"),
        ("b", "p1", "home"),
        ("c", "p1", "start page"),
        ("d", "p1", "  home  "),          # trims to "home"
        ("e", "p2", "docs"),
        ("f", "p2", "api docs"),
        ("g", "p2", "api docs"),
        ("h", "p2", "docs"),              # 2-2 tie -> "api docs" wins lexically
        ("i", "p3", ""),                  # dropped
        ("j", "p3", None),                # dropped
        ("k", "p3", "only"),
    ]
    df = spark.createDataFrame(rows, "src string, dst string, anchor string")
    got = {r.dst: r for r in anchor_text_agg(df).collect()}
    assert got["p1"].n_links == 4
    assert got["p1"].n_distinct_anchors == 2
    assert got["p1"].top_anchor == "home"
    assert got["p1"].top_anchor_links == 3
    assert got["p2"].top_anchor == "api docs"  # deterministic tie-break
    assert got["p2"].n_links == 4
    assert got["p3"].n_links == 1 and got["p3"].top_anchor == "only"


def test_rrf_fuse_matches_pure_python(spark):
    from dotnetspider_spark.operators.retrieval import rrf_fuse

    l1 = [(10, 3.0), (11, 2.0), (12, 1.0)]
    l2 = [(12, 9.9), (10, 5.5), (13, 0.1)]
    d1 = spark.createDataFrame(l1, "doc_id long, score double")
    d2 = spark.createDataFrame(l2, "doc_id long, score double")
    k = 60
    ref = {}
    for lst in (l1, l2):
        for rank, (i, _) in enumerate(
            sorted(lst, key=lambda t: (-t[1], t[0])), start=1
        ):
            ref[i] = ref.get(i, 0.0) + 1.0 / (k + rank)
    got = rrf_fuse([d1, d2], k=k, top=10).collect()
    assert [r.doc_id for r in got] == sorted(
        ref, key=lambda i: (-round(ref[i], 6), i)
    )
    for r in got:
        assert r.rrf_score == pytest.approx(round(ref[r.doc_id], 6), abs=1e-9)
    n_lists = {r.doc_id: r.n_lists for r in got}
    assert n_lists[10] == 2 and n_lists[11] == 1 and n_lists[13] == 1


def test_rrf_fuse_requires_input(spark):
    with pytest.raises(ValueError):
        from dotnetspider_spark.operators.retrieval import rrf_fuse

        rrf_fuse([])


def test_hard_negatives_excludes_positives_keeps_scores(spark):
    from dotnetspider_spark.operators.retrieval import hard_negatives

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    ref = _bm25_ref(["spark", "vector"])
    got = {
        r.doc_id: r.score
        for r in hard_negatives(
            df, ["spark", "vector"], positive_ids=[2], k=10
        ).collect()
    }
    # positive excluded, every surviving score identical to the full run
    assert 2 not in got
    assert got == {i: s for i, s in ref.items() if i != 2}


def test_hard_negatives_empty_positives_equals_topk(spark):
    from dotnetspider_spark.operators.retrieval import bm25_topk, hard_negatives

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = [(r.doc_id, r.score) for r in bm25_topk(df, ["spark"], k=3).collect()]
    b = [
        (r.doc_id, r.score)
        for r in hard_negatives(df, ["spark"], positive_ids=[], k=3).collect()
    ]
    assert a == b


def test_focused_scores_tokenization_and_accumulation(spark):
    from dotnetspider_spark.operators.retrieval import focused_scores

    links = spark.createDataFrame(
        [
            ("p1", "API docs"),        # 2 hits (case-folded, both terms)
            ("p1", "read the DOCS"),   # 1 hit
            ("p1", None),              # null anchor: 0
            ("p2", "click here"),      # 0
            ("p2", ""),                # empty: 0
            ("p3", "docs docs docs"),  # duplicate tokens count once
        ],
        "dst string, anchor string",
    )
    got = {
        r["dst"]: r["focus_score"]
        for r in focused_scores(links, ["api", "docs"]).collect()
    }
    assert got == {"p1": 3, "p2": 0, "p3": 1}
