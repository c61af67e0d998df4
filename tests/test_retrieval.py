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
