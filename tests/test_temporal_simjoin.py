"""Semantics pins for operators/temporal.py and operators/simjoin.py.

Small hand-built frames with hand-computed expectations (the sf0.01
oracle rows cover the same ops at volume; these pin the edge cases the
synthetic tables may not hit: no-snapshot-yet rows, equal timestamps,
tie values at a quantile rank, df-capped tokens, empty candidate sets).
"""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F


def _ts(s):
    return dt.datetime(2026, 1, 1, 0, 0, s)


def test_asof_join_backward_inclusive_and_null_before_first(spark):
    from dotnetspider_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [("a", _ts(1), 1), ("a", _ts(5), 2), ("a", _ts(10), 3),
         ("b", _ts(4), 4), ("c", _ts(9), 5)],
        "host string, ts timestamp, event_id int",
    )
    right = spark.createDataFrame(
        [("a", _ts(5), 50), ("a", _ts(8), 80), ("b", _ts(1), 10)],
        "host string, ts timestamp, delay int",
    )
    out = {
        r["event_id"]: r["delay"]
        for r in asof_join(left, right, key="host", payload=["delay"]).collect()
    }
    # event 1 precedes every 'a' snapshot -> NULL; event 2 at ts=5
    # matches the ts=5 snapshot (inclusive); event 3 takes the latest
    # (ts=8); host c has no snapshots at all -> NULL.
    assert out == {1: None, 2: 50, 3: 80, 4: 10, 5: None}


def test_asof_join_preserves_left_rowcount(spark):
    from dotnetspider_spark.operators.temporal import asof_join

    left = spark.range(100).select(
        (F.col("id") % 7).cast("string").alias("k"),
        F.timestamp_seconds(F.col("id") + 1).alias("ts"),
        F.col("id"),
    )
    right = spark.range(10).select(
        (F.col("id") % 7).cast("string").alias("k"),
        F.timestamp_seconds(F.col("id") * 5).alias("ts"),
        F.col("id").alias("v"),
    )
    assert asof_join(left, right, key="k", payload=["v"]).count() == 100


def test_exact_quantiles_definition_and_ties(spark):
    from dotnetspider_spark.operators.temporal import exact_quantiles

    # group g: values 1..10 -> p50 = ceil(0.5*10)=rank5 -> 5.0,
    # p90 = rank 9 -> 9.0, p99 = rank 10 -> 10.0.
    rows = [("g", float(i), i) for i in range(1, 11)]
    # group t: all-equal values; any tie order gives the same value.
    rows += [("t", 3.0, 100 + i) for i in range(4)]
    df = spark.createDataFrame(rows, "host string, value double, event_id int")
    out = {
        r["host"]: r
        for r in exact_quantiles(
            df, "host", "value", ps=(0.5, 0.9, 0.99), tie_break="event_id"
        ).collect()
    }
    assert out["g"]["n"] == 10
    assert (out["g"]["p50"], out["g"]["p90"], out["g"]["p99"]) == (5.0, 9.0, 10.0)
    assert (out["t"]["p50"], out["t"]["p90"], out["t"]["p99"]) == (3.0, 3.0, 3.0)


def test_exact_quantiles_single_row_group(spark):
    from dotnetspider_spark.operators.temporal import exact_quantiles

    df = spark.createDataFrame(
        [("x", 7.0, 1)], "host string, value double, event_id int"
    )
    r = exact_quantiles(df, "host", "value").collect()[0]
    assert (r["n"], r["p50"], r["p90"], r["p99"]) == (1, 7.0, 7.0, 7.0)


def test_tfidf_simjoin_identical_docs_cosine_one(spark):
    from dotnetspider_spark.operators.simjoin import tfidf_simjoin

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta epsilon")],
        "doc_id long, text string",
    )
    out = tfidf_simjoin(docs, threshold=0.1, max_df=50).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert abs(r["cosine"] - 1.0) < 1e-6


def test_tfidf_simjoin_max_df_drops_ubiquitous_tokens(spark):
    from dotnetspider_spark.operators.simjoin import tfidf_simjoin

    # 'the' appears in all 4 docs; with max_df=3 it cannot generate
    # candidates, so the only surviving pair shares 'zebra'.
    docs = spark.createDataFrame(
        [(1, "the zebra"), (2, "the zebra"), (3, "the lion"), (4, "the puma")],
        "doc_id long, text string",
    )
    out = tfidf_simjoin(docs, threshold=0.01, max_df=3).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [(1, 2)]


def test_tfidf_weight_formula(spark):
    from dotnetspider_spark.operators.simjoin import tfidf_postings

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    w = {
        (r["id"], r["token"]): r["weight"]
        for r in tfidf_postings(docs, max_df=50).collect()
    }
    assert abs(w[(1, "a")] - 2 * math.log(2 / 1)) < 1e-12
    assert abs(w[(1, "b")] - 1 * math.log(2 / 2)) < 1e-12
    assert abs(w[(2, "c")] - 1 * math.log(2 / 1)) < 1e-12


def test_lsh_candidate_eval_counts(spark):
    from dotnetspider_spark.operators.simjoin import lsh_candidate_eval

    cand = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 5)], "id_a long, id_b long"
    )
    truth = spark.createDataFrame(
        [(1, 2), (4, 5), (6, 7)], "id_a long, id_b long"
    )
    r = lsh_candidate_eval(cand, truth).collect()[0]
    assert (r["n_candidates"], r["n_true"], r["n_hits"]) == (3, 3, 2)
    assert abs(r["precision"] - round(2 / 3, 6)) < 1e-9
    assert abs(r["recall"] - round(2 / 3, 6)) < 1e-9


def test_lsh_candidate_eval_empty_candidates_null_precision(spark):
    from dotnetspider_spark.operators.simjoin import lsh_candidate_eval

    cand = spark.createDataFrame([], "id_a long, id_b long")
    truth = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = lsh_candidate_eval(cand, truth).collect()[0]
    assert (r["n_candidates"], r["n_true"], r["n_hits"]) == (0, 1, 0)
    assert r["precision"] is None
    assert r["recall"] == 0.0


def test_soft404_flag_gates(spark):
    from dotnetspider_spark.functions.content import soft404_flag

    rows = [
        (1, 200, "<html>Page Not Found</html>"),          # soft 404
        (2, 404, "<html>Page Not Found</html>"),          # hard 404 -> no
        (3, 200, "normal article body"),                  # clean -> no
        (4, 200, "x" * 600 + " page not found"),          # marker past head
        (5, 200, "404 Not Found " + "y" * 600),           # long body -> no
        (6, 204, "does not exist"),                       # 2xx + short -> yes
    ]
    df = spark.createDataFrame(rows, "id int, status int, body string")
    out = {
        r["id"]: r["f"]
        for r in df.select(
            "id", soft404_flag(F.col("status"), F.col("body")).alias("f")
        ).collect()
    }
    assert out == {1: True, 2: False, 3: False, 4: False, 5: False, 6: True}


def test_asof_join_matches_pandas_merge_asof_randomized(spark):
    """25 seeded-random cases against the independent reference
    implementation (pandas.merge_asof, backward + allow_exact_matches):
    same contract, so outputs must agree row-for-row including
    no-match NULLs."""
    import numpy as np
    import pandas as pd

    from dotnetspider_spark.operators.temporal import asof_join

    rng = np.random.default_rng(42)
    for case in range(25):
        n_l, n_r = rng.integers(1, 40), rng.integers(0, 25)
        keys = [f"k{i}" for i in range(rng.integers(1, 5))]
        lpd = pd.DataFrame(
            {
                "k": rng.choice(keys, n_l),
                "ts": pd.to_datetime(rng.integers(0, 1000, n_l), unit="s"),
                "row_id": np.arange(n_l),
            }
        )
        # engine contract: right unique per (key, ts)
        rpd = pd.DataFrame(
            {
                "k": rng.choice(keys, n_r),
                "ts": pd.to_datetime(rng.integers(0, 1000, n_r), unit="s"),
            }
        ).drop_duplicates(["k", "ts"])
        rpd["v"] = np.arange(len(rpd))
        left = spark.createDataFrame(lpd)
        right = (
            spark.createDataFrame(rpd)
            if len(rpd)
            else spark.createDataFrame([], "k string, ts timestamp, v long")
        )
        got = {
            r["row_id"]: r["v"]
            for r in asof_join(left, right, key="k", payload=["v"]).collect()
        }
        exp_df = pd.merge_asof(
            lpd.sort_values("ts", kind="stable"),
            rpd.sort_values("ts", kind="stable"),
            on="ts",
            by="k",
            direction="backward",
            allow_exact_matches=True,
        )
        exp = {
            int(r.row_id): (None if pd.isna(r.v) else int(r.v))
            for r in exp_df.itertuples()
        }
        assert got == exp, f"case {case}: {got} != {exp}"


def test_exact_quantiles_matches_numpy_randomized(spark):
    """20 seeded-random cases (with heavy ties) against the stated
    definition computed independently: sorted[ceil(p*n)-1]."""
    import math

    import numpy as np

    from dotnetspider_spark.operators.temporal import exact_quantiles

    rng = np.random.default_rng(7)
    ps = (0.5, 0.9, 0.99)
    for case in range(20):
        n = int(rng.integers(1, 200))
        groups = rng.choice(["g0", "g1", "g2"], n)
        # small integer pool -> many exact ties
        vals = rng.integers(0, 10, n).astype(float)
        df = spark.createDataFrame(
            [(g, float(v), i) for i, (g, v) in enumerate(zip(groups, vals))],
            "host string, value double, event_id int",
        )
        out = {
            r["host"]: r
            for r in exact_quantiles(
                df, "host", "value", ps=ps, tie_break="event_id"
            ).collect()
        }
        for g in set(groups):
            sv = np.sort(vals[groups == g])
            assert out[g]["n"] == len(sv)
            for p, name in zip(ps, ("p50", "p90", "p99")):
                exp = sv[math.ceil(p * len(sv)) - 1]
                assert out[g][name] == exp, f"case {case} {g} {name}"
