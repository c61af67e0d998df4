"""Smoke tests for the driver contract (__spark_entry__.py)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.check_correctness import TABLES, normalize

SF = "/root/testdata/sf0.001"


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.columns == ["host", "url", "seq", "host_rank"]
    rows = df.collect()
    assert len(rows) > 0
    # politeness honored: at most 5 per host, ranks contiguous from 1
    per_host = {}
    for r in rows:
        per_host.setdefault(r.host, []).append(r.host_rank)
    for ranks in per_host.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5


def test_every_query_has_oracle_or_is_rows_only():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # v1: every query is SQL-expressible and has an oracle
    assert len(qs) >= 25


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


# spot-check a representative subset at sf0.001 (full battery runs in
# tools/check_correctness.py at sf0.01, and in the driver's own gate)
SPOT = [
    "identity_md5",
    "rank_dfs_lifo",
    "politeness_topk",
    "skew_salted_agg",
    "docs_minhash_signature",
    "ann_cosine_topk",
]


@pytest.mark.parametrize("name", SPOT)
def test_query_matches_oracle(spark, duck, name):
    sdf = entrymod.queries()[name](spark, SF)
    sc, sr = normalize(sdf.columns, [tuple(r) for r in sdf.collect()])
    res = duck.execute(entrymod.oracle_sql()[name])
    dc, dr = normalize([d[0] for d in res.description], res.fetchall())
    assert sc == dc
    assert len(sr) == len(dr)
    assert sr == dr


def test_registry_and_oracle_alignment():
    """Driver-contract invariants that rotation mistakes silently break:
    every oracle key names a registered query, the driver's checked
    window (first 50) is fully oracle-backed, no duplicate keys, and
    rows-only entries form a strictly contiguous tail."""
    import __spark_entry__ as em

    q = em.queries()
    o = em.oracle_sql()
    assert set(o) <= set(q), sorted(set(o) - set(q))
    names = list(q)
    assert len(names) == len(set(names))
    missing = [n for n in names[:50] if n not in o]
    assert not missing, missing
    flags = [n in o for n in names]
    first_rows_only = flags.index(False)
    stragglers = [
        n for n, f in zip(names[first_rows_only:], flags[first_rows_only:])
        if f
    ]
    assert not stragglers, (
        "oracle-backed entry after the rows-only tail begins: "
        + str(stragglers)
    )
