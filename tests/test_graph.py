"""Connected components (large-star/small-star) vs union-find ground truth."""

from __future__ import annotations

import random

import pytest

from dotnetspider_spark.operators.graph import (
    connected_components,
    dedup_keep_canonical,
)


def _uf_components(n: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, list[int]] = {}
    for i in range(n):
        comp.setdefault(find(i), []).append(i)
    out = {}
    for mem in comp.values():
        m = min(mem)
        for i in mem:
            out[i] = m
    return out


@pytest.mark.parametrize("n", [30, 200, 500])
def test_components_match_union_find(spark, n):
    rng = random.Random(n)
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(n)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.component for r in connected_components(df).collect()}
    want_all = _uf_components(n, edges)
    touched = {v for e in edges for v in e}
    assert got == {i: want_all[i] for i in touched}


def test_long_path_converges_logarithmically(spark):
    """A 300-node path is the diameter worst case: star alternation must
    still collapse it to one min-labeled component within the iteration
    cap (plain min-propagation would need ~300 rounds)."""
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(300)], "src long, dst long"
    )
    got = {r.id: r.component for r in connected_components(df).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 301


def test_dedup_keep_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(8)], "doc_id long, text string"
    )
    # groups {0,3,5}, {1,2}; 4,6,7 unpaired
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5), (1, 2)], "id_a long, id_b long"
    )
    kept = sorted(
        r.doc_id for r in dedup_keep_canonical(docs, pairs).collect()
    )
    assert kept == [0, 1, 4, 6, 7]
