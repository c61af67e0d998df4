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


def test_pagerank_hand_computed_and_invariants(spark):
    """3-node chain with a dangling sink: ranks match a hand-run of the
    same formula; total mass sums to 1 every run; more in-links => more
    rank."""
    from dotnetspider_spark.operators.graph import pagerank

    # A -> B, A -> C, B -> C ; C dangles
    edges = spark.createDataFrame(
        [("A", "B"), ("A", "C"), ("B", "C")], ["src", "dst"]
    )
    got = {r.id: r.rank for r in pagerank(edges, n_iter=3, damping=0.85).collect()}

    # reference computation (pure python, same formula)
    ranks = {x: 1 / 3 for x in "ABC"}
    out = {"A": ["B", "C"], "B": ["C"]}
    for _ in range(3):
        dang = sum(v for k, v in ranks.items() if k not in out)
        contrib = {x: 0.0 for x in "ABC"}
        for u, targets in out.items():
            for v in targets:
                contrib[v] += ranks[u] / len(targets)
        base = 0.15 / 3 + 0.85 * dang / 3
        ranks = {x: base + 0.85 * contrib[x] for x in "ABC"}
    for x in "ABC":
        assert abs(got[x] - ranks[x]) < 1e-12, (x, got[x], ranks[x])
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got["C"] > got["B"] > got["A"]


def test_pagerank_tol_stops_early_with_identical_ranks(spark, tmp_path):
    """A symmetric 2-cycle converges immediately (ranks are exactly the
    stationary 1/2,1/2 from iteration 1): with tol set, the loop must
    stop well before the n_iter cap and return the SAME ranks as the
    capped run; on a non-converged graph a tiny tol must not fire.
    Early exit is asserted on the surviving state directory (each
    iteration writes iter=N and drops N-1), not wall-clock — timing
    assertions flake on a shared box."""
    import os

    from dotnetspider_spark.operators.graph import pagerank

    cycle = spark.createDataFrame([("A", "B"), ("B", "A")], ["src", "dst"])
    state = str(tmp_path / "pr_state")
    fast = {
        r.id: r.rank
        for r in pagerank(cycle, n_iter=25, tol=1e-12, state_dir=state).collect()
    }
    slow = {r.id: r.rank for r in pagerank(cycle, n_iter=25).collect()}
    assert fast == slow == {"A": 0.5, "B": 0.5}
    # the last surviving iter=N dir IS the stop iteration: must be far
    # below the 25-iteration cap (the 2-cycle's L1 delta is 0 at iter 1)
    iters = [
        int(d.split("=")[1])
        for d in os.listdir(state)
        if d.startswith("iter=")
    ]
    assert iters and max(iters) <= 2, iters
    # non-converged chain: tol=0 semantics — a 3-iter run with an
    # impossible tol must match the plain 3-iter run exactly
    chain = spark.createDataFrame(
        [("A", "B"), ("A", "C"), ("B", "C")], ["src", "dst"]
    )
    with_tol = {r.id: r.rank for r in pagerank(chain, n_iter=3, tol=1e-30).collect()}
    plain = {r.id: r.rank for r in pagerank(chain, n_iter=3).collect()}
    assert with_tol == plain


def test_hits_matches_numpy_power_iteration(spark, tmp_path):
    import numpy as np

    from dotnetspider_spark.operators.graph import hits

    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 1), (4, 4)]
    n = 5
    A = np.zeros((n, n))
    for s, d in edges:
        A[s, d] = 1.0
    auth = np.full(n, 1.0 / n)
    hub = np.full(n, 1.0 / n)
    for _ in range(4):
        auth = A.T @ hub
        auth = auth / auth.sum()
        hub = A @ auth
        hub = hub / hub.sum()

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.id: (r.auth, r.hub)
        for r in hits(df, n_iter=4, state_dir=str(tmp_path / "h")).collect()
    }
    assert set(got) == set(range(n))
    for i in range(n):
        assert got[i][0] == pytest.approx(auth[i], abs=1e-12)
        assert got[i][1] == pytest.approx(hub[i], abs=1e-12)
    # L1 invariants
    assert sum(a for a, _ in got.values()) == pytest.approx(1.0)
    assert sum(h for _, h in got.values()) == pytest.approx(1.0)


def test_hits_empty_graph(spark, tmp_path):
    from dotnetspider_spark.operators.graph import hits

    df = spark.createDataFrame([], "src long, dst long")
    assert hits(df, n_iter=2, state_dir=str(tmp_path / "e")).count() == 0


def test_opic_matches_hand_computed_two_iterations(spark):
    # graph: a->b, a->c, b->c ; c dangling. n=3, cash0 = 1/3 each.
    from dotnetspider_spark.operators.graph import opic

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], "src string, dst string"
    )
    got = {
        r.id: (round(r.cash, 9), round(r.history, 9), round(r.importance, 9))
        for r in opic(edges, n_iter=2).collect()
    }
    third = 1.0 / 3.0
    # iter1: dangling = cash(c) = 1/3 -> each node gets 1/9 base
    # cash1(a) = 1/9 ; cash1(b) = 1/6 + 1/9 ; cash1(c) = 1/6 + 1/3 + 1/9
    c1 = {"a": third / 3, "b": third / 2 + third / 3,
          "c": third / 2 + third / 3 + third}
    h1 = {k: third for k in "abc"}
    # iter2: dangling = cash1(c)
    d2 = c1["c"]
    c2 = {"a": d2 / 3, "b": c1["a"] / 2 + d2 / 3,
          "c": c1["a"] / 2 + c1["b"] + d2 / 3}
    h2 = {k: h1[k] + c1[k] for k in "abc"}
    tot = sum(h2[k] + c2[k] for k in "abc")
    for k in "abc":
        assert got[k][0] == round(c2[k], 9)
        assert got[k][1] == round(h2[k], 9)
        assert got[k][2] == round((h2[k] + c2[k]) / tot, 9)


def test_opic_total_mass_conserved(spark):
    # cash always sums to 1 (dangling redistribution closes the system)
    from dotnetspider_spark.operators.graph import opic

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")],
        "src string, dst string",
    )
    rows = opic(edges, n_iter=3).collect()
    assert abs(sum(r.cash for r in rows) - 1.0) < 1e-12
    assert abs(sum(r.importance for r in rows) - 1.0) < 1e-12
    # after k iterations every node banked k rounds of history
    assert abs(sum(r.history for r in rows) - 3.0) < 1e-12


def test_trustrank_starves_spam_farm_pagerank_inflates(spark):
    from dotnetspider_spark.operators.graph import pagerank, trustrank

    # good cluster g0<->g1, g0->g2; spam farm s0..s3 densely interlinked
    # with NO in-links from the good side
    edges = spark.createDataFrame(
        [("g0", "g1"), ("g1", "g0"), ("g0", "g2"), ("g2", "g0")]
        + [(f"s{i}", f"s{j}") for i in range(4) for j in range(4) if i != j],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("g0",)], "id string")
    tr = {r["id"]: r["rank"] for r in trustrank(edges, seeds, n_iter=8).collect()}
    pr = {r["id"]: r["rank"] for r in pagerank(edges, n_iter=8).collect()}
    # plain pagerank gives the farm substantial mass; trustrank ~zero
    assert sum(v for k, v in pr.items() if k.startswith("s")) > 0.3
    assert sum(v for k, v in tr.items() if k.startswith("s")) < 1e-9
    # trust mass conserved (teleport recycles all dangling/decay mass)
    assert abs(sum(tr.values()) - 1.0) < 1e-6
    assert tr["g0"] > tr["g1"] > 0


def test_trustrank_requires_seed_in_graph(spark):
    import pytest

    from dotnetspider_spark.operators.graph import trustrank

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        trustrank(edges, spark.createDataFrame([("zz",)], "id string"))
