"""DSIR importance resampling + margin-based pair mining."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dotnetspider_spark.operators.importance import (
    dsir_select,
    dsir_weights,
    dsir_weights_py,
    margin_candidates_exact,
    margin_mine,
)

CORPUS = [
    # (doc_id, text, is_target) — target docs share "wiki"-flavoured
    # vocabulary; raw-only docs share "spam" vocabulary, so DSIR must
    # weight wiki-ish raw docs above spam-ish ones.
    (0, "history of the roman empire and its provinces", True),
    (1, "the empire declined over four centuries of history", True),
    (2, "provinces traded grain across the roman roads", True),
    (3, "click here buy cheap pills now best price", False),
    (4, "roman history and the grain trade routes", False),
    (5, "cheap pills best deal click now buy buy", False),
    (6, "the provinces of the empire and their history", False),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t, tgt) for i, t, tgt in CORPUS],
        "doc_id long, text string, is_target boolean",
    )


def test_dsir_weights_match_pure_python(spark, docs):
    got = {
        r["doc_id"]: r["weight"]
        for r in dsir_weights(docs, F.col("is_target")).collect()
    }
    want = dsir_weights_py(CORPUS)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=2e-6), k


def test_dsir_ranks_target_like_raw_docs_above_spam(spark, docs):
    got = {
        r["doc_id"]: r["weight"]
        for r in dsir_weights(docs, F.col("is_target")).collect()
    }
    # wiki-flavoured raw docs (4, 6) must outrank spam raw docs (3, 5)
    assert min(got[4], got[6]) > max(got[3], got[5])


def test_dsir_select_top_frac_and_threshold_agree(spark, docs):
    top = dsir_select(docs, F.col("is_target"), top_frac=3 / 7).collect()
    assert len(top) == math.ceil(3 / 7 * 7) == 3
    cut = min(r["weight"] for r in top)
    thr = {
        r["doc_id"]
        for r in dsir_select(
            docs, F.col("is_target"), threshold=cut
        ).collect()
    }
    assert {r["doc_id"] for r in top} <= thr

    with pytest.raises(ValueError):
        dsir_select(docs, F.col("is_target"))
    with pytest.raises(ValueError):
        dsir_select(docs, F.col("is_target"), top_frac=0.5, threshold=0.0)


def _margin_py(vecs, left_ids, k=2, threshold=0.0):
    """Brute-force ratio-margin forward mining (test reference)."""
    import numpy as np

    right_ids = [i for i in sorted(vecs) if i not in left_ids]

    def cos(a, b):
        a, b = np.asarray(vecs[a]), np.asarray(vecs[b])
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    pairs = {(x, y): cos(x, y) for x in left_ids for y in right_ids}
    ax = {
        x: sum(
            sorted((pairs[(x, y)] for y in right_ids), reverse=True)[:k]
        )
        / min(k, len(right_ids))
        for x in left_ids
    }
    ay = {
        y: sum(
            sorted((pairs[(x, y)] for x in left_ids), reverse=True)[:k]
        )
        / min(k, len(left_ids))
        for y in right_ids
    }
    out = {}
    for x in left_ids:
        best = max(
            right_ids,
            key=lambda y: (pairs[(x, y)] / ((ax[x] + ay[y]) / 2), -y),
        )
        m = pairs[(x, best)] / ((ax[x] + ay[best]) / 2)
        if m > threshold:
            out[x] = (best, round(pairs[(x, best)], 6), round(m, 6))
    return out


def test_margin_mine_matches_brute_force(spark):
    vecs = {
        0: [1.0, 0.1, 0.0],
        1: [0.0, 1.0, 0.1],
        10: [0.9, 0.2, 0.0],  # near 0
        11: [0.1, 0.9, 0.0],  # near 1
        12: [0.5, 0.5, 0.7],  # hub-ish
        13: [0.0, 0.1, 1.0],
    }
    left_ids = {0, 1}
    emb = spark.createDataFrame(
        [(i, [float(v) for v in vec]) for i, vec in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    pairs = margin_candidates_exact(
        emb.filter(F.col("vec_id").isin(list(left_ids))),
        emb.filter(~F.col("vec_id").isin(list(left_ids))),
    )
    got = {
        r["x_id"]: (r["y_id"], r["cos_sim"], r["margin"])
        for r in margin_mine(pairs, k=2, threshold=0.0).collect()
    }
    want = _margin_py(vecs, left_ids, k=2, threshold=0.0)
    assert got.keys() == want.keys()
    for x in want:
        assert got[x][0] == want[x][0], (x, got[x], want[x])
        assert got[x][1] == pytest.approx(want[x][1], abs=2e-6)
        assert got[x][2] == pytest.approx(want[x][2], abs=2e-6)


def test_margin_threshold_drops_low_margin_pairs(spark):
    # orthogonal left vector: its best cos is ~0 -> margin ~cos/avg ~1;
    # a tight threshold must drop it while keeping the aligned pair
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),
            (10, [1.0, 0.05]),
            (11, [0.9, 0.1]),
        ],
        "vec_id long, embedding array<double>",
    )
    pairs = margin_candidates_exact(
        emb.filter(F.col("vec_id") < 2), emb.filter(F.col("vec_id") >= 10)
    )
    all_rows = margin_mine(pairs, k=2, threshold=0.0).collect()
    assert {r["x_id"] for r in all_rows} == {0, 1}
    kept = margin_mine(pairs, k=2, threshold=1.05).collect()
    assert {r["x_id"] for r in kept} == {0}


def test_margin_candidates_carry_ids_and_cos_only(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (10, [0.5, 0.5])],
        "vec_id long, embedding array<double>",
    )
    pairs = margin_candidates_exact(
        emb.filter(F.col("vec_id") == 0), emb.filter(F.col("vec_id") == 10)
    )
    # scale contract: downstream margin windows/joins never shuffle
    # the embedding arrays, only (ids, cos)
    assert set(pairs.columns) == {"x_id", "y_id", "cos"}
