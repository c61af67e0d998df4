"""Sparse similarity join + candidate-set evaluation.

``tfidf_simjoin`` is the exact sparse-vector cousin of the MinHash/LSH
candidate generators in :mod:`textdedup`: all document pairs whose
TF-IDF cosine similarity clears a threshold, computed with an inverted
-index join (the DAAT/postings formulation used by every search engine
and by dedup pipelines as the "verify" stage after LSH). The reference
has no analog — its dedup is URL-identity only — but a training-data
pipeline needs content-level similarity as a first-class operator.

``lsh_candidate_eval`` closes the loop on the approximate generators:
given a candidate pair set (from banding) and the exact pair set (from
a ground-truth join), report hit/precision/recall as ONE row. Running
the evaluation as a distributed join — not by collecting both sides —
is what makes it usable at corpus scale to tune (k, bands, threshold).

Scale shape (the inverted-index join is the canonical example of a
similarity self-join that survives 100 TB):

- postings are (token, doc, weight) triples; the self-join key is the
  token, so a token appearing in f docs contributes f^2/2 candidate
  rows. ``max_df`` drops tokens with document frequency above the cap
  BEFORE the join — the standard stop-postings guard; it bounds the
  per-token fan-out and with it the whole join's output (and it is a
  semantic choice shared with the oracle, not a silent truncation).
- everything after the postings join is partial-aggregable: dot
  products groupBy (a, b) with map-side combine, norms groupBy doc.
- weights/norms ship as (id, double) pairs — text never enters the
  join (same ids-only discipline the plan gates enforce for the
  MinHash/embedding paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dotnetspider_spark.operators.textdedup import tokens

__all__ = ["tfidf_postings", "tfidf_simjoin", "lsh_candidate_eval"]


def tfidf_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int = 50,
) -> DataFrame:
    """(id, token, weight) postings with ln-IDF weights, tokens with
    document frequency > ``max_df`` removed. Weight = tf * ln(N/df)
    where N counts ALL docs (including empty ones) — stated so the
    oracle can restate it identically."""
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    )
    tf = tok.groupBy("id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    kept = tf.join(
        dfreq.filter(F.col("df") <= max_df), "token"
    ).crossJoin(F.broadcast(n_docs))
    return kept.select(
        "id",
        "token",
        (
            F.col("tf").cast("double")
            * F.log(F.col("n_docs").cast("double") / F.col("df"))
        ).alias("weight"),
    )


def tfidf_simjoin(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.3,
    max_df: int = 50,
) -> DataFrame:
    """All pairs (id_a < id_b) with TF-IDF cosine >= threshold, via the
    inverted-index self-join. Returns (id_a, id_b, cosine) with cosine
    rounded to 6 dp (both engines sum doubles in data order; rounding
    absorbs the associativity noise, same convention as the jaccard
    queries)."""
    w = tfidf_postings(docs, id_col, text_col, max_df)
    norms = w.groupBy("id").agg(
        F.sqrt(F.sum(F.col("weight") * F.col("weight"))).alias("nrm")
    )
    right = w.select(
        F.col("id").alias("id_b"),
        F.col("token").alias("token_b"),
        F.col("weight").alias("weight_b"),
    )
    dots = (
        w.join(
            right,
            (F.col("token") == F.col("token_b"))
            & (F.col("id") < F.col("id_b")),
        )
        .groupBy(F.col("id").alias("id_a"), "id_b")
        .agg(F.sum(F.col("weight") * F.col("weight_b")).alias("dot"))
    )
    na = norms.select(F.col("id").alias("id_a"), F.col("nrm").alias("nrm_a"))
    nb = norms.select(F.col("id").alias("id_b"), F.col("nrm").alias("nrm_b"))
    scored = dots.join(na, "id_a").join(nb, "id_b").select(
        "id_a",
        "id_b",
        (F.col("dot") / (F.col("nrm_a") * F.col("nrm_b"))).alias("cos_raw"),
    )
    return scored.filter(F.col("cos_raw") >= threshold).select(
        "id_a", "id_b", F.round("cos_raw", 6).alias("cosine")
    )


def lsh_candidate_eval(
    candidates: DataFrame, truth: DataFrame
) -> DataFrame:
    """One-row precision/recall of a candidate pair set against the
    exact pair set. Both inputs are (id_a, id_b) with id_a < id_b and
    no duplicates (the generators guarantee it). Full-outer join on the
    pair key — distributed, neither side is collected — then a single
    global aggregate. Ratios are NULL when the denominator is 0."""
    c = candidates.select("id_a", "id_b", F.lit(1).alias("is_cand"))
    t = truth.select("id_a", "id_b", F.lit(1).alias("is_true"))
    j = c.join(t, ["id_a", "id_b"], "full_outer")
    agg = j.agg(
        F.count("is_cand").cast("long").alias("n_candidates"),
        F.count("is_true").cast("long").alias("n_true"),
        F.count(F.when(F.col("is_cand").isNotNull() & F.col("is_true").isNotNull(), 1))
        .cast("long")
        .alias("n_hits"),
    )
    return agg.select(
        "n_candidates",
        "n_true",
        "n_hits",
        F.round(
            F.col("n_hits") / F.nullif(F.col("n_candidates").cast("double"), F.lit(0.0)), 6
        ).alias("precision"),
        F.round(
            F.col("n_hits") / F.nullif(F.col("n_true").cast("double"), F.lit(0.0)), 6
        ).alias("recall"),
    )
