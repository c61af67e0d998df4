"""Importance-based data-selection operators for the training pipeline.

Two published selection criteria the curation suite was missing, both
pure built-in column algebra (codegen, no Python in the hot path), both
with DuckDB-expressible twins in ``__spark_entry__``:

1. **DSIR** — Data Selection via Importance Resampling (Xie et al.,
   2023, arXiv:2302.03169). Features are hashed token buckets (the
   paper's hashed n-gram bag); target and raw bucket distributions are
   Laplace-smoothed unigram models; a document's importance weight is
   ``sum_tokens [log p_target(bucket) - log p_raw(bucket)]``. Selection
   keeps the highest-weight raw documents.

2. **Margin-based pair mining** (Artetxe & Schwenk, 2019 — the LASER
   bitext-mining ratio criterion; the same score mines image-caption
   pairs from CLIP-style joint embeddings). For a candidate pair
   ``(x, y)``: ``margin = cos(x,y) / ((avgk(x) + avgk(y)) / 2)`` where
   ``avgk(v)`` is the mean cosine of v's k nearest neighbours on the
   OTHER side; forward mining keeps each x's best-margin y above a
   threshold.

The reference has no analog (its pipeline ends at entity extraction);
these belong to the LLM-data-pipeline mandate, same as textdedup/
curation.

Scale shapes:
- DSIR is two token passes: one tiny ``n_buckets``-row aggregate
  (broadcast back), one per-doc partial-agg sum — no wide shuffle, no
  global sort. Selection at 100 TB should use the ``threshold=`` filter
  path (pure map); the exact ``top_frac`` rank is for oracle-sized
  corpora and is deliberately windowed on a constant only there.
- margin mining's candidate generation at scale is the hyperplane-LSH
  band join (operators/ann.py:lsh_bucket) — candidates() here accepts
  any (x_id, y_id, cos) DataFrame; the built-in generator broadcasts
  the smaller side for exact small-corpus mining.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .ann import _cos_col
from .textdedup import tokens


def _bucket(tok: Column, n_buckets: int) -> Column:
    """Portable hashed feature bucket: first 4 hex chars of md5 mod B
    (md5 is computable identically in DuckDB; xxhash64 is Spark-only)."""
    return F.pmod(
        F.conv(F.substring(F.md5(tok), 1, 4), 16, 10).cast("long"),
        F.lit(n_buckets),
    )


def dsir_weights(
    docs: DataFrame,
    target_pred: Column,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document DSIR importance weight (Xie et al. 2023 §2.2).

    ``target_pred`` marks the in-domain sample (e.g. ``lang == 'en'``);
    the raw distribution is the full input. Returns (id_col, weight)
    with weight = sum over the doc's tokens of
    ``ln((ct[b]+1)/(T+B)) - ln((cr[b]+1)/(R+B))`` (Laplace-smoothed),
    rounded to 6 places.

    Plan: explode tokens once; B-row bucket aggregate with a conditional
    target count (tiny -> broadcast); per-doc sum with map-side partial
    agg. No global sort, no wide shuffle beyond the doc-keyed agg.

    A document with zero tokens yields NO output row (nothing to sum —
    the SQL twin's unnest drops it identically); callers selecting by
    weight therefore drop empty docs, which is the desired behavior.
    """
    tok = docs.select(
        F.col(id_col),
        target_pred.alias("__is_target"),
        F.explode(tokens(F.col(text_col))).alias("__tok"),
    ).withColumn("__b", _bucket(F.col("__tok"), n_buckets))
    bucket_tbl = tok.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__cr"),
        F.sum(F.when(F.col("__is_target"), 1).otherwise(0)).alias("__ct"),
    )
    # scalar totals ride on the same tiny table (sum over <= B rows)
    stats = bucket_tbl.agg(
        F.sum("__cr").alias("__r_total"), F.sum("__ct").alias("__t_total")
    )
    weights = (
        bucket_tbl.crossJoin(F.broadcast(stats))
        .select(
            "__b",
            (
                F.log((F.col("__ct") + 1) / (F.col("__t_total") + n_buckets))
                - F.log((F.col("__cr") + 1) / (F.col("__r_total") + n_buckets))
            ).alias("__lr"),
        )
    )
    return (
        tok.join(F.broadcast(weights), "__b")
        .groupBy(id_col)
        .agg(F.round(F.sum("__lr"), 6).alias("weight"))
    )


def dsir_select(
    docs: DataFrame,
    target_pred: Column,
    n_buckets: int = 64,
    top_frac: float | None = None,
    threshold: float | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Select raw documents by DSIR weight.

    Exactly one of:
    - ``threshold``: keep weight >= threshold — the 100 TB path (pure
      filter after the weight join; pick the threshold from a sampled
      quantile offline).
    - ``top_frac``: keep the ceil(frac * n) highest-weight docs
      (deterministic: rounded weight desc, id asc). Exact global rank —
      small-corpus / oracle path only; the constant-partition window is
      a deliberate single-task sort and is documented as such.

    Returns (id_col, weight) for the kept docs.
    """
    if (top_frac is None) == (threshold is None):
        raise ValueError("pass exactly one of top_frac / threshold")
    w = dsir_weights(docs, target_pred, n_buckets, id_col, text_col)
    if threshold is not None:
        return w.filter(F.col("weight") >= threshold)
    win = Window.orderBy(F.col("weight").desc(), F.col(id_col).asc())
    n_win = Window.partitionBy(F.lit(1))
    return (
        w.withColumn("__rn", F.row_number().over(win))
        .withColumn("__n", F.count(F.lit(1)).over(n_win))
        .filter(F.col("__rn") <= F.ceil(F.lit(float(top_frac)) * F.col("__n")))
        .select(id_col, "weight")
    )


def margin_candidates_exact(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs candidates (x_id, y_id, cos): broadcast the left
    (query) side against the right base. Small-corpus / oracle path;
    at scale generate candidates with operators/ann.py:lsh_bucket band
    joins instead and feed them to :func:`margin_mine`."""
    qd = F.col("__qv").cast("array<double>")
    vd = F.col(vec_col).cast("array<double>")
    return (
        F.broadcast(
            left.select(
                F.col(id_col).alias("x_id"), F.col(vec_col).alias("__qv")
            )
        )
        .crossJoin(right.select(F.col(id_col).alias("y_id"), vec_col))
        .select("x_id", "y_id", _cos_col(qd, vd).alias("cos"))
    )


def margin_mine(
    pairs: DataFrame,
    k: int = 4,
    threshold: float = 1.0,
    forward_only: bool = True,
) -> DataFrame:
    """Ratio-margin pair mining over a candidate set (Artetxe & Schwenk
    2019, eq. 3 "ratio" with forward mining, §3.2).

    ``pairs``: (x_id, y_id, cos). For each side, ``avgk`` is the mean
    cosine of its k best candidates; margin(x,y) = cos /
    ((avgk(x) + avgk(y)) / 2). ``forward_only`` keeps each x's single
    best-margin y; rows below ``threshold`` are dropped either way.

    Returns (x_id, y_id, cos_sim, margin), both rounded to 6 places,
    ordered deterministically by the caller if needed.

    Shape: two narrow windows partitioned by x_id / y_id (the candidate
    set is band-bounded at scale, so each partition is small), two
    key-joins of per-id scalar aggregates — no global sort.
    """
    wx = Window.partitionBy("x_id").orderBy(
        F.col("cos").desc(), F.col("y_id").asc()
    )
    wy = Window.partitionBy("y_id").orderBy(
        F.col("cos").desc(), F.col("x_id").asc()
    )
    ranked = pairs.withColumn("__rx", F.row_number().over(wx)).withColumn(
        "__ry", F.row_number().over(wy)
    )
    avg_x = (
        ranked.filter(F.col("__rx") <= k)
        .groupBy("x_id")
        .agg(F.avg("cos").alias("__ax"))
    )
    avg_y = (
        ranked.filter(F.col("__ry") <= k)
        .groupBy("y_id")
        .agg(F.avg("cos").alias("__ay"))
    )
    scored = (
        ranked.join(avg_x, "x_id")
        .join(avg_y, "y_id")
        .select(
            "x_id",
            "y_id",
            F.col("cos"),
            (F.col("cos") / ((F.col("__ax") + F.col("__ay")) / 2)).alias(
                "__margin"
            ),
        )
    )
    if forward_only:
        wbest = Window.partitionBy("x_id").orderBy(
            F.col("__margin").desc(), F.col("y_id").asc()
        )
        scored = scored.withColumn("__rb", F.row_number().over(wbest)).filter(
            F.col("__rb") == 1
        )
    return scored.filter(F.col("__margin") > threshold).select(
        "x_id",
        "y_id",
        F.round("cos", 6).alias("cos_sim"),
        F.round("__margin", 6).alias("margin"),
    )


def dsir_weights_py(
    rows: list[tuple[int, str, bool]], n_buckets: int = 64
) -> dict[int, float]:
    """Pure-Python reference for :func:`dsir_weights` (pytest pin):
    rows = [(doc_id, text, is_target)]."""
    import hashlib

    def bucket(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:4], 16) % n_buckets

    cr: dict[int, int] = {}
    ct: dict[int, int] = {}
    r_total = t_total = 0
    toks_by_doc: dict[int, list[int]] = {}
    for doc_id, text, is_target in rows:
        bs = [bucket(t) for t in text.split() if t]
        toks_by_doc[doc_id] = bs
        for b in bs:
            cr[b] = cr.get(b, 0) + 1
            r_total += 1
            if is_target:
                ct[b] = ct.get(b, 0) + 1
                t_total += 1
    out = {}
    for doc_id, bs in toks_by_doc.items():
        w = sum(
            math.log((ct.get(b, 0) + 1) / (t_total + n_buckets))
            - math.log((cr.get(b, 0) + 1) / (r_total + n_buckets))
            for b in bs
        )
        out[doc_id] = round(w, 6)
    return out
