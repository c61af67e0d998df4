"""Lexical retrieval over the document corpus — BM25 scoring + top-k.

A training-data pipeline needs lexical retrieval for decontamination
lookups, dedup-cluster inspection, and quality-set mining (e.g. fetch
the nearest corpus docs to a benchmark query before deciding what to
drop). BM25 (Robertson & Spärck Jones / Okapi, the Lucene practical
variant) is the standard scorer.

Scale shape (the part that matters at 10^9 docs):
- the query's term set is broadcast as a literal filter, so the
  per-doc term-frequency aggregation touches only matching tokens —
  the token explode is filtered BEFORE the groupBy, and Catalyst
  pushes the isin() into the generator's output;
- corpus statistics (N, avg doc length) are one scalar aggregate,
  attached by a broadcast single-row crossJoin (the engine-wide
  pattern for scalars — never a driver collect in the operator);
- document frequencies are computed over the SAME filtered token set
  (only |query| distinct tokens survive), so the df aggregate's
  key space is |query|, broadcastable back onto the tf table;
- final top-k is orderBy+limit -> TakeOrderedAndProject (no global
  sort materialization).

No reference analog (DotnetSpider has no retrieval); the formula is
the public Lucene BM25: idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
score = sum_t idf_t * tf * (k1+1) / (tf + k1 * (1 - b + b * len/avg)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 score for every document matching at least one query term
    (the scoring stage shared by :func:`bm25_topk` and
    :func:`hard_negatives`). Returns (id_col, score), score rounded to
    6 places; corpus statistics are always computed over the FULL
    ``docs`` input, so any downstream exclusion (top-k cut, positives
    anti-filter) changes which rows survive, never the scores.
    """
    from .textdedup import tokens

    terms = sorted({t for t in query_terms if t})
    if not terms:
        raise ValueError("query_terms must contain at least one term")
    # tokens() is the engine-wide token definition (dedup/quality/LM
    # share it); the raw split rides along only for the explode — empty
    # tokens are dropped by the isin() filter either way
    words = F.split(F.col(text_col), r"\s+")
    base = docs.select(
        F.col(id_col),
        F.size(tokens(F.col(text_col))).alias("__len"),
        words.alias("__words"),
    )
    # corpus stats: one scalar row, broadcast onto every doc
    stats = base.agg(
        F.count(F.lit(1)).alias("__n_docs"),
        F.avg("__len").alias("__avg_len"),
    )
    tf = (
        base.select(
            id_col,
            "__len",
            F.explode("__words").alias("__tok"),
        )
        .filter(F.col("__tok").isin(terms))
        .groupBy(id_col, "__len", "__tok")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    df_tbl = tf.groupBy("__tok").agg(
        F.count(F.lit(1)).alias("__df")
    )
    scored = (
        tf.join(F.broadcast(df_tbl), "__tok")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("__n_docs") - F.col("__df") + F.lit(0.5))
                    / (F.col("__df") + F.lit(0.5))
                )
                * F.col("__tf")
                * F.lit(k1 + 1.0)
                / (
                    F.col("__tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("__len") / F.col("__avg_len")
                    )
                )
            ).alias("__s"),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("__s"), 6).alias("score"))
    )
    return scored


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25 score for a bag of query terms.

    Returns (id_col, score) with score rounded to 6 places; ties break
    on id ascending so the result is deterministic across engines.
    Shape: :func:`bm25_scores` then orderBy+limit — Catalyst compiles
    the cut to TakeOrderedAndProject (no global sort materialization).
    """
    scored = bm25_scores(docs, query_terms, k1=k1, b=b, id_col=id_col,
                         text_col=text_col)
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def hard_negatives(
    docs: DataFrame,
    query_terms: list[str],
    positive_ids: list,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 hard-negative mining — the standard contrastive-training
    data recipe (Karpukhin et al. 2020, DPR): for a query, the highest-
    scoring documents that are NOT known positives are the "hard"
    negatives a retriever most needs to learn from (random negatives
    are trivially separable).

    Shape: the positives exclusion is a literal ``isin`` filter applied
    to the scored rows BEFORE the top-k cut (positives lists are
    per-query small by construction — they're labeled data), so the
    plan stays scoring -> Filter -> TakeOrderedAndProject; corpus
    statistics still see the full corpus (excluding positives from the
    stats would shift every idf). Returns (id_col, score), ties broken
    on id ascending.
    """
    pos = sorted(set(positive_ids))
    scored = bm25_scores(docs, query_terms, k1=k1, b=b, id_col=id_col,
                         text_col=text_col)
    if pos:
        scored = scored.filter(~F.col(id_col).isin(pos))
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def host_reputation(
    docs: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
) -> DataFrame:
    """Host-level quality prior — the crawl-side twin of per-doc quality
    scoring: a frontier scheduler can demote whole hosts whose content
    is consistently junk (RefinedWeb / C4 both apply site-level
    filters) instead of fetching then discarding page by page.

    Emits per host: doc count, mean token count, and the fraction of
    docs clearing a 20-token floor — all from ONE pass over the text
    (single groupBy keyed on host; partial aggregation map-side).
    """
    from .textdedup import tokens

    per_doc = docs.select(
        F.col(host_col), F.size(tokens(F.col(text_col))).alias("__n_tok")
    )
    return per_doc.groupBy(host_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("__n_tok"), 6).alias("avg_tokens"),
        F.round(
            F.avg(F.when(F.col("__n_tok") >= 20, 1.0).otherwise(0.0)), 6
        ).alias("frac_long"),
    )


def anchor_text_agg(
    links: DataFrame,
    dst_col: str = "dst",
    anchor_col: str = "anchor",
) -> DataFrame:
    """Per-target anchor-text aggregation — the classic web-search
    document-expansion signal (anchor text describes the TARGET page
    better than the page itself; Craswell, Hawking & Robertson 2001,
    and the public MS MARCO / ORCAS anchor corpora): for every link
    target, how many inbound links carry text, how many distinct
    anchor strings, and which anchor is most common.

    Scale shape: anchors are first collapsed by an exact
    ``(dst, anchor)`` aggregation — partial-agg (map-side combine)
    friendly, and it compresses the mega-target skew (a page with 10^7
    inbound links of the same "click here" reduces to one row per
    distinct string before any window runs). The per-dst window then
    ranks the collapsed rows only: its partition size is the number of
    DISTINCT anchors per target, not the inbound degree. Top anchor
    tie-breaks lexicographically so the result is engine-deterministic.

    Input rows: (dst, anchor) — one per extracted link (``Links()`` /
    crawl edge table joined to its anchor strings). Empty/null anchors
    are dropped. Returns
    (dst, n_links, n_distinct_anchors, top_anchor, top_anchor_links).
    """
    collapsed = (
        links.select(
            F.col(dst_col).alias("dst"),
            F.trim(F.col(anchor_col)).alias("__a"),
        )
        .filter(F.col("__a").isNotNull() & (F.col("__a") != ""))
        .groupBy("dst", "__a")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    w_rank = Window.partitionBy("dst").orderBy(
        F.col("__n").desc(), F.col("__a").asc()
    )
    w_all = Window.partitionBy("dst")
    return (
        collapsed.select(
            "dst",
            F.sum("__n").over(w_all).alias("n_links"),
            F.count(F.lit(1)).over(w_all).cast("bigint").alias(
                "n_distinct_anchors"
            ),
            F.row_number().over(w_rank).alias("__rn"),
            F.col("__a").alias("top_anchor"),
            F.col("__n").alias("top_anchor_links"),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    top: int = 10,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) of
    several retrieval result lists: ``rrf(d) = Σ_i 1/(k + rank_i(d))``
    over the lists that returned ``d``. The standard way to combine
    BM25 with embedding ANN (hybrid search) without score calibration.

    Each input is a scored list (id, score); ranks are derived here
    with a global row_number over (score desc, id asc). That window is
    intentionally single-partition: RRF's published inputs are
    PER-SYSTEM TOP-K LISTS (the output of :func:`bm25_topk` /
    ``ann.cosine_topk`` — tens to thousands of rows), never a full
    corpus, so the global sort is over k rows per list. Fusing
    corpus-sized scored sets should rank before fusing. The fused
    groupBy keys on doc id and is partial-agg friendly.

    Returns the top ``top`` rows as (id, rrf_score, n_lists), score
    rounded to 6 places, ties broken on id ascending.
    """
    if not rankings:
        raise ValueError("rankings must contain at least one list")
    ranked = []
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    for r in rankings:
        ranked.append(
            r.select(
                F.col(id_col),
                F.row_number().over(w).alias("__rank"),
            )
        )
    allr = ranked[0]
    for r in ranked[1:]:
        allr = allr.unionByName(r)
    fused = allr.groupBy(id_col).agg(
        F.round(
            F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col("__rank"))), 6
        ).alias("rrf_score"),
        F.count(F.lit(1)).cast("bigint").alias("n_lists"),
    )
    return fused.orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    ).limit(top)


def focused_scores(
    links: DataFrame,
    topic_terms: list[str],
    dst_col: str = "dst",
    anchor_col: str = "anchor",
) -> DataFrame:
    """Focused-crawl relevance from anchor text (Chakrabarti, van den
    Berg & Dom, WWW 1999): a crawl targeting a topic ranks candidate
    URLs by how their in-link anchor text matches the topic terms —
    the strongest pre-fetch relevance signal available (the page body
    is not fetched yet).

    Per link: |anchor-token-set ∩ topic| (JVM array_intersect on a
    plan-literal topic array). Per candidate dst: SUM over in-links —
    many weakly-relevant anchors beat one strong one, the paper's
    linear accumulation. One dst-keyed partial agg (map-side combine),
    no other shuffle; feed the score into
    ``select_fetch_batch(priority_first=True)`` as the priority.
    """
    topic = F.array(*[F.lit(t.lower()) for t in topic_terms])
    toks = F.array_distinct(
        F.filter(
            F.split(F.lower(F.coalesce(F.col(anchor_col), F.lit(""))),
                    r"\s+"),
            lambda t: t != "",
        )
    )
    hit = F.size(F.array_intersect(toks, topic))
    return (
        links.select(F.col(dst_col).alias("dst"), hit.alias("__hit"))
        .groupBy("dst")
        .agg(F.sum("__hit").cast("long").alias("focus_score"))
    )
