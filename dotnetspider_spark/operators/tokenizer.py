"""Tokenizer induction over the corpus — the BPE statistics pass.

Training a BPE tokenizer (Sennrich, Haddow & Birch 2016, "Neural
Machine Translation of Rare Words with Subword Units") is itself a
corpus-scale aggregation problem: every merge step ranks adjacent
symbol pairs by corpus frequency. This module implements that counting
pass as pure DataFrame algebra — the piece of tokenizer training that
must see all 100 TB; the merge LOOP itself is vocabulary-sized
(driver-friendly by definition: one merge per step over a dict that
fits in memory, exactly how the published implementations do it).

Scale shape — the Sennrich trick, distributed: pair counts are NOT
taken over token occurrences. The corpus first collapses to its word
FREQUENCY table (one partial-agg'd groupBy on the token string —
Heaps'-law-sized, not corpus-sized), pairs are generated per DISTINCT
word, and occurrence weights multiply back in. A 10^12-token corpus
with a 10^8-type vocabulary ships 10^8 rows into the pair stage, not
10^12. The final top-k is orderBy+limit -> TakeOrderedAndProject.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Corpus word-frequency table: (word, n_occurrences), lowercased
    whitespace tokens. One exploding projection + one partial-agg'd
    groupBy keyed on the token string."""
    from .textdedup import tokens

    return (
        docs.select(
            F.explode(tokens(F.lower(F.col(text_col)))).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
    )


def bpe_pair_counts(
    docs: DataFrame,
    k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Top-k adjacent character pairs by corpus frequency — the ranking
    that drives BPE merge step 1. Each distinct word contributes its
    adjacent character pairs weighted by the word's occurrence count
    (a pair appearing twice inside one word counts twice per
    occurrence, matching the reference BPE formulation).

    Returns (pair, n) ordered n DESC then pair ASC (deterministic
    tie-break), limited to ``k``.
    """
    wf = word_frequencies(docs, text_col=text_col)
    # adjacent char pairs per DISTINCT word; substring needs a column
    # position, so the lambda lives in expression syntax
    pairs = F.expr(
        "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"
    )
    exploded = wf.filter(F.length("word") >= 2).select(
        F.explode(pairs).alias("pair"), "n_occurrences"
    )
    counted = exploded.groupBy("pair").agg(
        F.sum("n_occurrences").cast("long").alias("n")
    )
    return counted.orderBy(F.col("n").desc(), F.col("pair").asc()).limit(k)


def bpe_train(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    max_words: int | None = None,
) -> list[tuple[str, str, int]]:
    """Full iterative BPE merge training (Sennrich et al. 2016 §3.2),
    distributed: the corpus collapses ONCE to its word-frequency table
    (the only pass that sees all 100 TB — Heaps'-law-sized output),
    each word becomes its character-symbol array, and every merge
    round is (a) one partial-agg'd pair count over the distinct-word
    table, (b) one vocabulary-sized top-1 to the driver (count DESC,
    then left/right symbol ASC — the deterministic tie-break the
    pytest pins against a pure-Python reference), (c) a JVM-side fold
    (``aggregate`` over the symbol array) applying the merge
    left-to-right greedily, exactly the published single-machine
    semantics. No Python touches the data path; the driver sees one
    (pair, count) row per round.

    The per-round scalar collect is the same shape as PageRank's
    dangling-mass term (graph.py): vocabulary-sized work per
    iteration, corpus-sized work only in round zero. Lineage is cut by
    re-persisting the (symbols, freq) table each round and unpersisting
    the previous one, so round R does not replay rounds 0..R-1.

    ``max_words``: cap the per-round table to the top-N words by
    frequency (ties to the lexicographically smaller word). Every
    published trainer effectively does this — the frequency tail
    contributes negligibly to pair counts but dominates row count under
    Heaps' law — and it turns the per-round pass from
    O(distinct words) into O(max_words) regardless of corpus size. The
    cap is a single TakeOrderedAndProject (no full sort). None = exact.

    Returns the merge sequence ``[(left, right, count), ...]`` — the
    tokenizer artifact itself (apply order = list order).
    """
    wf = word_frequencies(docs, text_col=text_col)
    if max_words is not None:
        wf = wf.orderBy(
            F.col("n_occurrences").desc(), F.col("word").asc()
        ).limit(max_words)
    words = wf.select(
        F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
        .alias("syms"),
        F.col("n_occurrences").alias("freq"),
    ).persist()
    words.count()

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = F.expr(
            "transform(sequence(1, size(syms) - 1),"
            " i -> struct(syms[i - 1] AS l, syms[i] AS r))"
        )
        top = (
            words.filter(F.size("syms") >= 2)
            .select(F.explode(pairs).alias("p"), "freq")
            .groupBy("p")
            .agg(F.sum("freq").cast("long").alias("n"))
            .orderBy(F.col("n").desc(), F.col("p.l").asc(), F.col("p.r").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, count = top[0].p.l, top[0].p.r, int(top[0].n)
        merges.append((left, right, count))
        # left-to-right greedy merge as a pure fold: carry (out, last);
        # when last==left and x==right emit the merged symbol instead
        merged = F.aggregate(
            F.col("syms"),
            F.struct(
                F.array().cast("array<string>").alias("out"),
                F.lit(None).cast("string").alias("last"),
            ),
            lambda acc, x: F.when(
                acc.getField("last").eqNullSafe(F.lit(left)) & (x == F.lit(right)),
                F.struct(
                    F.concat(acc.getField("out"), F.array(F.lit(left + right))).alias(
                        "out"
                    ),
                    F.lit(None).cast("string").alias("last"),
                ),
            ).otherwise(
                F.struct(
                    F.when(
                        acc.getField("last").isNull(), acc.getField("out")
                    )
                    .otherwise(
                        F.concat(acc.getField("out"), F.array(acc.getField("last")))
                    )
                    .alias("out"),
                    x.alias("last"),
                )
            ),
            lambda acc: F.when(
                acc.getField("last").isNull(), acc.getField("out")
            ).otherwise(F.concat(acc.getField("out"), F.array(acc.getField("last")))),
        )
        nxt = words.select(merged.alias("syms"), "freq").persist()
        nxt.count()
        words.unpersist()
        words = nxt
    words.unpersist()
    return merges


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a trained merge sequence to the corpus: per doc, lowercase
    whitespace words re-segment through the merges in training order
    (greedy left-to-right per merge, matching :func:`bpe_train`).
    Vectorized pandas UDF — the merge list rides the closure; output
    (id, n_words, n_subwords) summarizes the segmentation (the token
    count the packing/budget planners consume)."""
    from pyspark.sql.functions import pandas_udf

    merge_seq = [(l, r) for l, r, _ in merges]

    @pandas_udf("struct<n_words:long, n_subwords:long>")
    def seg(texts: pd.Series) -> pd.DataFrame:
        nw, ns = [], []
        for t in texts:
            words = [w for w in (t or "").lower().split() if w]
            total = 0
            for w in words:
                syms = list(w)
                for l, r in merge_seq:
                    out, i = [], 0
                    while i < len(syms):
                        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                            out.append(l + r)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    syms = out
                total += len(syms)
            nw.append(len(words))
            ns.append(total)
        return pd.DataFrame({"n_words": nw, "n_subwords": ns})

    return docs.select(
        F.col(id_col),
        seg(F.col(text_col)).alias("__s"),
    ).select(id_col, F.col("__s.n_words").alias("n_words"),
             F.col("__s.n_subwords").alias("n_subwords"))
