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
