"""BPE pair-count induction (operators/tokenizer.py) + bigram LM
scoring (textquality.bigram_lm_score) against hand-computed models."""

from __future__ import annotations

import math

from dotnetspider_spark.operators.textquality import bigram_lm_score
from dotnetspider_spark.operators.tokenizer import (
    bpe_pair_counts,
    word_frequencies,
)


def test_word_frequencies_lowercases_and_counts_occurrences(spark):
    df = spark.createDataFrame(
        [(0, "Low low  LOW"), (1, "low high")], "doc_id long, text string"
    )
    got = {r.word: r.n_occurrences for r in word_frequencies(df).collect()}
    assert got == {"low": 4, "high": 1}


def test_bpe_pair_counts_weights_by_word_frequency(spark):
    # "abab" x3 occurrences: pairs ab,ba,ab -> ab:2/occ, ba:1/occ
    # "ba" x1: ba:1 ; single chars contribute nothing
    df = spark.createDataFrame(
        [(0, "abab abab ba"), (1, "abab x")], "doc_id long, text string"
    )
    got = {r.pair: r.n for r in bpe_pair_counts(df, k=10).collect()}
    assert got == {"ab": 6, "ba": 4}


def test_bpe_topk_tie_breaks_on_pair_ascending(spark):
    df = spark.createDataFrame([(0, "ab cd")], "doc_id long, text string")
    rows = bpe_pair_counts(df, k=1).collect()
    assert [(r.pair, r.n) for r in rows] == [("ab", 1)]


def _bigram_ref(texts, alpha=1.0):
    """Pure-python add-alpha bigram NLL per doc."""
    toks = {i: t.split() for i, t in texts}
    bigrams = {}
    hist = {}
    vocab = set()
    for ws in toks.values():
        vocab.update(ws)
        for a, b in zip(ws, ws[1:]):
            bigrams[(a, b)] = bigrams.get((a, b), 0) + 1
            hist[a] = hist.get(a, 0) + 1
    v = float(len(vocab))
    out = {}
    for i, ws in toks.items():
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            out[i] = (0, None)
            continue
        nll = sum(
            math.log(hist[a] + alpha * v) - math.log(bigrams[(a, b)] + alpha)
            for a, b in pairs
        ) / len(pairs)
        out[i] = (len(pairs), round(nll, 6))
    return out


def test_bigram_lm_matches_pure_python_reference(spark):
    texts = [
        (0, "the cat sat on the mat"),
        (1, "the cat sat"),
        (2, "zebra quark"),
        (3, "solo"),  # no bigrams: NULL nll, middle bucket
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_bigrams, r.avg_nll, r.bucket)
        for r in bigram_lm_score(df, head_nll=2.5, tail_nll=3.0).collect()
    }
    ref = _bigram_ref(texts)
    for i, (n, nll) in ref.items():
        assert got[i][0] == n
        assert got[i][1] == nll
    assert got[3] == (0, None, "middle")
    # repeated common bigrams score lower NLL than unseen-history pairs
    assert got[0][1] < got[2][1]


def _pyref_bpe(word_freqs: dict[str, int], n_merges: int):
    """Pure-Python Sennrich et al. 2016 reference: per round, count
    adjacent symbol pairs weighted by word frequency, merge the most
    frequent (ties: lexicographically smallest (left, right)), apply
    left-to-right greedily."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        stats: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + f
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (l, r), n = best
        merges.append((l, r, n))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_bpe_train_matches_pure_python_reference(spark):
    from dotnetspider_spark.operators.tokenizer import bpe_train

    texts = [
        "lower lower lowest low low low newer newer wider wide",
        "new newer newest low slow slower the the the the then",
        "aaaa aaa aa banana bandana cabana",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    # reference operates on the same word-frequency table
    wf: dict[str, int] = {}
    for t in texts:
        for w in t.lower().split():
            wf[w] = wf.get(w, 0) + 1
    want = _pyref_bpe(wf, n_merges=12)
    got = bpe_train(docs, n_merges=12)
    assert got == want


def test_bpe_segment_applies_merges_greedily(spark):
    from dotnetspider_spark.operators.tokenizer import bpe_segment, bpe_train

    docs = spark.createDataFrame(
        [(0, "banana band"), (1, "aaaa")], "doc_id long, text string"
    )
    merges = bpe_train(docs, n_merges=3)
    out = {r.doc_id: (r.n_words, r.n_subwords) for r in
           bpe_segment(docs, merges).collect()}
    assert out[0][0] == 2 and out[1][0] == 1
    # replay the same merges in python and compare subword counts
    def seg_count(text):
        total = 0
        for w in text.lower().split():
            syms = list(w)
            for l, r, _ in merges:
                o, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                        o.append(l + r); i += 2
                    else:
                        o.append(syms[i]); i += 1
                syms = o
            total += len(syms)
        return total
    assert out[0][1] == seg_count("banana band")
    assert out[1][1] == seg_count("aaaa")


def test_bpe_train_max_words_cap_matches_truncated_reference(spark):
    from dotnetspider_spark.operators.tokenizer import bpe_train

    texts = ["low low low lower lowest wide wider new newer newest the the"]
    docs = spark.createDataFrame([(0, texts[0])], "doc_id long, text string")
    wf: dict[str, int] = {}
    for w in texts[0].split():
        wf[w] = wf.get(w, 0) + 1
    # cap = top-4 words by (freq desc, word asc); reference sees only those
    top4 = dict(sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))[:4])
    want = _pyref_bpe(top4, n_merges=5)
    got = bpe_train(docs, n_merges=5, max_words=4)
    assert got == want
