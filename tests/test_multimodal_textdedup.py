"""Multimodal payload operators + text-dedup operator tests."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from dotnetspider_spark.operators.multimodal import (
    audio_features,
    decode_audio,
    decode_video,
    encode_fakeaudio,
    encode_fakevideo,
    frame_sample,
    image_features,
    resize_images,
)
from dotnetspider_spark.operators.textdedup import (
    minhash_band_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash64,
)
from dotnetspider_spark.testing.datagen import CorpusConfig, gen_corpus

CFG = CorpusConfig(n_pages=60, n_hosts=4)


@pytest.fixture(scope="module")
def corpus(spark):
    df = gen_corpus(spark, CFG, parallelism=2).cache()
    df.count()
    yield df
    df.unpersist()


# ------------------------------------------------------------ multimodal


def test_image_features_decodes_all(spark, corpus):
    feats = image_features(corpus).collect()
    assert len(feats) == CFG.n_pages
    assert all(r.decodable for r in feats)
    assert all(0 <= r.brightness <= 255 for r in feats)
    dims = {(r.image_id): (r.w, r.h) for r in feats}
    src = {(r.image_id): (r.w, r.h) for r in corpus.select("image_id", "w", "h").collect()}
    assert dims == src


def test_image_features_survives_garbage(spark, corpus):
    broken = corpus.withColumn(
        "bytes", F.when(F.col("page_id") < 5, F.lit(b"xx")).otherwise(F.col("bytes"))
    )
    feats = image_features(broken)
    assert feats.filter(~F.col("decodable")).count() == 5


def test_resize_images_roundtrip(spark, corpus):
    from dotnetspider_spark.codec.png import decode_png

    out = resize_images(corpus, 16, 16).collect()
    assert len(out) == CFG.n_pages
    for r in out[:5]:
        px = decode_png(bytes(r.bytes))
        assert px.shape == (16, 16, 3)


def test_video_codec_and_frame_sample(spark):
    rng = np.random.default_rng(5)
    rows = []
    for vid in range(4):
        frames = rng.integers(0, 256, (23, 8, 10, 3), dtype=np.uint8)
        rows.append((f"v{vid}", bytearray(encode_fakevideo(frames))))
    df = spark.createDataFrame(rows, "video_id string, bytes binary")
    sampled = frame_sample(df, every_n=10).collect()
    # 23 frames, every 10th -> idx 0,10,20 per video
    assert len(sampled) == 12
    assert {r.frame_idx for r in sampled} == {0, 10, 20}
    assert all(r.w == 10 and r.h == 8 for r in sampled)
    # real container decode is stubbed
    with pytest.raises(NotImplementedError):
        decode_video(b"\x00\x00\x00\x18ftypmp42" + b"0" * 32)


def test_audio_codec_and_features(spark):
    t = np.linspace(0, 1, 16000, dtype=np.float32)
    wave = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    data = encode_fakeaudio(wave, 16000)
    back, rate = decode_audio(data)
    assert rate == 16000 and np.abs(back - wave).max() < 1e-3
    df = spark.createDataFrame(
        [("a0", bytearray(data))], "audio_id string, bytes binary"
    )
    feats = audio_features(df, window_s=0.25).collect()
    assert len(feats) == 1
    r = feats[0]
    assert abs(r.rms - 0.3535) < 0.01  # sine rms = amp/sqrt(2)
    assert len(r.windows) == 4
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFF0000WAVE" + b"0" * 16)


# ------------------------------------------------------------- textdedup


def _docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "the quick brown fox jumps over the lazy dog tonight"),  # near-dup of 0
        (2, "completely different content about spark shuffles and joins"),
        (3, "the quick brown fox jumps over the lazy dog today"),  # exact dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_simhash_near_for_neardups_far_for_distinct(spark):
    d = _docs(spark)
    sims = {r.doc_id: r.sh for r in d.select("doc_id", simhash64(F.col("text")).alias("sh")).collect()}
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert sims[0] == sims[3]  # identical text, identical simhash
    assert ham(sims[0], sims[1]) <= 12  # 9/10 shared tokens
    assert ham(sims[0], sims[2]) > 16


def test_ngram_jaccard_pairs_finds_neardups(spark):
    d = _docs(spark)
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5).collect()
    }
    assert pairs[(0, 3)] == 1.0
    assert (0, 1) in pairs and 0.5 <= pairs[(0, 1)] < 1.0
    assert not any({a, b} == {0, 2} for a, b in pairs)


def test_shingles_short_docs_yield_empty_not_crash(spark):
    # Regression: sequence(0, size-n) DESCENDS for docs with < n tokens
    # (Spark sequence is bidirectional), which fed slice() a negative
    # start and threw INVALID_PARAMETER_VALUE.START. Short docs must
    # yield an empty shingle array, matching DuckDB's empty range.
    from dotnetspider_spark.operators.textdedup import shingles

    rows = [(0, ""), (1, "one"), (2, "one two"), (3, "one two three"),
            (4, "one two three four")]
    d = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.doc_id: r.sh for r in d.select("doc_id", shingles(F.col("text"), 3).alias("sh")).collect()}
    assert out[0] == [] and out[1] == [] and out[2] == []
    assert out[3] == ["one two three"]
    assert out[4] == ["one two three", "two three four"]
    # and the pair op itself survives a corpus containing short docs:
    # only (3,4) share a shingle; the short docs contribute nothing
    pairs = {(r.id_a, r.id_b): r.jaccard
             for r in ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5).collect()}
    assert pairs == {(3, 4): 0.5}


def test_minhash_lsh_candidates(spark):
    d = _docs(spark)
    sig = minhash_signature(d, "doc_id", "text", k=8)
    cand = {(r.id_a, r.id_b) for r in minhash_band_pairs(sig, "doc_id", k=8).collect()}
    assert (0, 3) in cand  # exact dups always collide
    assert not any({a, b} == {0, 2} for a, b in cand)


def test_gopher_filter_rules(spark):
    """Gopher rules (Rae et al. 2021 A1.1): each signal and the keep
    verdict on hand-built documents exercising every rule."""
    import pyspark.sql.functions as F

    from dotnetspider_spark.operators.textquality import gopher_filter

    good = "the quick brown fox jumps over the lazy dog and that " * 8
    docs = spark.createDataFrame(
        [
            (1, good),                                  # passes everything
            (2, "short text only"),                     # too few words
            (3, ("spam ham " * 40) + "the of and"),     # top-bigram repetition
            (4, "- a\n- b\n- c\n- d\nthe of and that have " + "word " * 50),
            (5, ("## " * 60) + "the of and"),           # symbol ratio
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in gopher_filter(
            docs, min_words=30, min_mean_word_len=3.0, min_stop_word_hits=2,
            max_bullet_line_frac=0.5,
        ).collect()
    }
    assert out[1].keep is True
    assert out[2].keep is False and out[2].n_words == 3
    assert out[3].keep is False and out[3].top_bigram_frac > 0.2
    assert out[4].keep is False and out[4].bullet_line_frac > 0.5
    assert out[5].keep is False and out[5].symbol_word_ratio > 0.1
    assert out[1].stop_word_hits >= 2 and out[1].dup_line_frac == 0.0


def test_image_quality_screening(spark):
    """Brightness/contrast/Laplacian-sharpness/entropy screening over
    synthetic PNGs: a flat gray card fails contrast+sharpness, a noisy
    card passes, an undecodable payload fails closed."""
    import numpy as np

    from dotnetspider_spark.codec.png import encode_png
    from dotnetspider_spark.operators.multimodal import image_quality

    rng = np.random.default_rng(3)
    flat = np.full((32, 32, 3), 128, dtype=np.uint8)
    noisy = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8).astype(np.uint8)
    rows = [
        ("flat", bytearray(encode_png(flat)), "png"),
        ("noisy", bytearray(encode_png(noisy)), "png"),
        ("broken", bytearray(b"notanimage"), "png"),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    out = {r.image_id: r for r in image_quality(df).collect()}
    assert out["flat"].decodable and not out["flat"].keep
    assert out["flat"].contrast == 0.0 and out["flat"].sharpness == 0.0
    assert out["noisy"].keep and out["noisy"].entropy > 3.0
    assert not out["broken"].decodable and not out["broken"].keep


def test_exact_substring_pairs_guaranteed_recall_and_cap(spark):
    """Docs sharing a substring >= k+w-1 chars MUST pair regardless of
    where it sits in each doc (winnowing selection is content-defined —
    the prefixes 5 and 10 chars long put the shared run at different
    offsets AND different residues mod any stride, the case a fixed
    stride grid misses); short docs don't crash; the boilerplate cap
    drops ubiquitous fingerprints."""
    from dotnetspider_spark.operators.textdedup import exact_substring_pairs

    shared = "the quick brown fox jumps over the lazy dog again"  # 50 chars
    rows = [
        (1, "AAAA " + shared + " unique tail one"),
        (2, "BBBBBBBBB " + shared + " other tail"),
        (3, "completely unrelated text with nothing shared at all here"),
        (4, "tiny"),  # shorter than k: empty fingerprint set, no crash
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = exact_substring_pairs(docs, k=30, w=8, max_window_freq=20)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got
    assert all(p == (1, 2) for p in got)

    # boilerplate cap: the same 50-char header on EVERY doc pairs
    # everything without the cap, nothing with cap < n_docs
    boiler = [(i, shared + f" body {i}") for i in range(10)]
    bdocs = spark.createDataFrame(boiler, "doc_id long, text string")
    assert exact_substring_pairs(bdocs, k=30, w=8, max_window_freq=5).count() == 0
    assert exact_substring_pairs(bdocs, k=30, w=8, max_window_freq=None).count() == 45


def test_unigram_lm_score_hand_computed(spark):
    """Tiny corpus where the unigram NLL is computable by hand:
    corpus = 'a a a b' -> p(a)=3/4, p(b)=1/4."""
    import math

    from dotnetspider_spark.operators.textquality import unigram_lm_score

    docs = spark.createDataFrame(
        [(1, "a a a"), (2, "b")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in unigram_lm_score(docs, head_nll=0.5, tail_nll=1.0).collect()}
    assert got[1].n_tokens == 3 and got[2].n_tokens == 1
    assert abs(got[1].avg_nll - (-math.log(0.75))) < 1e-6   # 0.287682 -> head
    assert abs(got[2].avg_nll - (-math.log(0.25))) < 1e-6   # 1.386294 -> tail
    assert got[1].bucket == "head" and got[2].bucket == "tail"


def test_dedup_against_corpus_is_cross_corpus_only(spark):
    """Planted exact dup of a corpus doc is dropped; fresh docs are
    kept; near-identical NEW docs both survive (this op dedups the new
    batch AGAINST the corpus, never against itself — within-batch dedup
    is the self-join op's job)."""
    from dotnetspider_spark.operators.textdedup import dedup_against_corpus

    corpus = spark.createDataFrame(
        [(i, f"archived corpus record {i} lorem ipsum dolor sit amet {i}")
         for i in range(10)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (100, "archived corpus record 3 lorem ipsum dolor sit amet 3"),  # = corpus 3
            (101, "fresh crawl page about distributed winnowing and spark"),
            (102, "fresh crawl page about distributed winnowing and flink"),  # ~ 101
            (103, "totally unrelated new content zzz yyy xxx"),
        ],
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in dedup_against_corpus(new, corpus, k=4).collect()}
    assert kept == {101, 102, 103}


def test_winnowing_fingerprints_match_pure_python_reference(spark):
    """Pin exact_substring_pairs' fingerprint selection against an
    independent pure-Python winnowing implementation (Schleimer et al.
    2003, min-of-each-window variant) on seeded random docs — every
    selected (id, fingerprint) must agree, not just the final pairs."""
    import hashlib
    import random

    from dotnetspider_spark.operators.textdedup import winnow_fingerprints

    k, w = 12, 5
    rng = random.Random(42)
    alpha = "abcdefgh "
    docs = [
        (i, "".join(rng.choice(alpha) for _ in range(rng.randint(3, 120))))
        for i in range(30)
    ]

    def h64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def winnow(text: str) -> set:
        grams = [h64(text[i:i + k]) for i in range(len(text) - k + 1)]
        if not grams:
            return set()
        if len(grams) < w:
            return {min(grams)}
        return {min(grams[j:j + w]) for j in range(len(grams) - w + 1)}

    expected = {(i, fp) for i, t in docs for fp in winnow(t)}

    # the operator's own selection stage (the pair join on top of it is
    # pinned by the other tests)
    fps = winnow_fingerprints(F.col("text"), k, w)
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        (r.doc_id, fp)
        for r in df.select("doc_id", fps.alias("fps")).collect()
        for fp in r.fps
    }
    assert got == expected
