"""Text deduplication operators — the training-data-pipeline suite.

Exact dedup, MinHash+LSH, SimHash, and n-gram Jaccard over a documents
table (driver mandate; the reference itself has no content dedup — its
only dedup is the request-identity seen set, SURVEY §2.1). Everything
here is pure built-in expressions (codegen, shuffle-friendly), designed
so each op has a DuckDB-expressible twin in ``__spark_entry__``.

Scale shapes:
- shingling explodes ~L tokens/doc -> the self-joins key on the shingle/
  band hash, the classic high-cardinality shuffle; hot shingles (stop
  phrases) are the skew risk — mitigate by dropping top-frequency
  shingles (``max_shingle_freq``) before joining, the standard trick.
- SimHash reduces each doc to one 64-bit int; near-dup candidates come
  from band-equality self-joins like phash (operators/validate.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    """Whitespace tokens, empties removed."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as strings ("a b c").

    Docs with fewer than ``n`` tokens yield an empty array: Spark's
    sequence(0, -1) is DESCENDING [0, -1] (not empty), which would feed
    slice() a negative start and throw INVALID_PARAMETER_VALUE.START —
    guard so the sequence is only built when size(toks) >= n."""
    toks = tokens(text)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _hash64(s: Column) -> Column:
    """Deterministic 60-bit hash both Spark and DuckDB can compute
    identically: the first 15 hex chars of md5 as a BIGINT — 60 bits
    keeps every value inside signed-int64 range on both engines.
    (xxhash64 exists only Spark-side; md5 is portable.)"""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def simhash64(text: Column, n_bits: int = 64) -> Column:
    """SimHash over whitespace tokens: per-token 64-bit hash, bitwise
    majority vote across tokens. Pure expressions: aggregate() folds the
    token array into ``n_bits`` per-bit counters held as an array<int>.
    Bit positions are Python-loop constants (shiftrightunsigned requires
    a literal shift), so the expression tree is wide but codegen'd once."""
    tok_hashes = F.transform(tokens(text), _hash64)
    zero = F.array_repeat(F.lit(0), n_bits)

    def bit_votes(h: Column) -> Column:
        return F.array(
            *[
                F.when(
                    F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1))
                for b in range(n_bits)
            ]
        )

    counts = F.aggregate(
        tok_hashes, zero, lambda acc, h: F.zip_with(acc, bit_votes(h), lambda a, v: a + v)
    )
    out = F.lit(0).cast("long")
    for b in range(n_bits):
        mask = (1 << b) if b < 63 else -(1 << 63)  # bit 63 = sign bit of int64
        out = out.bitwiseOR(
            F.when(F.element_at(counts, b + 1) > 0, F.lit(mask).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return out


def minhash_signature(docs: DataFrame, id_col: str, text_col: str, k: int = 8) -> DataFrame:
    """k-permutation MinHash signature via salted md5 minima.

    MAP-ONLY: each signature is a per-row ``aggregate()`` fold over the
    token array — zero shuffle. The naive shape (explode tokens ->
    groupBy doc -> k min aggs) ships every token through an exchange
    keyed by doc_id: at 10^10 docs x ~10^3 tokens that is a 10^13-row
    shuffle for a value each row can compute locally. The fold keeps a
    k-wide running-minimum array and costs the same k md5s per token,
    all inside whole-stage codegen. Values are identical (min over the
    same salted-hash set), so the DuckDB unnest/GROUP BY oracle still
    matches byte-for-byte.

    Zero-token docs are dropped, matching the explode+groupBy shape
    (explode of an empty array emits nothing)."""
    toks = tokens(F.col(text_col))
    # "~" (0x7e) sorts after every md5 hex char, so it is the fold's +inf
    init = F.array_repeat(F.lit("~"), k)
    sig = F.aggregate(
        toks,
        init,
        lambda acc, t: F.zip_with(
            acc,
            F.array(*[F.md5(F.concat(F.lit(f"s{i}|"), t)) for i in range(k)]),
            lambda a, b: F.least(a, b),
        ),
    )
    return docs.where(F.size(toks) > 0).select(
        F.col(id_col),
        *[F.element_at(sig, i + 1).alias(f"mh{i}") for i in range(k)],
    )


def _band_explode(
    signatures: DataFrame, id_col: str, k: int, rows_per_band: int
) -> DataFrame:
    """(id, band, key) rows: one per LSH band of each signature."""
    n_bands = k // rows_per_band
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "|",
                    *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)],
                ).alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    return signatures.select(
        F.col(id_col).alias("id"), F.explode(bands).alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def minhash_band_pairs(
    signatures: DataFrame, id_col: str, k: int = 8, rows_per_band: int = 2
) -> DataFrame:
    """LSH banding: docs sharing any band of their signature become
    candidate pairs (id_a < id_b, deduped)."""
    exploded = _band_explode(signatures, id_col, k, rows_per_band)
    right = exploded.select(
        F.col("id").alias("id_b"), F.col("band").alias("band_b"),
        F.col("key").alias("key_b"),
    )
    pairs = exploded.join(
        right,
        (F.col("band") == F.col("band_b"))
        & (F.col("key") == F.col("key_b"))
        & (F.col("id") < F.col("id_b")),
    )
    return pairs.select(F.col("id").alias("id_a"), "id_b").distinct()


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = 1000,
) -> DataFrame:
    """All document pairs with n-gram Jaccard similarity >= threshold.

    Distinct shingles per doc -> self-join on shingle -> intersection
    counts -> |A∪B| = |A|+|B|-|A∩B|. ``max_shingle_freq`` drops ubiquitous
    shingles before the join (skew guard; slightly conservative, standard
    practice)."""
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode_outer(F.array_distinct(shingles(F.col(text_col), n))).alias("sh"),
    ).filter(F.col("sh").isNotNull())
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    if max_shingle_freq is not None:
        freq = sh.groupBy("sh").agg(F.count("*").alias("f"))
        sh = sh.join(freq.filter(F.col("f") <= max_shingle_freq), "sh", "inner").select(
            "id", "sh"
        )
    right = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = (
        sh.join(right, (F.col("sh") == F.col("sh_b")) & (F.col("id") < F.col("id_b")))
        .groupBy("id", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("id"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    scored = (
        inter.join(sa, "id").join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return scored.select(
        F.col("id").alias("id_a"), "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def winnow_fingerprints(text: Column, k: int, w: int) -> Column:
    """Winnowing fingerprint array for one text column: hash every
    k-char gram, select the MIN hash of each window of ``w`` consecutive
    gram hashes, distinct. All one codegen'd expression — the gram-hash
    array never leaves the projection. Docs shorter than k yield an
    empty array; docs with 1..w-1 grams yield one fingerprint (min of
    all) so no doc with a full k-gram is invisible."""
    # gram hashes h[1..n], n = len-k+1; guard len<k (Spark sequence
    # with stop<start is DESCENDING, not empty)
    grams = F.when(
        F.length(text) >= k,
        F.transform(
            F.sequence(F.lit(1), F.length(text) - (k - 1)),
            lambda i: _hash64(F.substring(text, i, k)),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return F.array_distinct(
        F.when(
            F.size(grams) >= w,
            F.transform(
                F.sequence(F.lit(1), F.size(grams) - (w - 1)),
                lambda j: F.array_min(F.slice(grams, j, w)),
            ),
        ).otherwise(
            F.when(F.size(grams) > 0, F.array(F.array_min(grams))).otherwise(
                F.array().cast("array<bigint>")
            )
        )
    )


def exact_substring_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 30,
    w: int = 8,
    max_window_freq: int | None = 50,
) -> DataFrame:
    """Document pairs sharing an exact substring of >= k + w - 1 chars,
    via winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD
    2003, "Winnowing: Local Algorithms for Document Fingerprinting" —
    the MOSS algorithm). Distributed stand-in for suffix-array
    exact-substring dedup (Lee et al. 2021, "Deduplicating Training
    Data Makes Language Models Better"; the reference has no content
    dedup, SURVEY §2.1 — this is driver-mandate pipeline coverage).

    Per doc: hash every k-char gram (one JVM-side ``transform`` over a
    position sequence — no explode of raw grams), then select the MIN
    hash of every window of ``w`` consecutive gram hashes. Selection is
    content-defined, so it is position-independent: a substring shared
    at ANY offsets in two docs yields the same gram-hash run in both,
    and if the run spans a full window (length >= k + w - 1) its
    minimum is selected in both — guaranteed recall above that length.
    (A fixed-stride grid does NOT have this property: windows only
    align when the two offsets agree mod stride.) Expected fingerprint
    density is ~2/(w+1) of positions, so the explode that feeds the
    join is ~w/2 times smaller than the gram count.

    Scale shape: the gram-hash array (~8B x len) lives inside one
    codegen'd projection; only the selected per-doc DISTINCT
    fingerprints explode -> the self-join keys on the 60-bit hash,
    shipping (id, hash) only — never text. ``max_window_freq`` drops
    boilerplate fingerprints (headers, license blurbs) before the
    join: the classic quadratic-blowup skew guard, same role as
    ``max_shingle_freq`` above."""
    fps = winnow_fingerprints(F.col(text_col), k, w)
    wdf = (
        docs.select(F.col(id_col).alias("id"), F.explode(fps).alias("wh"))
        .distinct()
    )
    if max_window_freq is not None:
        freq = wdf.groupBy("wh").agg(F.count("*").alias("f"))
        wdf = wdf.join(freq.filter(F.col("f") <= max_window_freq), "wh").select(
            "id", "wh"
        )
    right = wdf.select(F.col("id").alias("id_b"), F.col("wh").alias("wh_b"))
    return (
        wdf.join(right, (F.col("wh") == F.col("wh_b")) & (F.col("id") < F.col("id_b")))
        .select(F.col("id").alias("id_a"), "id_b")
        .distinct()
    )


def dedup_against_corpus(
    new_docs: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    rows_per_band: int = 2,
    threshold: float = 0.7,
) -> DataFrame:
    """Incremental near-dedup of a NEW batch against an EXISTING corpus
    — the "dedup this crawl dump against everything already ingested"
    step every refreshed training set runs (RefinedWeb dedups each
    CommonCrawl dump against all earlier dumps, Penedo et al. 2023
    §3.3). Returns the new rows that survive: no corpus doc with
    word-token Jaccard >= ``threshold`` among the LSH band candidates.

    Scale shape (why this is not the self-join op): candidates come
    from an equi-join of the NEW batch's band keys against the corpus's
    band keys — cross-corpus only, so cost scales with the new batch,
    not with the 10^10-doc corpus (whose band table is append-only
    state a refresh pipeline maintains incrementally and can bucket by
    key). The exact-Jaccard verify touches corpus token sets ONLY for
    candidate ids (semi-join first), and the final keep is an id-keyed
    anti-join — corpus text never rides a shuffle."""
    sig_n = minhash_signature(new_docs, id_col, text_col, k)
    sig_c = minhash_signature(corpus, id_col, text_col, k)
    bn = _band_explode(sig_n, id_col, k, rows_per_band)
    bc = _band_explode(sig_c, id_col, k, rows_per_band).select(
        F.col("id").alias("cid"), "band", "key"
    )
    cand = bn.join(bc, ["band", "key"]).select("id", "cid").distinct()
    tok = lambda df, out: df.select(
        F.col(id_col).alias(out),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    )
    ntok = tok(new_docs.join(cand.select("id").distinct(),
                             new_docs[id_col] == F.col("id"), "left_semi"), "id")
    ctok = tok(corpus.join(cand.select("cid").distinct(),
                           corpus[id_col] == F.col("cid"), "left_semi"), "cid")
    nsz = ntok.groupBy("id").agg(F.count("*").alias("n_a"))
    csz = ctok.groupBy("cid").agg(F.count("*").alias("n_b"))
    inter = (
        cand.join(ntok, "id")
        .join(ctok, ["cid", "tok"])
        .groupBy("id", "cid")
        .agg(F.count("*").alias("n_inter"))
    )
    dup = (
        inter.join(nsz, "id")
        .join(csz, "cid")
        .filter(
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            )
            >= threshold
        )
        .select(F.col("id").alias(id_col))
        .distinct()
    )
    return new_docs.join(dup, id_col, "left_anti")
