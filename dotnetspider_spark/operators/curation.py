"""Corpus-curation operators — the training-data pipeline tail.

Beyond-reference (driver mandate): the ops a 100 TB pretraining-data
pipeline runs AFTER crawling — benchmark decontamination, PII
redaction, text normalization, and embedding-space semantic dedup. All
public algorithms:

- :func:`decontaminate` — word-n-gram overlap against a benchmark/eval
  set (the Brown et al. 2020 appendix-C / Dodge et al. 2021 C4-audit
  method): a training doc is contaminated when any of its n-grams
  appears in the benchmark n-gram set.
- :func:`pii_scrub` / :func:`pii_counts` — regex redaction of emails,
  E.164-ish phone numbers and IPv4 addresses (the standard
  CCNet/Dolma-style scrub pass), pure ``regexp_replace`` codegen.
- :func:`normalize_text` — deterministic lowercase/whitespace/punct
  normalization as one codegen'd column expression.
- :func:`semantic_dedup` — SemDeDup (Abbas et al. 2023, public): assign
  each embedding to its nearest centroid, find intra-bucket pairs with
  cosine ≥ threshold, cluster them (connected components), keep the
  minimum-id vector per cluster.
- :func:`image_caption_screen` — the LAION/DataComp structural gates
  for image–caption pairs (resolution, aspect ratio, caption length,
  alphabetic fraction, format) as map-only column algebra over the
  north-rule pair table shape.
- :func:`remove_duplicate_lines` — the C4 cleanup rule (Raffel et al.
  2020): discard any line occurring ≥3 times anywhere in the corpus.
- :func:`deterministic_sample` / :func:`stratified_sample` — hash-based
  reproducible sampling (uniform / per-stratum, e.g. language
  rebalancing): the sample is a function of the key, identical across
  runs, engines and partitionings.

Scale notes (the 100 TB shapes):

- ``decontaminate`` broadcast-joins the benchmark gram set (benchmarks
  are MBs, corpora are TBs): docs explode their DISTINCT grams
  map-side, the broadcast inner join prunes ~everything, and only HIT
  rows (rare by construction) reach the per-doc aggregation shuffle.
  The returned frame joins hit counts back by id — text never rides
  the gram exchange.
- ``pii_scrub``/``normalize_text`` are map-only whole-stage-codegen
  expressions — zero shuffles, no Python.
- ``semantic_dedup`` buckets first so the pair join is per-bucket (the
  SemDeDup trick that makes n² tractable); the pair join carries
  (bucket, id, vec) but only within buckets, and the cluster/keep tail
  shuffles ids only (``graph.dedup_keep_canonical``).

No analog in the reference (its dedup is per-request identity:
HashSetDuplicateRemover.cs); these are driver-mandate additions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .graph import dedup_keep_canonical
from .textdedup import shingles

# -- PII regexes ------------------------------------------------------
# Kept to portable syntax (no lookarounds/back-references) so the exact
# same pattern runs under Spark (Java regex) and DuckDB (RE2) — that is
# what makes the scrub oracle-checkable.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"


def normalize_text(text: Column) -> Column:
    """Canonical text form: lowercase, strip non-alphanumeric-or-space
    characters, collapse whitespace runs, trim. One codegen'd
    expression — the normalization pass before hashing/fingerprinting
    so trivially-different bytes dedup together."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[^a-z0-9\s]", " ")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def pii_scrub(text: Column) -> Column:
    """Redact emails, phone-number-shaped digit runs and IPv4 addresses
    to typed placeholders. Email first: a phone-ish digit run inside an
    address must not be half-redacted before the email pattern sees it."""
    t = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    t = F.regexp_replace(t, IPV4_RE, "<IP>")
    return F.regexp_replace(t, PHONE_RE, "<PHONE>")


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-row match counts (audit columns for a scrub report)."""
    return {
        "n_email": F.regexp_count(text, F.lit(EMAIL_RE)),
        "n_ip": F.regexp_count(F.regexp_replace(text, EMAIL_RE, "<EMAIL>"), F.lit(IPV4_RE)),
        "n_phone": F.regexp_count(
            F.regexp_replace(
                F.regexp_replace(text, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
            ),
            F.lit(PHONE_RE),
        ),
    }


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Flag training docs sharing any word ``n``-gram with the benchmark
    set (Brown et al. 2020 appendix C). Returns one row per input doc:
    (id, n_hit_grams = #distinct contaminated grams, contaminated).

    Shape: benchmark grams are distinct'd then BROADCAST; docs explode
    their distinct grams map-side and inner-join — only hit rows (rare)
    reach the per-doc count shuffle, and doc text never leaves the
    final id-keyed join."""
    bench_grams = (
        benchmark.select(
            F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("gram")
        )
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("gram"),
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit_grams"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hit_grams", F.lit(0)).alias("n_hit_grams"),
            (F.coalesce("n_hit_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def remove_duplicate_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_occurrences: int = 3,
    sep: str = "\n",
) -> DataFrame:
    """Corpus-level duplicate-line removal (the C4 cleanup rule,
    Raffel et al. 2020: discard any line occurring ≥3 times in the
    corpus — boilerplate nav/footer/cookie banners). Returns one row
    per input doc: (id, clean_text, n_lines_kept, n_lines_removed),
    document line order preserved.

    Shape (two shuffles, the published C4 pipeline's own cost): line
    counts aggregate with map-side partial agg keyed on the line;
    the duplicate set (counts ≥ N — far smaller than the corpus) anti-
    joins the exploded lines; reassembly groups by doc id carrying
    (pos, line) only. At 10^10 docs key the count/anti-join stages on
    ``xxhash64(line)`` instead of the raw line bytes to shrink the
    exchange (the oracle-parity version here keys on the line itself).
    Empty lines are kept verbatim (they are structure, not content)
    and never counted as duplicates."""
    import re as _re

    # F.split takes a REGEX but array_join takes a literal — quote the
    # separator so a metachar sep ("|", ".") splits literally instead of
    # silently exploding every character
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep))).alias("pos", "line"),
    )
    dup = (
        lines.filter(F.col("line") != "")
        .groupBy("line")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_occurrences)
        .select("line")
    )
    kept = lines.join(dup, "line", "left_anti")
    reassembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias("clean_text"),
        F.count("*").alias("n_lines_kept"),
    )
    totals = docs.select(
        F.col(id_col), F.size(F.split(F.col(text_col), sep)).alias("n_total")
    )
    return totals.join(reassembled, id_col, "left").select(
        id_col,
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("n_lines_kept", F.lit(0)).alias("n_lines_kept"),
        (F.col("n_total") - F.coalesce("n_lines_kept", F.lit(0))).alias(
            "n_lines_removed"
        ),
    )


def image_caption_screen(
    pairs: DataFrame,
    min_side: int = 64,
    max_aspect: float = 3.0,
    min_caption_tokens: int = 3,
    max_caption_tokens: int = 128,
    min_alpha_frac: float = 0.5,
    formats: tuple[str, ...] = ("png", "jpeg"),
) -> DataFrame:
    """LAION/DataComp-style image–caption pair curation filter.

    Input is the north-rule pair table shape (``image_id, w, h, fmt,
    caption``); output adds the audit columns and a ``keep`` verdict:
    both sides ≥ ``min_side`` px, aspect ratio ≤ ``max_aspect``,
    caption token count in range, alphabetic-token fraction ≥
    ``min_alpha_frac``, format allowed. Pure map-only whole-stage
    codegen — no Python, no shuffle — so it composes with the decode /
    phash stages without adding an exchange. (The CLIP-score filter the
    published pipelines add on top needs a model; the structural gates
    here are the model-free subset.)"""
    toks = F.filter(F.split(F.col("caption"), r"\s+"), lambda t: t != "")
    n_toks = F.size(toks)
    alpha = F.size(F.filter(toks, lambda t: t.rlike("^[A-Za-z]+$")))
    alpha_frac = F.when(n_toks > 0, alpha / n_toks).otherwise(F.lit(0.0))
    aspect = (
        F.greatest("w", "h").cast("double") / F.least("w", "h").cast("double")
    )
    keep = (
        (F.least("w", "h") >= min_side)
        & (aspect <= max_aspect)
        & (n_toks >= min_caption_tokens)
        & (n_toks <= max_caption_tokens)
        & (alpha_frac >= min_alpha_frac)
        & F.col("fmt").isin(*formats)
    )
    return pairs.select(
        "image_id",
        "w",
        "h",
        F.round(aspect, 6).alias("aspect"),
        n_toks.cast("int").alias("n_caption_tokens"),
        F.round(alpha_frac, 6).alias("caption_alpha_frac"),
        keep.alias("keep"),
    )


def semantic_dedup(
    embeddings: DataFrame,
    centroids,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): keep one representative per
    semantic-duplicate cluster. Buckets = nearest fixed centroid
    (argmax cosine, ties -> lowest centroid index); duplicate pairs =
    same-bucket cosine ≥ ``threshold``; clusters = connected
    components; survivor = minimum id. Returns the surviving rows of
    ``embeddings``.

    At scale: centroids come from ``ann.train_centroids`` on a sample;
    the pair join is per-bucket (n²/k instead of n²), and the
    cluster/keep tail shuffles ids only."""
    from .ann import assign_buckets

    import numpy as np

    c = np.asarray(centroids, dtype=np.float64)
    indexed = assign_buckets(
        embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")),
        c,
        vec_col="v",
    )
    from .ann import _cos_col

    a = indexed.select("bucket", F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    b = indexed.select("bucket", F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    # shared exact-cosine kernel (ann._cos_col): zero-norm vectors score
    # 0.0 rather than NULL/NaN, one edge-case policy for both paths
    cos = _cos_col(
        F.col("v_a").cast("array<double>"), F.col("v_b").cast("array<double>")
    )
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cos, 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b")
    )
    return dedup_keep_canonical(embeddings, pairs, id_col=id_col)


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Hash-based deterministic sampling: keep a row iff
    ``portable_hash(salt|key) % 1e6 < fraction * 1e6``. Unlike
    ``DataFrame.sample`` this is reproducible across runs, engines and
    partitionings (the property corpus-release pipelines need: the
    sample is a FUNCTION of the key, so reruns and downstream joins see
    the same subset), and a different ``salt`` draws an independent
    sample. Map-only; the md5-based 60-bit hash is the engine's
    portable hash (textdedup._hash64), so the sample is DuckDB-
    verifiable."""
    from .textdedup import _hash64

    h = _hash64(F.concat(F.lit(f"{salt}|"), F.col(key_col).cast("string")))
    return df.filter(F.pmod(h, F.lit(1_000_000)) < int(fraction * 1_000_000))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing:
    keep 100% of low-resource languages, 10% of English). ``fractions``
    maps stratum value -> keep fraction; strata absent from the map are
    DROPPED (explicit allowlist). The fractions table broadcasts; the
    hash gate is the same portable function as
    :func:`deterministic_sample`."""
    from .textdedup import _hash64

    spark = df.sparkSession
    # thresholds are integerized DRIVER-SIDE with the same int() rule as
    # deterministic_sample: an executor-side double->long cast truncates
    # where DuckDB's CAST rounds (0.3*1e6 = 299999.99999999994), which
    # would break the cross-engine reproducibility this op exists for
    # strata keys keep the column's OWN type (an int/date stratum would
    # crash a hardcoded-string schema, and stringified keys would break
    # the equi-join)
    strata_type = df.schema[strata_col].dataType.simpleString()
    fr = spark.createDataFrame(
        [(k, int(float(v) * 1_000_000)) for k, v in fractions.items()],
        f"{strata_col} {strata_type}, __threshold long",
    )
    h = _hash64(F.concat(F.lit(f"{salt}|"), F.col(key_col).cast("string")))
    return (
        df.join(F.broadcast(fr), strata_col)
        .filter(F.pmod(h, F.lit(1_000_000)) < F.col("__threshold"))
        .drop("__threshold")
    )


#: RefinedWeb-style URL soft-word weights (Penedo et al. 2023 §3.1 use
#: a curated list with per-word weights; this is a deterministic
#: public-shape stand-in — callers pass their own list in production)
DEFAULT_URL_WORD_WEIGHTS = {
    "casino": 1.0,
    "poker": 1.0,
    "porn": 1.0,
    "viagra": 1.0,
    "webcam": 0.5,
    "escort": 0.5,
    "free-download": 0.25,
    "top10": 0.25,
}


def url_quality_filter(
    df: DataFrame,
    url_col: str = "url",
    blocked_hosts: tuple[str, ...] = (),
    word_weights: dict[str, float] | None = None,
    cutoff: float = 1.0,
) -> DataFrame:
    """RefinedWeb-style URL filtering (Penedo et al. 2023, "The
    RefinedWeb Dataset for Falcon LLM", §3.1): a hard domain blocklist
    plus soft scoring of flagged words appearing anywhere in the URL;
    the row is kept when the host is not blocked AND the summed word
    weight stays under ``cutoff``.

    Map-only: the blocklist and word list are config-sized, so both
    gates compile to literal IN / CASE-sum column algebra — zero joins,
    zero shuffles, whole-stage codegen at scan throughput. (With a
    production-sized blocklist — millions of domains — swap the IN for
    a broadcast left-anti join on host; the soft-word CASE sum stays.)

    Emits ``host``, ``url_score`` and ``keep`` so downstream stages can
    log WHY a URL was dropped (failing.log analog) instead of silently
    filtering."""
    weights = DEFAULT_URL_WORD_WEIGHTS if word_weights is None else word_weights
    low = F.lower(F.col(url_col))
    score = F.lit(0.0)
    for word, wt in sorted(weights.items()):
        score = score + F.when(low.contains(word), F.lit(float(wt))).otherwise(
            F.lit(0.0)
        )
    host = F.lower(
        F.coalesce(F.try_parse_url(F.col(url_col), F.lit("HOST")), F.lit(""))
    )
    blocked = host.isin(*[h.lower() for h in blocked_hosts]) if blocked_hosts else F.lit(False)
    return df.withColumns(
        {
            "host": host,
            "url_score": F.round(score, 6),
            "keep": ~blocked & (score < cutoff),
        }
    )


def temperature_mix(
    df: DataFrame,
    source_col: str = "source",
    key_col: str = "doc_id",
    alpha: float = 0.5,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-based corpus mixing (the multi-source sampling rule
    of Devlin et al. 2019 §A and Xue et al. 2021 mT5 §3.1: draw from
    source s with probability proportional to ``n_s^alpha``). Recast
    for deterministic sampling WITHOUT replacement: every source keeps
    the fraction ``(n_min / n_s)^(1-alpha)`` of its rows — the smallest
    source keeps everything and larger sources are flattened toward it,
    which is the same relative re-weighting the papers' with-replacement
    rule produces, expressed as a downsample so no row repeats.

    Distributed shape: per-source counts are one partial-agg'd groupBy
    (source cardinality is config-sized), the scalar ``n_min`` rides a
    broadcast single-row cross join, and the per-row gate is the same
    hash-vs-threshold filter as :func:`deterministic_sample` — map-only
    after one broadcast join, no row ever leaves its partition.

    Engine-portable determinism: the threshold is
    ``floor(sqrt(n_min/n_s) * 1e6)`` for the default ``alpha=0.5`` —
    IEEE 754 requires division and sqrt to be correctly rounded, so any
    compliant engine computes the identical integer (this is why the
    cross-engine oracle pins the sqrt path; general ``alpha`` goes
    through ``pow``, which libms only guarantee to ~1 ulp)."""
    from .textdedup import _hash64

    counts = df.groupBy(source_col).agg(F.count("*").alias("__n"))
    n_min = counts.agg(F.min("__n").alias("__n_min"))
    ratio = F.col("__n_min").cast("double") / F.col("__n").cast("double")
    factor = F.sqrt(ratio) if alpha == 0.5 else F.pow(ratio, 1.0 - alpha)
    thr = counts.crossJoin(F.broadcast(n_min)).select(
        source_col, F.floor(factor * 1_000_000).alias("mix_thr")
    )
    h = _hash64(F.concat(F.lit(f"{salt}|"), F.col(key_col).cast("string")))
    return (
        df.join(F.broadcast(thr), source_col)
        .filter(F.pmod(h, F.lit(1_000_000)) < F.col("mix_thr"))
    )


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 256,
    n_shards: int = 8,
) -> DataFrame:
    """Contiguous sequence packing for LM training: concatenate docs in
    a deterministic order and cut every ``window`` tokens (the GPT-2/3
    preprocessing step — Brown et al. 2020 pack documents end-to-end
    into fixed-length contexts). Emits, per doc, the shard it packs
    into, its whitespace token count, its starting token ``offset``
    within the shard's concatenated stream, and ``seq_index`` — the
    training sequence in which the doc begins (docs may span sequences;
    that is the published behavior, separator/EOS accounting is the
    tokenizer's job downstream).

    Packing is inherently order-sequential, so the distributed form
    shards the corpus first (``id % n_shards``) and packs each shard
    independently: the running-offset window sorts WITHIN a shard only
    — no global sort, no single-task funnel — and shards scale with the
    cluster (at 10^10 docs set n_shards ~ a few x total cores; each
    shard is one task's linear scan, which is the best any contiguous
    packer can do)."""
    from .textdedup import tokens
    from pyspark.sql import Window

    shard = F.pmod(F.col(id_col), F.lit(n_shards)).cast("int")
    n_tok = F.size(tokens(F.col(text_col))).cast("int")
    base = docs.select(
        F.col(id_col), shard.alias("shard"), n_tok.alias("n_tokens")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    return base.select(
        id_col,
        "shard",
        "n_tokens",
        offset.alias("offset"),
        F.floor(offset / F.lit(window)).cast("long").alias("seq_index"),
    )


def boilerplate_strip(
    html: Column,
    min_text_len: int = 30,
    min_density: float = 0.5,
) -> Column:
    """Main-content extraction by per-line text density — the classic
    readability/jusText-family heuristic reduced to its portable core:
    split the page into lines, strip tags per line, keep lines whose
    visible text is long enough AND dense enough (text chars / raw
    chars), re-join in document order. Boilerplate (nav bars, footers,
    button rows) is tag-heavy and short; body prose is long and dense.

    Every step is a built-in array expression (split / transform /
    filter / array_join) — map-only, whole-stage-codegen'd, no Python
    crossing and no shuffle, so it composes with the quality filters
    at full scan speed. Returns the extracted main text column.

    No reference analog (DotnetSpider extracts by explicit selector);
    this is the curation-pipeline stage that precedes quality scoring
    when no per-site selector exists (C4 and RefinedWeb both start
    from extracted main text).
    """
    lines = F.split(html, "\n")
    text_of = lambda ln: F.trim(F.regexp_replace(ln, "<[^>]*>", ""))
    kept = F.filter(
        lines,
        lambda ln: (F.length(text_of(ln)) >= min_text_len)
        & (
            F.length(text_of(ln))
            >= F.lit(min_density) * F.length(ln)
        ),
    )
    return F.array_join(F.transform(kept, text_of), "\n")


def domain_quota(
    df: DataFrame,
    host_col: str = "host",
    key_col: str = "doc_id",
    quota: int = 100,
    salt: str = "quota",
    oversample: int = 8,
    mega_factor: int = 50,
) -> DataFrame:
    """Cap pages kept per domain (C4 and RefinedWeb both bound how much
    any single site contributes to the corpus — without a cap, a few
    mega-hosts dominate the token mix). Keeps ``quota`` rows per host,
    chosen by the portable 60-bit hash of the key (NOT arrival order),
    so the survivor set is a uniform within-host sample that is
    identical across runs, engines and partitionings.

    Shape: a hash-threshold PREFILTER composed with one host-keyed
    window (rank over hash). The exact window alone would make a
    10^8-page host sort 10^8 rows in one task; instead, hosts with
    more than ``mega_factor * quota`` rows (found by a cheap partial
    agg, broadcast back — the mega-host list is tiny by definition)
    are first cut to an expected ``oversample * quota`` rows by
    keeping only hashes below ``oversample*quota/n_host`` of the hash
    space. Because the prefilter and the rank order use the SAME
    hash, the final survivor set is byte-identical to the pure-window
    form whenever >= quota rows pass the prefilter — and with an
    8x oversample the shortfall probability is exp(-O(quota)),
    negligible at any real quota. Long-tail hosts skip the prefilter
    entirely and pay only the window."""
    from pyspark.sql import Window

    from .textdedup import _hash64

    h = _hash64(F.concat(F.lit(f"{salt}|"), F.col(key_col).cast("string")))
    counts = df.groupBy(host_col).agg(F.count(F.lit(1)).alias("__n_host"))
    mega = counts.filter(F.col("__n_host") > mega_factor * quota)
    # 60-bit hash space; threshold scaled per mega host
    thresh = (
        F.lit(float(2**60))
        * F.lit(float(oversample * quota))
        / F.col("__n_host")
    )
    pre = (
        df.withColumn("__h", h)
        .join(F.broadcast(mega), host_col, "left")
        .filter(F.col("__n_host").isNull() | (F.col("__h") <= thresh))
        .drop("__n_host")
    )
    w = Window.partitionBy(host_col).orderBy(
        F.col("__h").asc(), F.col(key_col).asc()
    )
    return (
        pre.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= quota)
        .drop("__rn", "__h")
    )


def dedup_source_priority(
    df: DataFrame,
    priority: dict[str, int],
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Cross-source exact dedup keeping the HIGHEST-PRIORITY source's
    copy — the standard corpus-assembly rule when the same document
    appears in several feeds of different quality (The Pile / Dolma
    both prefer curated sources over raw CommonCrawl when content
    collides): dedup key is the md5 of the normalized text; the winner
    per key is the row with the smallest (priority, id) — sources
    absent from ``priority`` rank last, id breaks ties so the verdict
    is deterministic under any partitioning.

    Shape: ONE partial-agg'd groupBy on the text hash using
    ``min_by(id, struct(priority, id))`` — no window over the key
    space, no text shipped past the hash projection (map-side combine
    reduces each key's candidates before the shuffle). The winner-id
    set then left-semi-joins back by id. Returns the surviving rows
    with their original columns.

    Key width: the FULL 128-bit md5, same as the engine's other exact
    dedups — at 10^10 docs a 60-bit key expects dozens of birthday
    collisions, each silently deleting a non-duplicate document.
    """
    worst = (max(priority.values()) if priority else 0) + 1
    prio = F.lit(worst)
    for s, p in sorted(priority.items()):
        prio = F.when(F.col(source_col) == s, F.lit(p)).otherwise(prio)
    keyed = df.select(
        F.col(id_col).alias("__id"),
        F.md5(normalize_text(F.col(text_col))).alias("__key"),
        prio.alias("__prio"),
    )
    winners = keyed.groupBy("__key").agg(
        F.min_by("__id", F.struct(F.col("__prio"), F.col("__id"))).alias(
            "__winner"
        )
    )
    return df.join(
        winners.select(F.col("__winner").alias(id_col)), id_col, "left_semi"
    )


def top_p_by_score(
    df: DataFrame,
    group_col: str = "source",
    score_col: str = "score",
    id_col: str = "doc_id",
    top_p: float = 0.5,
) -> DataFrame:
    """Keep the top ``top_p`` fraction of rows per group by score —
    percentile-gated curation (the LAION-Aesthetics recipe: keep only
    pairs above an aesthetic-score percentile, per bucket/language/
    source). Exact rank semantics: each group keeps
    ``ceil(top_p * n_group)`` rows, ordered score DESC then id ASC so
    the cut is deterministic across engines and partitionings.

    Shape: one window per group (rank + count over the same partition
    spec — a single shuffle and sort). Same mega-group caveat as
    ``domain_quota``: a group holding a large share of the corpus
    serializes its sort into one task; for percentile gates at that
    scale, pre-filter with a fixed score threshold from a sampled
    quantile sketch (approxQuantile) first, then exact-rank the
    survivors — documented here, applied when groups are hosts rather
    than the handful of sources/languages this gate is built for.

    Returns the input columns plus ``keep`` (no rows dropped: audit
    passes want the rejected rows' scores too).
    """
    if not (0.0 < top_p <= 1.0):
        raise ValueError("top_p must be in (0, 1]")
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    wn = Window.partitionBy(group_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wn))
        .withColumn(
            "keep", F.col("__rn") <= F.ceil(F.lit(top_p) * F.col("__n"))
        )
        .drop("__rn", "__n")
    )


def epoch_plan(
    docs: DataFrame,
    budget_tokens: int,
    source_col: str = "source",
    tokens_col: str = "n_tokens",
    weights: dict[str, float] | None = None,
    alpha: float = 0.5,
    max_epochs: float = 4.0,
) -> DataFrame:
    """Token-budget epoch planner for data-constrained pretraining
    (Muennighoff et al. 2023, "Scaling Data-Constrained Language
    Models": repeating a source up to ~4 epochs is nearly as good as
    fresh data; beyond that returns decay fast). Given per-doc token
    counts, a total training budget, and either explicit per-source mix
    weights or the ``n^alpha`` temperature rule (Xue et al. 2021),
    compute for each source how many epochs (repeats, fractional) the
    budget asks for, cap at ``max_epochs``, and report the shortfall
    the cap leaves unfilled — the number a mixing pipeline feeds back
    into re-weighting.

    Output per source: ``n_docs``, ``avail_tokens``, ``weight`` (
    normalized), ``target_tokens`` = budget x weight share,
    ``epochs`` = min(target/avail, max_epochs), ``planned_tokens`` =
    floor(epochs x avail), ``capped``, ``shortfall_tokens``.

    Distributed shape: ONE partial-agg'd groupBy over the corpus (the
    only full-data pass; map-side combine makes it a count/sum
    exchange of |sources| rows), then pure column algebra on a
    config-sized frame with the weight total riding a broadcast
    single-row cross join — the same scalar pattern as
    :func:`temperature_mix`. Nothing below the groupBy scales with
    corpus size, so the plan costs the same at 10^10 docs as at 10^4.

    With explicit ``weights``, sources ABSENT from the dict are
    excluded from the plan entirely (inner join) — the mixing-config
    semantics: an unlisted source gets zero budget, and listing it with
    weight 0.0 makes the exclusion explicit in the output instead.
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    per = docs.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col(tokens_col).cast("long")).alias("avail_tokens"),
    )
    if weights is not None:
        items = sorted(weights.items())
        wdf = per.sparkSession.createDataFrame(
            items, schema=f"{source_col} string, __w double"
        )
        per = per.join(F.broadcast(wdf), source_col, "inner")
        raw_w = F.col("__w")
    else:
        raw_w = F.pow(F.col("avail_tokens").cast("double"), F.lit(alpha))
    per = per.withColumn("__raw_w", raw_w)
    tot = per.agg(F.sum("__raw_w").alias("__tot_w"))
    weight = F.col("__raw_w") / F.col("__tot_w")
    target = F.round(weight * F.lit(float(budget_tokens)))
    epochs_raw = target / F.col("avail_tokens").cast("double")
    epochs = F.least(epochs_raw, F.lit(float(max_epochs)))
    planned = F.floor(epochs * F.col("avail_tokens").cast("double"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            source_col,
            "n_docs",
            "avail_tokens",
            F.round(weight, 6).alias("weight"),
            target.cast("long").alias("target_tokens"),
            F.round(epochs, 6).alias("epochs"),
            planned.cast("long").alias("planned_tokens"),
            (epochs_raw > F.lit(float(max_epochs))).alias("capped"),
            F.greatest(
                target.cast("long") - planned.cast("long"), F.lit(0)
            ).alias("shortfall_tokens"),
        )
    )


def epoch_expand(
    docs: DataFrame,
    plan: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "epoch",
) -> DataFrame:
    """Materialize an :func:`epoch_plan` as explicit (doc, epoch_index)
    training instances: every doc of a source appears ``floor(epochs)``
    times, and the fractional remainder epoch takes a deterministic
    hash-gated subset of the source's docs (the without-replacement
    analog of sampling the partial epoch — same hash-vs-threshold gate
    as :func:`deterministic_sample`, so the expansion is reproducible
    across runs, engines, and partitionings).

    Shape: the plan is config-sized, so it broadcast-joins onto the
    corpus; the full-epoch copies come from one ``explode(sequence)``
    (map-only row generation, no shuffle) and the fractional epoch is a
    map-only filtered union. Output rows carry (id, source,
    epoch_index); downstream shuffling/packing owns ordering.
    """
    from .textdedup import _hash64

    p = F.broadcast(
        plan.select(
            source_col,
            F.floor(F.col("epochs")).cast("int").alias("__full"),
            # explicit floor: Spark's double->long cast truncates while
            # other engines round, so the truncation must be spelled out
            # for the threshold to replay identically in the oracle
            F.floor(
                (F.col("epochs") - F.floor(F.col("epochs")))
                * F.lit(1_000_000)
            ).cast("long").alias("__frac_thr"),
        )
    )
    base = docs.select(id_col, source_col).join(p, source_col)
    full = base.filter(F.col("__full") > 0).select(
        id_col,
        source_col,
        F.explode(
            F.sequence(F.lit(0), F.col("__full") - F.lit(1))
        ).alias("epoch_index"),
    )
    h = _hash64(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string")))
    frac = base.filter(
        F.pmod(h, F.lit(1_000_000)) < F.col("__frac_thr")
    ).select(id_col, source_col, F.col("__full").alias("epoch_index"))
    return full.unionByName(frac)


def epoch_shuffle(
    docs: DataFrame,
    id_col: str = "doc_id",
    epoch: int = 0,
    n_shards: int = 64,
    salt: str = "shuffle",
) -> DataFrame:
    """Deterministic per-epoch global shuffle as shard + position:
    every epoch the corpus gets a fresh pseudo-random order that is a
    pure FUNCTION of (salt, epoch, id) — reproducible across runs,
    partitionings and engines, which is what makes training runs
    resumable and data-order bugs bisectable (the property tf.data /
    webdataset shard shuffling provides; no engine RNG involved).

    Returns (id, shard, pos): consume shard files in shard order,
    rows within a shard in pos order, and the concatenation IS the
    epoch's permutation.

    Shape: NO global sort (a rangepartitioning sort over 10^10 rows is
    the exact thing shard-based shuffling exists to avoid) — the hash
    assigns each row a shard (one hash shuffle), and pos ranks within
    the shard only. Shards are hash-balanced, so pick n_shards to make
    a shard a task-sized unit; the within-shard window never sees more
    than corpus/n_shards rows. The md5-based portable hash
    (textdedup._hash64) makes the permutation DuckDB-verifiable."""
    from .textdedup import _hash64

    h = _hash64(
        F.concat(
            F.lit(f"{salt}|{epoch}|"), F.col(id_col).cast("string")
        )
    )
    assigned = docs.select(
        F.col(id_col),
        F.pmod(h, F.lit(n_shards)).cast("int").alias("shard"),
        h.alias("__h"),
    )
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    return assigned.select(
        id_col,
        "shard",
        (F.row_number().over(w) - 1).alias("pos"),
    )


def hash_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by portable hash.

    The split a training pipeline needs at 100 TB: membership must be a
    pure function of the example id (stable across re-runs, machines,
    and engine versions — never ``randomSplit``, whose assignment
    depends on partitioning), and val/test must stay clean when the
    corpus grows: an id keeps its split forever, new ids fill in
    proportionally. Map-only, no shuffle.

    ``weights`` maps split name -> fraction (must sum to ~1); order of
    dict insertion defines the cumulative bands. The md5-based
    ``_hash64`` (textdedup.py) makes assignment DuckDB-verifiable.
    """
    from .textdedup import _hash64

    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    if not 0.999 < total < 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    # 60-bit hash -> uniform integer in [0, 1e6); cumulative bands
    u = F.pmod(
        _hash64(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))),
        F.lit(1_000_000),
    )
    names = list(weights)
    expr = None
    acc = 0.0
    for name in names[:-1]:
        acc += weights[name]
        cond = u < int(round(acc * 1_000_000))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    )
    return docs.withColumn("split", expr)


def pack_items(
    items: DataFrame,
    id_col: str = "item_id",
    cost_col: str = "cost",
    window: int = 2048,
    n_shards: int = 8,
) -> DataFrame:
    """Generalized contiguous packing over an arbitrary per-item token
    cost — the multimodal companion to ``pack_sequences``: an
    interleaved image-text corpus packs items whose cost is patch
    tokens + caption tokens (MMC4 / Flamingo-style context building),
    not whitespace counts.

    Same scale shape as ``pack_sequences``: shard first (id %
    n_shards), one within-shard running-sum window, no global sort.
    Emits (id, shard, cost, offset, seq_index). The cost column is
    computed upstream (e.g. ``images.vit_token_costs`` tokens + a
    caption token count), so one packer serves every modality mix.
    """
    from pyspark.sql import Window

    shard = F.pmod(F.col(id_col), F.lit(n_shards)).cast("int")
    base = items.select(
        F.col(id_col), shard.alias("shard"),
        F.col(cost_col).cast("long").alias("cost"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum("cost").over(w), F.lit(0)).cast("long")
    return base.select(
        id_col,
        "shard",
        "cost",
        offset.alias("offset"),
        F.floor(offset / F.lit(window)).cast("long").alias("seq_index"),
    )
