"""Gopher-style document quality + repetition filtering.

Driver mandate (training-data pipeline): quality scoring beyond simple
length/punct ratios. Signals follow the published Gopher rules (Rae et
al. 2021, "Scaling Language Models", appendix A1.1 — public paper):
word-count bounds, mean word length bounds, symbol-to-word ratio,
bullet-line fraction, alphabetic-word fraction, stop-word presence, and
repetition measures (duplicate-line fraction, top-bigram character
fraction).

Everything is built-in column algebra (split / filter / aggregate /
explode + groupBy for the bigram mode) — whole-stage codegen end to end,
no Python, so the filter runs at scan throughput on 100 TB. The one
shuffle is the per-doc bigram mode count, keyed on (doc_id) — narrow and
combinable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: the Gopher stop words (rule: ≥2 of these must appear)
STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _words(text: Column) -> Column:
    return F.filter(F.split(text, r"\s+"), lambda w: w != "")


def quality_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Gopher quality signals (no repetition measures —
    those need a shuffle, see :func:`repetition_signals`)."""
    text = F.col(text_col)
    words = _words(text)
    n_words = F.size(words)
    total_chars = F.aggregate(
        F.transform(words, F.length), F.lit(0), lambda a, x: a + x
    )
    mean_word_len = F.when(n_words > 0, total_chars / n_words).otherwise(
        F.lit(0.0)
    )
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    alpha_frac = F.when(n_words > 0, n_alpha / n_words).otherwise(F.lit(0.0))
    n_sym = (
        F.length(text)
        - F.length(F.replace(text, F.lit("#"), F.lit("")))
        + (
            F.length(text)
            - F.length(F.replace(text, F.lit("..."), F.lit("")))
        ) / 3
    )
    sym_ratio = F.when(n_words > 0, n_sym / n_words).otherwise(F.lit(0.0))
    lines = F.split(text, "\n")
    n_bullet = F.size(
        F.filter(
            lines,
            lambda ln: ln.startswith("-")
            | ln.startswith("*")
            | ln.startswith("•"),
        )
    )
    bullet_frac = F.when(F.size(lines) > 0, n_bullet / F.size(lines)).otherwise(
        F.lit(0.0)
    )
    # lowercase BEFORE distinct: 'The' and 'the' are one stop word, not
    # two hits against the >=2-distinct-stop-words rule
    stop_hits = F.size(
        F.array_distinct(
            F.transform(
                F.filter(words, lambda w: F.lower(w).isin(*STOP_WORDS)),
                F.lower,
            )
        )
    )
    # counts cast to long: DuckDB emits BIGINT for these, and the driver
    # hash compares at the typed Arrow layer (int32 vs int64 = mismatch)
    return docs.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        F.round(sym_ratio, 6).alias("symbol_word_ratio"),
        F.round(bullet_frac, 6).alias("bullet_line_frac"),
        stop_hits.cast("long").alias("stop_word_hits"),
    )


def repetition_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Duplicate-line fraction + top-bigram character fraction. The
    bigram mode is an explode → per-(doc, bigram) count → per-doc max —
    one narrow shuffle with map-side combine."""
    text = F.col(text_col)
    lines = F.split(text, "\n")
    dup_line_frac = F.when(
        F.size(lines) > 0,
        (F.size(lines) - F.size(F.array_distinct(lines))) / F.size(lines),
    ).otherwise(F.lit(0.0))
    base = docs.select(
        F.col(id_col),
        F.round(dup_line_frac, 6).alias("dup_line_frac"),
        F.length(text).alias("__len"),
        _words(text).alias("__w"),
    )
    bigrams = base.select(
        id_col,
        F.explode(
            F.when(
                F.size("__w") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("__w") - 2),
                    lambda i: F.concat_ws(
                        " ", F.element_at("__w", i + 1), F.element_at("__w", i + 2)
                    ),
                ),
            ).otherwise(F.array())
        ).alias("bg"),
    )
    # mode bigram per doc: deterministic tie-break by (count, bigram) max
    top = (
        bigrams.groupBy(id_col, "bg")
        .agg(F.count("*").alias("n"))
        .groupBy(id_col)
        .agg(F.max_by(F.struct("n", "bg"), F.struct("n", "bg")).alias("__top"))
    )
    out = base.drop("__w").join(top, id_col, "left")
    # Gopher measure: characters covered by the most frequent bigram's
    # occurrences as a fraction of all characters
    frac = F.round(
        (F.col("__top.n") * F.length("__top.bg")).cast("double")
        / F.greatest(F.lit(1).cast("long"), F.col("__len")),
        6,
    )
    return out.select(
        id_col,
        "dup_line_frac",
        F.coalesce(frac, F.lit(0.0)).alias("top_bigram_frac"),
    )


def gopher_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    min_alpha_word_frac: float = 0.8,
    min_stop_word_hits: int = 2,
    max_dup_line_frac: float = 0.3,
    max_top_bigram_frac: float = 0.2,
) -> DataFrame:
    """All signals + a ``keep`` verdict under the published thresholds
    (every default is the Gopher paper's)."""
    q = quality_signals(docs, id_col, text_col)
    r = repetition_signals(docs, id_col, text_col)
    joined = q.join(r, id_col)
    keep = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_word_ratio") <= max_symbol_word_ratio)
        & (F.col("bullet_line_frac") <= max_bullet_line_frac)
        & (F.col("alpha_word_frac") >= min_alpha_word_frac)
        & (F.col("stop_word_hits") >= min_stop_word_hits)
        & (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac)
    )
    return joined.withColumn("keep", keep)


def unigram_lm_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    head_nll: float = 3.0,
    tail_nll: float = 6.0,
) -> DataFrame:
    """CCNet-style language-model quality bucketing (Wenzek et al. 2019,
    "CCNet: Extracting High Quality Monolingual Datasets") with the
    corpus's own unigram model standing in for the paper's KenLM (no
    model files in this sandbox; the pipeline shape is identical).

    Two passes: (1) corpus unigram counts — one partial-agg'd groupBy on
    token; (2) per-doc mean negative log-likelihood under that model —
    pre-aggregate (doc, token) term frequencies so the model join ships
    one row per DISTINCT doc-token, not one per token occurrence, then
    a weighted-sum agg back to doc_id. The model join keys on token
    (sort-merge; Catalyst broadcasts it when the vocabulary is small
    enough, which for web text at any scale it usually is — vocab grows
    ~ Heaps' law, not linearly in corpus size).

    ``bucket`` is CCNet's head/middle/tail split, here at fixed
    ``head_nll``/``tail_nll`` cutoffs rather than corpus tertiles so the
    verdict is deterministic and engine-portable (tertiles need a global
    percentile — a sort — and make every doc's bucket depend on every
    other doc)."""
    from .textdedup import tokens

    tf = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(tokens(F.col(text_col))).alias("token"),
        )
        .groupBy("id", "token")
        .agg(F.count("*").alias("tf"))
    )
    vocab = tf.groupBy("token").agg(F.sum("tf").alias("ctok"))
    # scalar total stays IN the plan (broadcast single-row cross join,
    # same shape as temperature_mix) — a driver-side collect would force
    # the tokenize/explode/tf/vocab lineage to execute twice
    total = vocab.agg(F.sum("ctok").cast("double").alias("__total"))
    scored = (
        tf.join(vocab, "token")
        .crossJoin(F.broadcast(total))
        .groupBy("id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            (
                F.sum(F.col("tf") * (F.log(F.col("__total")) - F.log("ctok")))
                / F.sum("tf")
            ).alias("__nll"),
        )
    )
    return scored.select(
        F.col("id").alias(id_col),
        "n_tokens",
        F.round("__nll", 6).alias("avg_nll"),
        F.when(F.col("__nll") < head_nll, F.lit("head"))
        .when(F.col("__nll") < tail_nll, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def bigram_lm_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    head_nll: float = 4.0,
    tail_nll: float = 7.0,
) -> DataFrame:
    """Bigram-LM quality bucketing — the CCNet recipe (Wenzek et al.
    2019) one order up from :func:`unigram_lm_score`: per-doc mean
    negative log-likelihood of each token given its predecessor under
    the corpus's own add-alpha-smoothed bigram model,
    ``P(w2|w1) = (C(w1 w2) + a) / (C(w1·) + a·V)``, where ``C(w1·)``
    counts w1 as a bigram HISTORY (so the conditional sums to 1 over
    the vocabulary) and V is the distinct unigram vocabulary size.
    Repetitive boilerplate scores low-NLL head; lexically incoherent
    spam scores tail — a strictly sharper split than the unigram model
    because word ORDER now matters.

    Scale shape: (1) per-doc bigram term frequencies aggregate FIRST —
    the model join ships one row per DISTINCT (doc, bigram), not one
    per occurrence; (2) the bigram model is itself a partial-agg'd
    groupBy over the same pre-aggregated rows; (3) history counts
    derive from the bigram model (groupBy w1 — vocabulary-sized, not
    corpus-sized); (4) V is one scalar broadcast. Docs with fewer than
    2 tokens carry no bigrams and get NULL nll / 'middle' bucket — the
    caller's length filter owns those.

    Buckets use fixed cutoffs (not corpus tertiles) for the same
    determinism reason unigram_lm_score documents.
    """
    from .textdedup import tokens

    toks = tokens(F.col(text_col))
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))

    tf = (
        docs.select(
            F.col(id_col).alias("id"), F.explode(bigrams).alias("bigram")
        )
        .groupBy("id", "bigram")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    model = tf.groupBy("bigram").agg(F.sum("tf").alias("c_bigram"))
    hist = model.select(
        F.split(F.col("bigram"), " ").getItem(0).alias("w1"), "c_bigram"
    ).groupBy("w1").agg(F.sum("c_bigram").alias("c_hist"))
    vocab_size = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("t"))
        .agg(F.countDistinct("t").cast("double").alias("__v"))
    )
    scored = (
        tf.withColumn("w1", F.split(F.col("bigram"), " ").getItem(0))
        .join(model, "bigram")
        .join(hist, "w1")
        .crossJoin(F.broadcast(vocab_size))
        .groupBy("id")
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            (
                F.sum(
                    F.col("tf")
                    * (
                        F.log(F.col("c_hist") + F.lit(alpha) * F.col("__v"))
                        - F.log(F.col("c_bigram") + F.lit(alpha))
                    )
                )
                / F.sum("tf")
            ).alias("__nll"),
        )
    )
    out = docs.select(F.col(id_col).alias("id")).join(scored, "id", "left")
    return out.select(
        F.col("id").alias(id_col),
        F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
        F.round("__nll", 6).alias("avg_nll"),
        F.when(F.col("__nll").isNull(), F.lit("middle"))
        .when(F.col("__nll") < head_nll, F.lit("head"))
        .when(F.col("__nll") < tail_nll, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
