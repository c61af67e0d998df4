"""Approximate nearest-neighbor search over embedding columns.

Driver mandate (training-data pipeline): brute-force cosine top-k is the
baseline (``__spark_entry__.q_ann_cosine_topk``, oracle-checked); this
module is the SCALE path — IVF (inverted-file) coarse quantization:

1. ``train_centroids``: k-means over the embedding column — deterministic
   hash-based init, a few distributed Lloyd iterations (assignment via
   batch numpy matmul in a pandas UDF; centroid update via groupBy mean).
   Centroid table is tiny (k×d) and broadcasts.
2. ``assign_buckets``: every vector gets its nearest-centroid id — the
   partition key for the index. At 10^10 rows this is the bucketed
   layout on disk; queries only touch matching buckets.
3. ``ann_search``: queries probe their ``nprobe`` nearest centroids, join
   candidates on bucket id (a fraction ~nprobe/k of the base), exact
   cosine re-rank inside the candidate set.

Recall/latency trade is nprobe/k, the standard IVF contract. All linear
algebra runs as numpy matmuls over whole Arrow batches — no per-row
Python. A random-hyperplane LSH bucketing (``lsh_bucket``) is included
as the alternative family (hash-based, no training pass).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _mat(series: pd.Series) -> np.ndarray:
    return np.array([np.asarray(v, dtype=np.float64) for v in series])


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def train_centroids(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    iterations: int = 4,
    seed: int = 42,
    sample_fraction: float | None = None,
) -> list[list[float]]:
    """Distributed k-means; returns k centroids (small: k×d floats).

    Init: the k vectors with the smallest ``xxhash64(id, seed)`` — a
    deterministic pseudo-random sample with no driver-side RNG. Each
    Lloyd iteration: broadcast centroids into the assignment UDF (numpy
    argmax of cosine), then ``groupBy(bucket).avg`` per dimension via
    ``posexplode`` — both shuffle-light (k groups).

    ``sample_fraction``: train on a deterministic sample of the base —
    the 100 TB path. The per-iteration centroid update shuffles d×N
    rows (posexplode); at 10^10 vectors train on ~10^6 sampled rows
    (fraction 1e-4): k-means centroids converge on any representative
    sample, and only the one-pass ``assign_buckets`` needs the full set.
    """
    id_col = F.monotonically_increasing_id()
    base = embeddings.select(F.col(vec_col).alias("v"), id_col.alias("__id"))
    if sample_fraction is not None and sample_fraction < 1.0:
        base = base.sample(fraction=sample_fraction, seed=seed)
    init = (
        base.withColumn("__h", F.xxhash64("__id", F.lit(seed)))
        .orderBy("__h")
        .limit(k)
        .select("v")
        .collect()
    )
    centroids = _norm_rows(_mat(pd.Series([r.v for r in init])))

    for _ in range(iterations):
        assign = assign_buckets(base, centroids, vec_col="v")
        summed = (
            assign.select("bucket", F.posexplode(F.col("v")).alias("dim", "x"))
            .groupBy("bucket", "dim")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .groupBy("bucket")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("dim", (F.col("s") / F.col("n")).alias("m")))
                ).alias("dims")
            )
            .select("bucket", F.col("dims.m").alias("centroid"))
            .collect()
        )
        new = centroids.copy()
        for r in summed:
            new[r.bucket] = np.asarray(r.centroid, dtype=np.float64)
        centroids = _norm_rows(new)
    return [list(map(float, c)) for c in centroids]


def _bucket_udf(centroids: np.ndarray):
    c = _norm_rows(np.asarray(centroids, dtype=np.float64))

    @pandas_udf("int")
    def f(vecs: pd.Series) -> pd.Series:
        m = _norm_rows(_mat(vecs))
        return pd.Series(np.argmax(m @ c.T, axis=1).astype(np.int32))

    return f


def assign_buckets(
    embeddings: DataFrame, centroids, vec_col: str = "embedding"
) -> DataFrame:
    """Append ``bucket`` = argmax-cosine centroid id (batch matmul UDF)."""
    udf = _bucket_udf(np.asarray(centroids, dtype=np.float64))
    return embeddings.withColumn(
        "bucket", udf(F.col(vec_col).cast("array<double>"))
    )


def _probe_udf(centroids: np.ndarray, nprobe: int):
    c = _norm_rows(np.asarray(centroids, dtype=np.float64))

    @pandas_udf("array<int>")
    def f(vecs: pd.Series) -> pd.Series:
        m = _norm_rows(_mat(vecs))
        sims = m @ c.T
        # stable sort: equal-similarity centroids tie-break to the LOWER
        # id, matching the oracle's "cos DESC, cid ASC" (default
        # quicksort would order ties arbitrarily)
        order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.astype(int).tolist() for row in order])

    return f


def ann_search(
    base: DataFrame,
    queries: DataFrame,
    centroids,
    k: int = 5,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: probe nprobe buckets per query, exact cosine re-rank.

    ``base`` is bucketed once (``assign_buckets``) — at scale, persisted
    bucketed-by-``bucket``; each query joins only ~nprobe/k of it.
    Result: (q_vec_id, vec_id, rn, cos_sim) — same shape as the
    brute-force baseline so recall is directly comparable.
    """
    from pyspark.sql import Window

    c = np.asarray(centroids, dtype=np.float64)
    indexed = assign_buckets(
        base.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")),
        c, vec_col="v",
    )
    probes = queries.select(
        F.col(id_col).alias("q_vec_id"), F.col(vec_col).alias("qv")
    ).withColumn(
        "bucket", F.explode(_probe_udf(c, nprobe)(F.col("qv").cast("array<double>")))
    )
    cand = probes.join(indexed, "bucket").filter(F.col("q_vec_id") != F.col("vec_id"))
    vd = F.transform(F.col("v"), lambda x: x.cast("double"))
    qd = F.transform(F.col("qv"), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(qd, vd, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda col: F.sqrt(
        F.aggregate(
            F.zip_with(col, col, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    scored = cand.select(
        "q_vec_id", "vec_id", (dot / (norm(qd) * norm(vd))).alias("cos")
    ).dropDuplicates(["q_vec_id", "vec_id"])
    w = Window.partitionBy("q_vec_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
        .select("q_vec_id", "vec_id", "rn", F.round("cos", 6).alias("cos_sim"))
    )


def lsh_bucket(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 12,
    dim: int | None = None,
    seed: int = 7,
) -> DataFrame:
    """Random-hyperplane LSH bucket id (sign pattern of n_planes dots).
    Training-free alternative to IVF; same join-on-bucket search shape."""

    @pandas_udf("long")
    def f(vecs: pd.Series) -> pd.Series:
        m = _mat(vecs)
        # deterministic hyperplanes derived from (seed, d) per batch —
        # regeneration is trivially cheap next to the matmul
        rng = np.random.default_rng([seed, m.shape[1], n_planes])
        p = rng.standard_normal((n_planes, m.shape[1]))
        bits = (m @ p.T) > 0
        out = np.zeros(len(m), dtype=np.int64)
        for b in range(n_planes):
            out |= bits[:, b].astype(np.int64) << b
        return pd.Series(out)

    return embeddings.withColumn(
        "lsh_bucket", f(F.col(vec_col).cast("array<double>"))
    )


def _cos_col(a, b):
    """Exact cosine between two array<double> columns — JVM-side folds,
    no Python. Zero-norm vectors yield 0.0, NOT NaN: Spark orders NaN
    greater than every number, so a NaN here would sail through any
    ``>= threshold`` filter and report phantom near-duplicates."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def embedding_neardup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_planes: int = 32,
    band_bits: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS — the dedup variant of ANN
    (driver mandate: embedding-cosine near-dup).

    Scale path: random-hyperplane signatures (n_planes sign bits, one
    numpy matmul per Arrow batch) split into ``n_planes // band_bits``
    LSH bands; vectors sharing any band value become candidates
    (bucketed equi-join — a vanishing fraction of the n² pairs), then an
    exact JVM-side cosine verifies ``>= threshold``. Recall per true
    pair is 1-(1-p^band_bits)^n_bands with p = 1 - θ/π — tune band_bits
    down / n_planes up for looser thresholds. Returns
    (id_a, id_b, cos_sim) with id_a < id_b, cos_sim rounded to 6 dp.

    Shuffle discipline (the 100 TB concern): the band explode and the
    candidate self-join carry ONLY (id, band) — never the vector. At
    10^10 × d floats, shipping embeddings through an 8-way band explode
    would multiply the exchange bytes by n_bands and make dropDuplicates
    sort MB-scale rows; instead candidate id-pairs are distinct'd on two
    longs, then ONE re-join per side fetches the vectors for the exact
    cosine verify (same ids-only shape as graph.dedup_keep_canonical).
    """
    assert n_planes % band_bits == 0

    @pandas_udf("array<int>")
    def bands_of(vecs: pd.Series) -> pd.Series:
        m = _mat(vecs)
        rng = np.random.default_rng([seed, m.shape[1], n_planes])
        p = rng.standard_normal((n_planes, m.shape[1]))
        bits = (m @ p.T) > 0
        n_bands = n_planes // band_bits
        out = []
        vals = np.zeros((len(m), n_bands), dtype=np.int32)
        for b in range(n_planes):
            vals[:, b // band_bits] |= bits[:, b].astype(np.int32) << (
                b % band_bits
            )
        for row in vals:
            out.append([int(i) << 16 | int(v) for i, v in enumerate(row)])
        return pd.Series(out)

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sig = embeddings.select(
        F.col(id_col).alias("id"),
        F.explode(bands_of(F.col(vec_col))).alias("band"),
    )
    right = sig.select(F.col("id").alias("id_b"), F.col("band").alias("band_b"))
    cand_ids = (
        sig.join(
            right,
            (F.col("band") == F.col("band_b")) & (F.col("id") < F.col("id_b")),
        )
        .select(F.col("id").alias("id_a"), "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    vecs = embeddings.select(F.col(id_col).alias("id"), v.alias("v"))
    cand = cand_ids.join(
        vecs.select(F.col("id").alias("id_a"), F.col("v").alias("v_a")), "id_a"
    ).join(vecs.select(F.col("id").alias("id_b"), F.col("v").alias("v_b")), "id_b")
    cos = _cos_col(F.col("v_a"), F.col("v_b"))
    return (
        cand.withColumn("cos_sim", F.round(cos, 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def quantize_int8(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization (the standard
    ANN-at-rest compression, e.g. faiss SQ8): scale = max|x| / 127,
    codes = round(x / scale) — 4x smaller than float32 on disk, and the
    bucket-join candidate stages can ship codes instead of floats
    (dequantize only for the final exact re-rank). Map-only column
    algebra: zero Python, zero shuffle. All-zero vectors take scale=1
    so codes stay all-zero instead of dividing by zero.

    Returns (id, scale, codes array<int>); reconstruction error per
    component is bounded by scale/2 (pinned in tests)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = F.array_max(F.transform(v, F.abs))
    scale = F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(1.0))
    codes = F.transform(v, lambda x: F.round(x / scale).cast("int"))
    return embeddings.select(
        F.col(id_col), scale.alias("scale"), codes.alias("codes")
    )


def dequantize_int8(quantized: DataFrame, out_col: str = "vec") -> DataFrame:
    """Inverse of :func:`quantize_int8`: vec[i] = codes[i] * scale."""
    s = F.col("scale")
    return quantized.withColumn(
        out_col, F.transform(F.col("codes"), lambda c: c.cast("double") * s)
    )


def pair_cosine_screen(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    min_cos: float = 0.2,
) -> DataFrame:
    """CLIP-score-style alignment screen over ALREADY-PAIRED vectors —
    the DataComp/LAION gate that drops image–caption pairs whose image
    and text embeddings disagree (Schuhmann et al. 2021 filter CC pairs
    at CLIP cosine ≥ 0.3; DataComp sweeps the threshold). The pairing
    is given (one row = one candidate pair), so unlike the ANN
    operators there is NO candidate generation here: the screen is a
    map-only projection — exact cosine per row via JVM-side folds
    (:func:`_cos_col`), a ``keep`` verdict, no shuffle, no Python.

    Inputs are two array<float|double> columns; floats are cast to
    double BEFORE any arithmetic so the fold order and precision match
    across engines (the oracle recomputes in float64). Returns the
    input minus the vector columns, plus (cos rounded to 6, keep) —
    vectors don't ride past the screen.
    """
    a = F.transform(F.col(a_col), lambda x: x.cast("double"))
    b = F.transform(F.col(b_col), lambda x: x.cast("double"))
    cos = _cos_col(a, b)
    out_cols = [c for c in pairs.columns if c not in (a_col, b_col)]
    return pairs.select(
        *out_cols,
        F.round(cos, 6).alias("cos"),
        (cos >= F.lit(min_cos)).alias("keep"),
    )


# -- Product quantization (Jégou, Douze & Schmid 2011, TPAMI; the
# faiss PQ/IVFPQ compression standard) --------------------------------


def pq_formula_codebook(
    m: int = 4, k: int = 4, sub_dim: int = 16
) -> list[list[list[float]]]:
    """Deterministic formula codebook for oracle-checkable fixed-PQ
    paths: centroid j of subspace s has component w equal to
    ``((j*7 + w*3 + s*5) % 8 - 3.5) / 4`` — trivially replayable as SQL
    so DuckDB can verify the encode/ADC math bit-for-bit. Production
    codebooks come from :func:`pq_train`; the formula one exists so the
    argmin/LUT plumbing has a cross-engine oracle."""
    return [
        [
            [((j * 7 + w * 3 + s * 5) % 8 - 3.5) / 4.0 for w in range(sub_dim)]
            for j in range(k)
        ]
        for s in range(m)
    ]


def pq_train(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    iterations: int = 8,
    seed: int = 42,
    n_sample: int = 65536,
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Train an m-subspace, k-centroid product quantizer on a
    deterministic sample (the published faiss practice: PQ codebooks
    train on an in-memory sampled matrix — ``n_sample`` x d floats is
    bounded regardless of corpus size, e.g. 64k x 64 x 8B = 32 MB at
    10^10 vectors). Sample selection is the same no-driver-RNG rule as
    :func:`train_centroids`: the ``n_sample`` vectors with the smallest
    ``xxhash64(id, seed)``. Per subspace, Lloyd iterations run in numpy
    on the sample; empty clusters re-seed to the point farthest from
    its assigned centroid (standard k-means repair, deterministic).

    Returns ``codebook[s][j][w]`` (m x k x d/m floats — config-sized;
    broadcast into the encode/search UDFs)."""
    # hash the REAL id, never monotonically_increasing_id: the physical
    # row id changes with partition layout, which would make the sample
    # (hence codebook, hence every PQ code) depend on file splits —
    # breaking the module's reproducible-across-partitionings contract
    base = embeddings.select(
        F.col(vec_col).alias("v"),
        F.xxhash64(F.col(id_col), F.lit(seed)).alias("__h"),
    )
    rows = base.orderBy("__h").limit(n_sample).select("v").collect()
    X = _mat(pd.Series([r.v for r in rows]))
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    book: list[list[list[float]]] = []
    for s in range(m):
        Xs = X[:, s * sub : (s + 1) * sub]
        # deterministic init: k evenly-strided sample rows (sample is
        # already hash-shuffled, so strides are a pseudo-random pick)
        idx = np.arange(k) * max(1, len(Xs) // k) % len(Xs)
        C = Xs[idx].astype(np.float64).copy()
        for _ in range(iterations):
            d2 = (
                (Xs * Xs).sum(axis=1, keepdims=True)
                - 2.0 * Xs @ C.T
                + (C * C).sum(axis=1)
            )
            a = np.argmin(d2, axis=1)
            worst = np.argsort(-d2[np.arange(len(Xs)), a])
            wi = 0
            for j in range(k):
                mask = a == j
                if mask.any():
                    C[j] = Xs[mask].mean(axis=0)
                else:
                    C[j] = Xs[worst[wi]]
                    wi += 1
        book.append([[float(x) for x in row] for row in C])
    return book


def _pq_encode_udf(codebook: np.ndarray):
    cb = np.asarray(codebook, dtype=np.float64)  # (m, k, sub)
    m, k, sub = cb.shape

    @pandas_udf("array<int>")
    def f(vecs: pd.Series) -> pd.Series:
        X = _mat(vecs)
        out = np.empty((len(X), m), dtype=np.int64)
        for s in range(m):
            Xs = X[:, s * sub : (s + 1) * sub]
            C = cb[s]
            d2 = (
                (Xs * Xs).sum(axis=1, keepdims=True)
                - 2.0 * Xs @ C.T
                + (C * C).sum(axis=1)
            )
            # np.argmin takes the FIRST minimum — ties break to the
            # lower centroid id, matching the oracle's "dist, j" order
            out[:, s] = np.argmin(d2, axis=1)
        return pd.Series([row.astype(int).tolist() for row in out])

    return f


def pq_encode(
    embeddings: DataFrame,
    codebook,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors to PQ codes: per subspace, the id of the nearest
    codebook centroid by squared L2 (batch numpy matmul in an Arrow
    UDF — map-only, zero shuffle; the codebook rides the closure, m*k*
    sub floats). Output (id, codes array<int>) is d/m * 8/ceil(log2 k)
    x smaller than the float32 vector — at 10^10 vectors the codes
    table is what the ADC scan reads; floats stay in cold storage for
    the final exact re-rank only."""
    udf = _pq_encode_udf(np.asarray(codebook, dtype=np.float64))
    return embeddings.select(
        F.col(id_col),
        udf(F.col(vec_col).cast("array<double>")).alias("codes"),
    )


def pq_adc_topk(
    base_codes: DataFrame,
    queries: DataFrame,
    codebook,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: each query precomputes a lookup
    table of partial squared distances to every centroid of every
    subspace (m x k doubles — computed in one Arrow UDF pass over the
    query set and FLATTENED into a column), then scans the codes table
    with a pure codegen'd expression: ``adc = sum_s lut[s*k + code_s]``
    (``transform`` with index + ``element_at`` + ``aggregate`` — the
    scan never touches Python and never ships a float vector).

    Shape at scale: queries are the small side (broadcast), codes the
    big side — the scan is one map-only pass over codes, then ONE
    shuffle for the per-query top-k window. This is exactly the faiss
    ADC loop re-expressed as columnar algebra; compose with
    :func:`ann_search`-style IVF bucketing to scan only probed buckets.

    Returns (q_vec_id, vec_id, rn, adc_dist) — ascending distance,
    ties to the lower base id, same contract as the cosine searches.
    Ranking compares ``round(adc, 9)``: base rows with IDENTICAL codes
    have mathematically equal ADC, but an engine that sums the m lut
    entries in a different order can land a few ulps apart — rounding
    at 1e-9 (noise is ~1e-14) collapses those back into exact ties so
    the ``vec_id`` tie-break decides identically on every engine."""
    from pyspark.sql import Window

    cb = np.asarray(codebook, dtype=np.float64)
    m, kk, sub = cb.shape

    @pandas_udf("array<double>")
    def lut_udf(vecs: pd.Series) -> pd.Series:
        Q = _mat(vecs)
        out = []
        for q in Q:
            lut = np.empty((m, kk), dtype=np.float64)
            for s in range(m):
                diff = q[s * sub : (s + 1) * sub] - cb[s]
                lut[s] = (diff * diff).sum(axis=1)
            out.append(lut.ravel().tolist())
        return pd.Series(out)

    ql = queries.select(
        F.col(id_col).alias("q_vec_id"),
        lut_udf(F.col(vec_col).cast("array<double>")).alias("lut"),
    )
    joined = base_codes.select(
        F.col(id_col).alias("vec_id"), "codes"
    ).crossJoin(F.broadcast(ql)).filter(F.col("vec_id") != F.col("q_vec_id"))
    part = F.transform(
        F.col("codes"),
        lambda c, i: F.element_at(F.col("lut"), (i * kk + c + 1).cast("int")),
    )
    adc = F.aggregate(part, F.lit(0.0), lambda acc, x: acc + x)
    w = Window.partitionBy("q_vec_id").orderBy(
        F.round(F.col("adc"), 9).asc(), F.col("vec_id").asc()
    )
    return (
        joined.select("q_vec_id", "vec_id", adc.alias("adc"))
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
        .select("q_vec_id", "vec_id", "rn", F.round("adc", 6).alias("adc_dist"))
    )


def ivfpq_index(
    base: DataFrame,
    centroids,
    codebook,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Build the IVFPQ index table (Jégou et al. 2011 §IV; the faiss
    IVFPQ layout): assign each vector to its nearest coarse centroid,
    then PQ-encode the RESIDUAL (x - centroid) — residuals are far
    better centered than raw vectors, so the same codebook budget buys
    much lower quantization error. One Arrow UDF pass computes bucket +
    residual codes together (the coarse table and codebook ride the
    closure — both config-sized); output (id, bucket, codes) is the
    scan table: at 10^10 vectors, persist it partitioned/bucketed by
    ``bucket`` so a probe reads only its buckets' files."""
    c = _norm_rows(np.asarray(centroids, dtype=np.float64))
    cb = np.asarray(codebook, dtype=np.float64)
    m, kk, sub = cb.shape

    @pandas_udf("struct<bucket:int, codes:array<int>>")
    def f(vecs: pd.Series) -> pd.DataFrame:
        X = _mat(vecs)
        Xn = _norm_rows(X)
        b = np.argmax(Xn @ c.T, axis=1)
        R = X - c[b]
        codes = np.empty((len(X), m), dtype=np.int64)
        for s in range(m):
            Rs = R[:, s * sub : (s + 1) * sub]
            C = cb[s]
            d2 = (
                (Rs * Rs).sum(axis=1, keepdims=True)
                - 2.0 * Rs @ C.T
                + (C * C).sum(axis=1)
            )
            codes[:, s] = np.argmin(d2, axis=1)
        return pd.DataFrame(
            {"bucket": b.astype(np.int32), "codes": [r.tolist() for r in codes]}
        )

    out = base.select(
        F.col(id_col), f(F.col(vec_col).cast("array<double>")).alias("__ix")
    )
    return out.select(
        id_col, F.col("__ix.bucket").alias("bucket"), F.col("__ix.codes").alias("codes")
    )


def ivfpq_search(
    index: DataFrame,
    queries: DataFrame,
    centroids,
    codebook,
    k: int = 5,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFPQ search: per query, probe the ``nprobe`` nearest coarse
    buckets and ADC-scan only those buckets' codes. Because codes are
    residuals, the lookup table is per (query, bucket) — computed in
    one Arrow UDF pass over the exploded (query x probe) rows (nprobe x
    |queries| rows, still the tiny side), flattened, and broadcast into
    the bucket-equi-join against the index. The scan itself is the same
    pure codegen ``element_at``/``aggregate`` expression as
    :func:`pq_adc_topk` — Python never touches the big side, and the
    join key means each query reads ~nprobe/n_centroids of the index
    instead of all of it (compose with bucket-partitioned storage for
    the 10^10 shape). Returns (q_vec_id, vec_id, rn, adc_dist)."""
    from pyspark.sql import Window

    c = _norm_rows(np.asarray(centroids, dtype=np.float64))
    cb = np.asarray(codebook, dtype=np.float64)
    m, kk, sub = cb.shape

    probes = queries.select(
        F.col(id_col).alias("q_vec_id"), F.col(vec_col).alias("qv")
    ).withColumn(
        "bucket",
        F.explode(_probe_udf(c, nprobe)(F.col("qv").cast("array<double>"))),
    )

    @pandas_udf("array<double>")
    def lut_udf(vecs: pd.Series, buckets: pd.Series) -> pd.Series:
        Q = _mat(vecs)
        R = Q - c[buckets.to_numpy()]
        out = []
        for r in R:
            lut = np.empty((m, kk), dtype=np.float64)
            for s in range(m):
                diff = r[s * sub : (s + 1) * sub] - cb[s]
                lut[s] = (diff * diff).sum(axis=1)
            out.append(lut.ravel().tolist())
        return pd.Series(out)

    ql = probes.select(
        "q_vec_id",
        "bucket",
        lut_udf(F.col("qv").cast("array<double>"), F.col("bucket")).alias("lut"),
    )
    joined = index.join(F.broadcast(ql), "bucket").filter(
        F.col(id_col) != F.col("q_vec_id")
    )
    part = F.transform(
        F.col("codes"),
        lambda code, i: F.element_at(
            F.col("lut"), (i * kk + code + 1).cast("int")
        ),
    )
    adc = F.aggregate(part, F.lit(0.0), lambda acc, x: acc + x)
    w = Window.partitionBy("q_vec_id").orderBy(
        F.round(F.col("adc"), 9).asc(), F.col(id_col).asc()
    )
    return (
        joined.select("q_vec_id", F.col(id_col), adc.alias("adc"))
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
        .select(
            "q_vec_id", id_col, "rn", F.round("adc", 6).alias("adc_dist")
        )
    )


def linear_head_score(
    df: DataFrame,
    weights: list[float],
    bias: float = 0.0,
    vec_col: str = "embedding",
    out_col: str = "head_score",
) -> DataFrame:
    """Frozen linear head over an embedding column — the LAION-style
    aesthetic/CLIP-quality predictor pattern: score = w·x + b with the
    trained weights shipped as a plan literal.

    Pure JVM expressions (zip_with product + aggregate fold): no Python
    crossing, no shuffle, whole-stage-codegen friendly — at 10^10 rows
    this is a map-only scan bounded by parquet read bandwidth. For
    multi-layer heads, chain: hidden = relu(W1·x+b1) per unit is more
    literals; beyond ~10^3 weights switch to a broadcast join against a
    (unit, dim, weight) table or a pandas UDF with the matrix closed
    over — the single-layer literal form is the right shape for the
    published 1-layer aesthetic heads.
    """
    w_lit = F.array(*[F.lit(float(x)) for x in weights])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), w_lit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # zip_with null-pads on length mismatch and the fold propagates the
    # null — a wrong-checkpoint weight vector would silently NULL every
    # score (and a >0 screen would drop the whole corpus). Fail loudly.
    # NULL embeddings (e.g. a left join against the vector table) keep
    # a NULL score — only a PRESENT vector of the wrong length aborts
    guarded = F.when(F.col(vec_col).isNull(), F.lit(None).cast("double")) \
        .when(
            F.size(F.col(vec_col)) == len(weights), dot + F.lit(float(bias))
        ).otherwise(
            F.raise_error(
                F.lit(
                    f"linear_head_score: embedding dim != {len(weights)}"
                    " weights"
                )
            )
        )
    return df.withColumn(out_col, guarded)
