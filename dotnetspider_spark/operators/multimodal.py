"""Multimodal payload operators — image/audio/video as opaque binary.

Training-data-pipeline stages over binary payload columns with typed
metadata (driver mandate): decode, feature-extract, resize, frame-sample.
All Spark-side plumbing is real — schemas, ``mapInPandas`` iterator
batching, Arrow-bounded batch sizes, partition-friendly shapes. Decoders
for formats whose codec libraries are absent from this container (real
JPEG/MP4/WAV-compressed) are STUBBED with a loud ``NotImplementedError``;
the deterministic stand-in containers below (``FJPG`` in codec/png.py,
``FVID``/``FAUD`` here) keep every stage executable and testable
end-to-end, per the driver instruction to stub the codec, not the
pipeline.

Batch-shape note: payload rows run megabytes each, so these operators
must ride ``spark.sql.execution.arrow.maxRecordsPerBatch`` (set to 2048
in session.py) and an input partitioning that keeps per-task byte volume
bounded — repartition by a key, never coalesce payload partitions wide.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FVID_MAGIC = b"FVID"
_FAUD_MAGIC = b"FAUD"


# ----------------------------------------------------------- containers


def encode_fakevideo(frames: np.ndarray) -> bytes:
    """Deterministic video stand-in: (n, h, w, 3) uint8 -> bytes (STUB
    container; a real deployment decodes MP4/WebM via PyAV/ffmpeg)."""
    n, h, w, _ = frames.shape
    return (
        _FVID_MAGIC
        + struct.pack(">HHH", n, w, h)
        + zlib.compress(frames.tobytes(), 1)
    )


def decode_video(data: bytes) -> np.ndarray:
    if data[:4] == _FVID_MAGIC:
        n, w, h = struct.unpack(">HHH", data[4:10])
        raw = np.frombuffer(zlib.decompress(data[10:]), np.uint8)
        return raw.reshape(n, h, w, 3)
    raise NotImplementedError(
        "real video decode needs PyAV/ffmpeg, absent from this container; "
        "synthetic corpora use the FVID stand-in"
    )


def encode_fakeaudio(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Deterministic audio stand-in: float32 mono [-1,1] -> bytes."""
    q = (np.clip(samples, -1, 1) * 32767).astype(np.int16)
    return _FAUD_MAGIC + struct.pack(">I", rate) + zlib.compress(q.tobytes(), 1)


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    if data[:4] == _FAUD_MAGIC:
        (rate,) = struct.unpack(">I", data[4:8])
        q = np.frombuffer(zlib.decompress(data[8:]), np.int16)
        return q.astype(np.float32) / 32767.0, rate
    raise NotImplementedError(
        "real audio decode needs soundfile/librosa, absent from this "
        "container; synthetic corpora use the FAUD stand-in"
    )


# ----------------------------------------------------- image operators

IMAGE_FEATURES_SCHEMA = (
    "image_id string, w int, h int, mean_r double, mean_g double, "
    "mean_b double, brightness double, decodable boolean"
)


def image_features(images: DataFrame) -> DataFrame:
    """Decode + per-channel stats (mapInPandas iterator — one Python
    worker per partition streams Arrow batches; undecodable rows survive
    with ``decodable=false`` instead of failing the task)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dotnetspider_spark.codec.png import decode_image

        for pdf in batches:
            rows = []
            # itertuples-style zip: rows are MB-scale binaries so the
            # decode dominates, but iterrows' per-row Series construction
            # is pure overhead on top
            for image_id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    px = decode_image(bytes(data), fmt)
                    m = px.reshape(-1, 3).mean(axis=0)
                    rows.append(
                        (image_id, px.shape[1], px.shape[0],
                         float(m[0]), float(m[1]), float(m[2]),
                         float(m.mean()), True)
                    )
                except (NotImplementedError, ValueError):
                    rows.append((image_id, 0, 0, 0.0, 0.0, 0.0, 0.0, False))
            yield pd.DataFrame(
                rows,
                columns=["image_id", "w", "h", "mean_r", "mean_g", "mean_b",
                         "brightness", "decodable"],
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, IMAGE_FEATURES_SCHEMA
    )


RESIZE_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string"


def resize_images(images: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Nearest-neighbor resize; output re-encoded as PNG (real math on
    decodable payloads; undecodable rows are dropped with a count
    observable via the input/output row delta)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dotnetspider_spark.codec.png import decode_image, encode_png

        for pdf in batches:
            rows = []
            for image_id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    px = decode_image(bytes(data), fmt)
                except (NotImplementedError, ValueError):
                    continue
                h, w, _ = px.shape
                yi = (np.arange(target_h) * h // target_h).clip(0, h - 1)
                xi = (np.arange(target_w) * w // target_w).clip(0, w - 1)
                out = px[np.ix_(yi, xi)]
                rows.append(
                    (image_id, encode_png(out), target_w, target_h, "png")
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt"]
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, RESIZE_SCHEMA)


# ----------------------------------------------------- video operators

FRAME_SAMPLE_SCHEMA = (
    "video_id string, frame_idx int, bytes binary, w int, h int, fmt string"
)


def frame_sample(videos: DataFrame, every_n: int = 10) -> DataFrame:
    """Sample every Nth frame of each video into PNG rows (the typical
    pretraining frame-extraction stage). One input row fans out to
    ceil(n_frames / every_n) output rows — mapInPandas handles the 1->N
    row multiplication without an explode of materialized frames."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dotnetspider_spark.codec.png import encode_png

        for pdf in batches:
            rows = []
            for video_id, data in zip(pdf["video_id"], pdf["bytes"]):
                try:
                    frames = decode_video(bytes(data))
                except NotImplementedError:
                    continue
                for i in range(0, frames.shape[0], every_n):
                    rows.append(
                        (video_id, i, encode_png(frames[i]),
                         frames.shape[2], frames.shape[1], "png")
                    )
            yield pd.DataFrame(
                rows,
                columns=["video_id", "frame_idx", "bytes", "w", "h", "fmt"],
            )

    return videos.select("video_id", "bytes").mapInPandas(run, FRAME_SAMPLE_SCHEMA)


# ----------------------------------------------------- audio operators

AUDIO_FEATURES_SCHEMA = (
    "audio_id string, rate int, n_samples long, rms double, peak double, "
    "windows array<double>"
)


def audio_features(audio: DataFrame, window_s: float = 0.5) -> DataFrame:
    """Per-clip RMS/peak + windowed RMS energies (vectorized numpy)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for audio_id, data in zip(pdf["audio_id"], pdf["bytes"]):
                try:
                    samples, rate = decode_audio(bytes(data))
                except NotImplementedError:
                    continue
                win = max(1, int(rate * window_s))
                n = len(samples) // win * win
                w_rms = (
                    np.sqrt((samples[:n].reshape(-1, win) ** 2).mean(axis=1))
                    if n
                    else np.array([])
                )
                rows.append(
                    (audio_id, rate, len(samples),
                     float(np.sqrt((samples**2).mean())) if len(samples) else 0.0,
                     float(np.abs(samples).max()) if len(samples) else 0.0,
                     [float(x) for x in w_rms])
                )
            yield pd.DataFrame(
                rows,
                columns=["audio_id", "rate", "n_samples", "rms", "peak", "windows"],
            )

    return audio.select("audio_id", "bytes").mapInPandas(run, AUDIO_FEATURES_SCHEMA)


IMAGE_QUALITY_SCHEMA = (
    "image_id string, brightness double, contrast double, sharpness double, "
    "entropy double, w int, h int, decodable boolean, keep boolean"
)


def image_quality(
    images: DataFrame,
    min_brightness: float = 10.0,
    max_brightness: float = 245.0,
    min_contrast: float = 5.0,
    min_sharpness: float = 10.0,
    min_entropy: float = 1.0,
    min_side: int = 8,
) -> DataFrame:
    """Training-data image screening: per-image brightness (gray mean),
    contrast (gray std), sharpness (variance of a 3x3 Laplacian — the
    standard blur detector), and gray-histogram entropy, plus a ``keep``
    verdict. Real numpy math over whole Arrow batches via mapInPandas;
    undecodable rows survive with decodable=false and keep=false
    (fail-closed, like validate_payloads)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dotnetspider_spark.codec.png import decode_image

        for pdf in batches:
            rows = []
            for image_id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    px = decode_image(bytes(data), fmt)
                except (NotImplementedError, ValueError):
                    rows.append((image_id, 0.0, 0.0, 0.0, 0.0, 0, 0, False, False))
                    continue
                gray = px.astype(np.float64).mean(axis=2)
                h, w = gray.shape
                bright = float(gray.mean())
                contrast = float(gray.std())
                # 3x3 Laplacian via shifted sums (no scipy in sandbox)
                if h >= 3 and w >= 3:
                    lap = (
                        gray[:-2, 1:-1] + gray[2:, 1:-1]
                        + gray[1:-1, :-2] + gray[1:-1, 2:]
                        - 4.0 * gray[1:-1, 1:-1]
                    )
                    sharp = float(lap.var())
                else:
                    sharp = 0.0
                hist, _ = np.histogram(gray, bins=32, range=(0.0, 256.0))
                p = hist / max(1, hist.sum())
                p = p[p > 0]
                ent = float(-(p * np.log2(p)).sum())
                keep = (
                    min_brightness <= bright <= max_brightness
                    and contrast >= min_contrast
                    and sharp >= min_sharpness
                    and ent >= min_entropy
                    and min(h, w) >= min_side
                )
                rows.append(
                    (image_id, round(bright, 4), round(contrast, 4),
                     round(sharp, 4), round(ent, 4), w, h, True, keep)
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "brightness", "contrast", "sharpness",
                         "entropy", "w", "h", "decodable", "keep"],
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, IMAGE_QUALITY_SCHEMA
    )


# ------------------------------------------------ image-text alignment

#: Fixed color anchors for the deterministic joint-embedding stand-in:
#: the 8 corners of the RGB cube, named by their everyday color words.
COLOR_ANCHORS: tuple[tuple[str, tuple[int, int, int]], ...] = (
    ("red", (255, 0, 0)),
    ("green", (0, 255, 0)),
    ("blue", (0, 0, 255)),
    ("yellow", (255, 255, 0)),
    ("cyan", (0, 255, 255)),
    ("magenta", (255, 0, 255)),
    ("white", (255, 255, 255)),
    ("black", (0, 0, 0)),
)

_ANCHOR_RGB = np.array([c for _, c in COLOR_ANCHORS], np.float64)  # (8, 3)
_ANCHOR_WORDS = {w: i for i, (w, _) in enumerate(COLOR_ANCHORS)}


def image_anchor_vec(px: np.ndarray) -> np.ndarray:
    """uint8 (h, w, 3) -> L2-normalized fraction of pixels nearest each
    color anchor (ties break to the lower anchor index)."""
    flat = px.reshape(-1, 3).astype(np.float64)
    # (n, 8) squared distances to the anchors; argmin per pixel
    d2 = ((flat[:, None, :] - _ANCHOR_RGB[None, :, :]) ** 2).sum(axis=2)
    frac = np.bincount(d2.argmin(axis=1), minlength=len(COLOR_ANCHORS))
    v = frac.astype(np.float64)
    n = float(np.linalg.norm(v))
    return v / n if n > 0 else v


def caption_anchor_vec(caption: str) -> np.ndarray:
    """Caption -> L2-normalized color-word token counts in the SAME
    anchor basis (zero vector when no anchor word appears)."""
    v = np.zeros(len(COLOR_ANCHORS), np.float64)
    for tok in caption.lower().split():
        i = _ANCHOR_WORDS.get(tok.strip(".,;:!?()[]\"'"))
        if i is not None:
            v[i] += 1.0
    n = float(np.linalg.norm(v))
    return v / n if n > 0 else v


def clip_score_py(data: bytes, fmt: str, caption: str) -> float:
    """Pure-Python reference scorer (tests pin :func:`clip_score`
    against it row for row). Cosine of the two anchor vectors; 0.0 when
    either side is the zero vector."""
    from dotnetspider_spark.codec.png import decode_image

    return float(
        image_anchor_vec(decode_image(data, fmt)) @ caption_anchor_vec(caption)
    )


def clip_score(pairs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """CLIP-style image-caption alignment score + keep verdict — the
    model stage :func:`curation.image_caption_screen` documents as out
    of scope for its structural gates (LAION, Schuhmann et al. 2021,
    keeps pairs with CLIP cosine >= 0.28; DataComp varies the bar).

    The sandbox ships no learned encoder, so the joint embedding is a
    DETERMINISTIC STAND-IN (documented, like the FJPG/FVID codecs): both
    modalities project onto the fixed :data:`COLOR_ANCHORS` basis —
    image side = nearest-anchor pixel fractions over the DECODED pixels,
    caption side = anchor-word token counts — and the score is their
    cosine. A production deployment swaps the two ``*_anchor_vec``
    calls for model encoders inside the SAME ``mapInPandas`` stage; the
    Spark plumbing (Arrow batch iteration, full-row pass-through, no
    shuffle, fail-closed undecodable handling) is what this operator
    pins.

    Output = input columns (bytes included, so downstream stages keep
    streaming map-side) + ``clip_score double`` + ``decodable boolean``
    + ``keep boolean`` (score >= threshold AND decodable — fail-closed
    like validate_payloads). Map-only: no exchange at any scale.
    """
    in_cols = list(pairs.columns)
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in pairs.schema.fields]
        + ["clip_score double", "decodable boolean", "keep boolean"]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dotnetspider_spark.codec.png import decode_image

        for pdf in batches:
            scores, dec = [], []
            for data, fmt, caption in zip(pdf["bytes"], pdf["fmt"], pdf["caption"]):
                try:
                    px = decode_image(bytes(data), fmt)
                except (NotImplementedError, ValueError):
                    scores.append(0.0)
                    dec.append(False)
                    continue
                scores.append(
                    float(image_anchor_vec(px) @ caption_anchor_vec(str(caption)))
                )
                dec.append(True)
            out = pdf.copy()
            out["clip_score"] = scores
            out["decodable"] = dec
            out["keep"] = [s >= threshold and d for s, d in zip(scores, dec)]
            yield out

    return pairs.mapInPandas(run, out_schema).select(
        *in_cols, "clip_score", "decodable", "keep"
    )


# -------------------------------------------------- train augmentation

AUGMENT_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "crop_x int, crop_y int, flipped boolean"
)


def _aug_params(image_id: str, seed: int, h: int, w: int, min_crop: float):
    """Deterministic per-image augmentation draw: a seeded Generator
    keyed on (seed, image_id-hash) — reproducible across executors,
    partitionings, and reruns, which is what makes augmented corpora
    resumable and their shards byte-stable."""
    key = int.from_bytes(
        __import__("hashlib").md5(
            f"aug|{seed}|{image_id}".encode()
        ).digest()[:8],
        "big",
    )
    rng = np.random.default_rng(key)
    ch = max(1, int(round(h * (min_crop + (1 - min_crop) * rng.random()))))
    cw = max(1, int(round(w * (min_crop + (1 - min_crop) * rng.random()))))
    cy = int(rng.integers(0, h - ch + 1))
    cx = int(rng.integers(0, w - cw + 1))
    flip = bool(rng.random() < 0.5)
    return cx, cy, cw, ch, flip


def augment_images(
    images: DataFrame,
    target_w: int = 64,
    target_h: int = 64,
    seed: int = 0,
    min_crop: float = 0.8,
) -> DataFrame:
    """Training-time image augmentation as a corpus-prep stage: seeded
    random crop (>= ``min_crop`` of each side) + horizontal flip (p=0.5)
    + nearest resize to the training resolution, re-encoded PNG.

    The draw is a pure function of ``(seed, image_id)`` (see
    :func:`_aug_params`), NOT of partition or task order — rerunning the
    job, changing parallelism, or resuming from checkpoint yields
    byte-identical shards, and epoch k is ``seed=k``. Emits the applied
    ``crop_x/crop_y/flipped`` audit columns so a sample's provenance is
    reconstructable. Map-only mapInPandas, same batch-shape discipline
    as :func:`resize_images`; undecodable rows are dropped (the
    validate/screen stages upstream are where fail-closed accounting
    lives)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dotnetspider_spark.codec.png import decode_image, encode_png

        for pdf in batches:
            rows = []
            for image_id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    px = decode_image(bytes(data), fmt)
                except (NotImplementedError, ValueError):
                    continue
                h, w, _ = px.shape
                cx, cy, cw, ch, flip = _aug_params(
                    str(image_id), seed, h, w, min_crop
                )
                out = px[cy : cy + ch, cx : cx + cw]
                if flip:
                    out = out[:, ::-1]
                yi = (np.arange(target_h) * ch // target_h).clip(0, ch - 1)
                xi = (np.arange(target_w) * cw // target_w).clip(0, cw - 1)
                out = np.ascontiguousarray(out[np.ix_(yi, xi)])
                rows.append(
                    (image_id, encode_png(out), target_w, target_h, "png",
                     cx, cy, flip)
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "bytes", "w", "h", "fmt",
                         "crop_x", "crop_y", "flipped"],
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, AUGMENT_SCHEMA
    )
