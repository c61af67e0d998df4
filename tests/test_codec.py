"""PNG/fakejpeg codec + phash unit tests (no Spark)."""

from __future__ import annotations

import numpy as np
import pytest

from dotnetspider_spark.codec.png import (
    decode_image,
    decode_png,
    encode_fakejpeg,
    encode_png,
    phash64,
    psnr,
)


def _img(seed=0, shape=(24, 32, 3)):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


def test_png_roundtrip_lossless():
    img = _img(42)
    assert (decode_png(encode_png(img)) == img).all()


def test_png_decode_filtered_rows():
    # encoder always writes filter 0; decoder must handle 1-4 too
    import struct
    import zlib

    img = _img(7, (4, 5, 3))
    h, w, _ = img.shape
    # hand-build a PNG using filter type 2 (Up) for every row
    lines = []
    prev = np.zeros(w * 3, np.uint8)
    for y in range(h):
        cur = img[y].reshape(-1)
        lines.append(b"\x02" + ((cur.astype(np.int16) - prev) % 256).astype(np.uint8).tobytes())
        prev = cur
    from dotnetspider_spark.codec.png import _chunk, _PNG_SIG

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _chunk(b"IEND", b"")
    )
    assert (decode_png(data) == img).all()


def test_fakejpeg_lossy_psnr_band():
    img = _img(1)
    d90 = decode_image(encode_fakejpeg(img, 90), "jpeg")
    d50 = decode_image(encode_fakejpeg(img, 50), "jpeg")
    assert psnr(img, d90) >= 45
    assert 40 <= psnr(img, d50) < psnr(img, d90)


def test_real_jpeg_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0" + b"0" * 64, "jpeg")


def test_phash_stability_and_nearness():
    img = _img(3, (32, 32, 3))
    assert phash64(img) == phash64(img.copy())
    near = img.copy()
    near[0, 0] = 255 - near[0, 0]
    ham = bin((phash64(img) ^ phash64(near)) & ((1 << 64) - 1)).count("1")
    assert ham <= 4
    far = _img(99, (32, 32, 3))
    ham_far = bin((phash64(img) ^ phash64(far)) & ((1 << 64) - 1)).count("1")
    assert ham_far > 10


def test_phash_fits_int64():
    for seed in range(20):
        v = phash64(_img(seed))
        assert -(1 << 63) <= v < (1 << 63)
