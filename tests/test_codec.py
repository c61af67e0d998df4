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


def test_corrupt_real_jpeg_raises_valueerror():
    # garbage after SOI is a corrupt stream, not a stub: fail-closed
    # signal validate_payloads maps to valid=false
    with pytest.raises(ValueError):
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


# ------------------------------------------------------- real JPEG codec


def _smooth(shape=(40, 56, 3)):
    """Gradient + flat patch: representative of photographic content
    (pure noise is JPEG's worst case and not what a crawl fetches)."""
    h, w, _ = shape
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(xx * 255 // w), (yy * 255 // h), ((xx + yy) * 255 // (h + w))],
        axis=2,
    ).astype(np.uint8)
    img[h // 4 : h // 2, w // 4 : w // 2] = [200, 40, 90]
    return img


def test_jpeg_roundtrip_psnr_bands():
    from dotnetspider_spark.codec.jpeg import decode_jpeg, encode_jpeg

    img = _smooth()
    d95 = decode_jpeg(encode_jpeg(img, 95))
    d90 = decode_jpeg(encode_jpeg(img, 90))
    d50 = decode_jpeg(encode_jpeg(img, 50))
    assert psnr(img, d95) >= 45
    assert psnr(img, d90) >= 40  # the north-rule lossy invariant band
    assert psnr(img, d50) < psnr(img, d90) and psnr(img, d50) >= 28


def test_jpeg_dispatch_via_decode_image():
    from dotnetspider_spark.codec.jpeg import encode_jpeg

    img = _smooth((24, 24, 3))
    data = encode_jpeg(img, 92)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert psnr(img, decode_image(data, "jpeg")) >= 40


def test_jpeg_subsample_and_odd_sizes():
    from dotnetspider_spark.codec.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(5)
    for (h, w) in ((8, 8), (9, 13), (24, 24), (33, 47), (1, 1), (3, 100)):
        im = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for sub in (False, True):
            out = decode_jpeg(encode_jpeg(im, 90, subsample=sub))
            assert out.shape == im.shape
    img = _smooth((34, 42, 3))  # not multiples of 16
    d420 = decode_jpeg(encode_jpeg(img, 95, subsample=True))
    assert psnr(img, d420) >= 30  # chroma halved: looser but sane band


def test_jpeg_restart_markers_decode_identically():
    from dotnetspider_spark.codec.jpeg import decode_jpeg, encode_jpeg

    img = _smooth((40, 56, 3))
    plain = decode_jpeg(encode_jpeg(img, 90))
    with_rst = decode_jpeg(encode_jpeg(img, 90, restart_interval=3))
    # restart markers change the container, not the quantized data
    assert (plain == with_rst).all()


def test_jpeg_progressive_rejected_loudly():
    from dotnetspider_spark.codec.jpeg import decode_jpeg, encode_jpeg

    data = bytearray(encode_jpeg(_smooth((16, 16, 3)), 90))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))


def test_jpeg_truncated_stream_fails_closed():
    from dotnetspider_spark.codec.jpeg import decode_jpeg, encode_jpeg

    data = encode_jpeg(_smooth((16, 16, 3)), 90)
    with pytest.raises(ValueError):
        decode_jpeg(data[: len(data) // 2])
    with pytest.raises(ValueError):
        decode_jpeg(data[:40])  # dies inside the header segments


def test_jpeg_interop_with_jvm_imageio(spark):
    """Cross-validate against javax.imageio — an independent codebase:
    (a) the JVM decodes our encoder's output, agreeing with our decoder;
    (b) our decoder parses a real-world JPEG the JVM encoder produced
    (different Huffman layout, 4:2:0, its own APP segments)."""
    from dotnetspider_spark.codec.jpeg import decode_jpeg, encode_jpeg

    jvm = spark._jvm
    img = _smooth((16, 16, 3))

    mine = encode_jpeg(img, 92)
    bais = jvm.java.io.ByteArrayInputStream(bytearray(mine))
    bi = jvm.javax.imageio.ImageIO.read(bais)
    assert bi is not None, "javax.imageio rejected our JPEG"
    got = np.zeros((16, 16, 3), np.uint8)
    for y in range(16):
        for x in range(16):
            rgb = bi.getRGB(x, y)
            got[y, x] = [(rgb >> 16) & 255, (rgb >> 8) & 255, rgb & 255]
    ours = decode_jpeg(mine)
    assert psnr(ours, got) >= 45  # two decoders of one stream agree
    assert psnr(img, got) >= 40

    # real-world encoder -> our decoder
    bio = jvm.java.awt.image.BufferedImage(16, 16, 1)  # TYPE_INT_RGB
    for y in range(16):
        for x in range(16):
            r, g, b = (int(v) for v in img[y, x])
            bio.setRGB(x, y, (r << 16) | (g << 8) | b)
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
        "jpg"
    ).next()
    param = writer.getDefaultWriteParam()
    param.setCompressionMode(2)  # MODE_EXPLICIT
    param.setCompressionQuality(0.95)
    writer.setOutput(ios)
    writer.write(
        None, jvm.javax.imageio.IIOImage(bio, None, None), param
    )
    writer.dispose()
    ios.close()
    jdata = bytes(baos.toByteArray())
    dec = decode_jpeg(jdata)
    assert dec.shape == img.shape
    assert psnr(img, dec) >= 30  # their 4:2:0 quantization, our decode


def test_jpeg_corrupt_header_crossrefs_raise_valueerror():
    # review fix: a SOS component id matching no SOF component (and any
    # other corrupt header cross-reference) must surface as ValueError —
    # the validate UDFs' fail-closed catch — never KeyError
    from dotnetspider_spark.codec.jpeg import decode_jpeg, encode_jpeg

    data = bytearray(encode_jpeg(_smooth((16, 16, 3)), 90))
    i = data.find(b"\xff\xda")
    # SOS layout: FF DA len(2) ns cid1 tdta1 ... -> corrupt cid1
    data[i + 5] = 0x77
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))


def test_png_gray_and_rgba_decode():
    """Round-5: gray (type 0) replicates to RGB; RGBA (type 6) drops
    alpha — the common crawl-payload variants beyond plain truecolor."""
    import struct as _struct
    import zlib as _zlib

    from dotnetspider_spark.codec.png import _PNG_SIG, _chunk, decode_png

    rng = np.random.default_rng(11)

    def build(coltype, ch, h, w, px_bytes):
        ihdr = _struct.pack(">IIBBBBB", w, h, 8, coltype, 0, 0, 0)
        raw = b"".join(
            b"\x00" + px_bytes[y * w * ch : (y + 1) * w * ch]
            for y in range(h)
        )
        return (_PNG_SIG + _chunk(b"IHDR", ihdr)
                + _chunk(b"IDAT", _zlib.compress(raw))
                + _chunk(b"IEND", b""))

    g = rng.integers(0, 256, (5, 7), dtype=np.uint8)
    got = decode_png(build(0, 1, 5, 7, g.tobytes()))
    assert got.shape == (5, 7, 3)
    assert (got == np.repeat(g[:, :, None], 3, axis=2)).all()

    rgba = rng.integers(0, 256, (4, 6, 4), dtype=np.uint8)
    got = decode_png(build(6, 4, 4, 6, rgba.tobytes()))
    assert got.shape == (4, 6, 3)
    assert (got == rgba[:, :, :3]).all()

    with pytest.raises(NotImplementedError):  # palette stays loud
        decode_png(build(3, 1, 2, 2, bytes(4)))


def test_exif_roundtrip_and_orientation_transforms():
    from dotnetspider_spark.codec.jpeg import (
        apply_orientation,
        build_exif,
        encode_jpeg,
        read_exif,
    )

    img = _smooth((16, 16, 3))
    exif = build_exif(6, "2024:03:04 05:06:07", "acme", "cam-1")
    jpg = encode_jpeg(img, 90, exif=exif)
    got = read_exif(jpg)
    assert got == {
        "orientation": 6, "datetime": "2024:03:04 05:06:07",
        "make": "acme", "model": "cam-1",
    }
    assert read_exif(encode_jpeg(img, 90)) == {}  # no APP1 -> empty
    # exif segment must not disturb the pixel stream
    from dotnetspider_spark.codec.jpeg import decode_jpeg

    assert (decode_jpeg(jpg) == decode_jpeg(encode_jpeg(img, 90))).all()

    # all 8 orientations: normalizing then comparing against direct
    # numpy expectations on an asymmetric array
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    expect = {
        1: px,
        2: px[:, ::-1],
        3: px[::-1, ::-1],
        4: px[::-1, :],
        5: px.transpose(1, 0, 2),
        6: np.rot90(px, 3),
        7: px.transpose(1, 0, 2)[::-1, ::-1],
        8: np.rot90(px, 1),
    }
    for o, want in expect.items():
        assert (apply_orientation(px, o) == want).all(), o
    with pytest.raises(ValueError):
        apply_orientation(px, 9)


def test_jpeg_decoder_fuzz_fails_closed():
    """Seeded corruption fuzz: whatever bytes arrive, decode_jpeg may
    only succeed or raise ValueError/NotImplementedError — any other
    exception would escape the validate UDFs' fail-closed catch and
    kill the executor task (the round-5 review found a KeyError this
    way; this pins the whole contract)."""
    from dotnetspider_spark.codec.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(1234)
    base = bytearray(encode_jpeg(_smooth((16, 16, 3)), 85,
                                 restart_interval=2))
    for trial in range(300):
        data = bytearray(base)
        for _ in range(rng.integers(1, 4)):
            data[rng.integers(2, len(data))] = rng.integers(0, 256)
        try:
            out = decode_jpeg(bytes(data))
            assert out.dtype == np.uint8 and out.ndim == 3
        except (ValueError, NotImplementedError):
            pass  # the two documented fail-closed signals
    # truncation sweep at every 37th prefix length
    for cut in range(2, len(base), 37):
        try:
            decode_jpeg(bytes(base[:cut]))
        except (ValueError, NotImplementedError):
            pass
