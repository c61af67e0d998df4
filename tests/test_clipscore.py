"""CLIP-style image-caption alignment score (multimodal.clip_score)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from dotnetspider_spark.codec.png import encode_fakejpeg, encode_png
from dotnetspider_spark.operators.multimodal import (
    COLOR_ANCHORS,
    caption_anchor_vec,
    clip_score,
    clip_score_py,
    image_anchor_vec,
)

PAIRS_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string, caption string"


def _solid(rgb, w=12, h=10) -> np.ndarray:
    px = np.zeros((h, w, 3), np.uint8)
    px[:, :] = rgb
    return px


def _half(rgb_a, rgb_b, w=12, h=10) -> np.ndarray:
    px = _solid(rgb_a, w, h)
    px[h // 2 :, :] = rgb_b
    return px


def test_anchor_vecs_hand_computed():
    red = image_anchor_vec(_solid((255, 0, 0)))
    assert red[0] == pytest.approx(1.0) and red[1:].sum() == 0.0
    hh = image_anchor_vec(_half((255, 0, 0), (0, 0, 255)))
    assert hh[0] == pytest.approx(1 / math.sqrt(2))
    assert hh[2] == pytest.approx(1 / math.sqrt(2))
    cap = caption_anchor_vec("a red test card, Red!")
    assert cap[0] == pytest.approx(1.0)  # both 'red' tokens, one anchor
    assert caption_anchor_vec("no colors here").sum() == 0.0


def test_clip_score_matched_mismatched_and_mixed(spark):
    rows = [
        ("match", encode_png(_solid((255, 0, 0))), 12, 10, "png",
         "a red test card"),
        ("mismatch", encode_png(_solid((0, 255, 0))), 12, 10, "png",
         "a blue test card"),
        ("mixed", encode_png(_half((255, 0, 0), (0, 0, 255))), 12, 10,
         "png", "a red test card"),
        ("lossy", encode_fakejpeg(_solid((0, 0, 255)), 90), 12, 10,
         "jpeg", "a blue test card"),
        ("nocolor", encode_png(_solid((255, 255, 255))), 12, 10, "png",
         "a test card"),
    ]
    out = {
        r.image_id: r
        for r in clip_score(
            spark.createDataFrame(rows, PAIRS_SCHEMA), threshold=0.5
        ).collect()
    }
    assert out["match"].clip_score == pytest.approx(1.0) and out["match"].keep
    assert out["mismatch"].clip_score == pytest.approx(0.0)
    assert not out["mismatch"].keep
    assert out["mixed"].clip_score == pytest.approx(1 / math.sqrt(2))
    assert out["mixed"].keep
    assert out["lossy"].clip_score == pytest.approx(1.0) and out["lossy"].keep
    assert out["nocolor"].clip_score == 0.0 and not out["nocolor"].keep
    # full-row pass-through: caption and bytes survive the stage
    assert out["match"].caption == "a red test card"
    assert bytes(out["match"].bytes) == rows[0][1]


def test_clip_score_fail_closed_on_undecodable(spark):
    rows = [("junk", b"\x00\x01notanimage", 4, 4, "png", "a red test card")]
    r = clip_score(spark.createDataFrame(rows, PAIRS_SCHEMA)).collect()[0]
    assert not r.decodable and r.clip_score == 0.0 and not r.keep


def test_clip_score_agrees_with_pure_python_reference(spark):
    rng = np.random.default_rng(7)
    words = [w for w, _ in COLOR_ANCHORS] + ["test", "card", "ochre"]
    rows = []
    for i in range(24):
        px = rng.integers(0, 256, (6 + i % 5, 5 + i % 7, 3), dtype=np.uint8)
        cap = " ".join(rng.choice(words, size=4))
        rows.append((f"i{i}", encode_png(px), px.shape[1], px.shape[0],
                     "png", cap))
    got = {
        r.image_id: r.clip_score
        for r in clip_score(spark.createDataFrame(rows, PAIRS_SCHEMA)).collect()
    }
    for image_id, data, _w, _h, fmt, cap in rows:
        assert got[image_id] == pytest.approx(
            clip_score_py(data, fmt, cap), abs=1e-12
        )


# ---------------------------------------------------- augment_images


def _corpus_rows(n=12, seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        px = rng.integers(0, 256, (16 + i % 9, 14 + i % 11, 3), dtype=np.uint8)
        rows.append((f"img{i}", encode_png(px), px.shape[1], px.shape[0],
                     "png", "x"))
    return rows


def test_augment_images_deterministic_and_partition_invariant(spark):
    from dotnetspider_spark.operators.multimodal import augment_images

    rows = _corpus_rows()
    df1 = spark.createDataFrame(rows, PAIRS_SCHEMA).repartition(1)
    df4 = spark.createDataFrame(list(reversed(rows)), PAIRS_SCHEMA).repartition(4)
    a = {r.image_id: r for r in augment_images(df1, 8, 8, seed=5).collect()}
    b = {r.image_id: r for r in augment_images(df4, 8, 8, seed=5).collect()}
    assert set(a) == set(b) == {r[0] for r in rows}
    for k in a:  # byte-identical across partitioning and input order
        assert bytes(a[k].bytes) == bytes(b[k].bytes)
        assert (a[k].crop_x, a[k].crop_y, a[k].flipped) == (
            b[k].crop_x, b[k].crop_y, b[k].flipped)
        assert (a[k].w, a[k].h, a[k].fmt) == (8, 8, "png")


def test_augment_images_seed_changes_draw_and_matches_reference(spark):
    from dotnetspider_spark.codec.png import decode_image
    from dotnetspider_spark.operators.multimodal import (
        _aug_params,
        augment_images,
    )

    rows = _corpus_rows(n=8)
    df = spark.createDataFrame(rows, PAIRS_SCHEMA)
    s5 = {r.image_id: r for r in augment_images(df, 8, 8, seed=5).collect()}
    s6 = {r.image_id: r for r in augment_images(df, 8, 8, seed=6).collect()}
    assert any(
        bytes(s5[k].bytes) != bytes(s6[k].bytes) for k in s5
    )  # epoch seed actually varies the draw
    # replay one row's crop/flip/resize in pure numpy
    image_id, data, w, h, fmt, _cap = rows[0]
    px = decode_image(data, fmt)
    cx, cy, cw, ch, flip = _aug_params(image_id, 5, px.shape[0], px.shape[1], 0.8)
    out = px[cy : cy + ch, cx : cx + cw]
    if flip:
        out = out[:, ::-1]
    yi = (np.arange(8) * ch // 8).clip(0, ch - 1)
    xi = (np.arange(8) * cw // 8).clip(0, cw - 1)
    expect = out[np.ix_(yi, xi)]
    got = decode_image(bytes(s5[image_id].bytes), "png")
    assert np.array_equal(got, expect)


def test_augment_images_drops_undecodable(spark):
    from dotnetspider_spark.operators.multimodal import augment_images

    rows = _corpus_rows(n=3) + [("bad", b"nope", 4, 4, "png", "x")]
    out = augment_images(
        spark.createDataFrame(rows, PAIRS_SCHEMA), 8, 8
    ).collect()
    assert sorted(r.image_id for r in out) == ["img0", "img1", "img2"]
