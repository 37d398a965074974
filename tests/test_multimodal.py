"""Multimodal plumbing: schemas, Arrow batch shapes, resize/feature
kernels over the synthetic RAW1 format, stubbed codec behavior."""

from __future__ import annotations

import numpy as np
import pytest

from bm25_chroma_spark.sources.multimodal import (
    decode_raw1,
    encode_raw1,
    extract_features,
    resize_images,
    sample_frames,
    synth_media,
)


def test_raw1_roundtrip():
    img = np.arange(48, dtype=np.uint8).reshape(6, 8)
    assert (decode_raw1(encode_raw1(img)) == img).all()


def test_decode_stub_rejects_real_formats():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_raw1(b"\x89PNG\r\n\x1a\n....")


def test_synth_media_deterministic(spark):
    a = synth_media(spark, 10).collect()
    b = synth_media(spark, 10).collect()
    akey = {(r["media_id"], bytes(r["payload"])) for r in a}
    bkey = {(r["media_id"], bytes(r["payload"])) for r in b}
    assert akey == bkey
    for r in a:
        assert r["mime"] == "image/x-raw1"
        assert len(r["payload"]) == 8 + r["width"] * r["height"]


def test_resize(spark):
    media = synth_media(spark, 6)
    out = resize_images(media, 16, 12).collect()
    assert len(out) == 6
    for r in out:
        assert (r["width"], r["height"]) == (16, 12)
        img = decode_raw1(bytes(r["payload"]))
        assert img.shape == (12, 16)


def test_features(spark):
    media = synth_media(spark, 5)
    feats = extract_features(media, bins=16).collect()
    assert len(feats) == 5
    for r in feats:
        v = np.array(r["features"])
        assert len(v) == 16
        assert abs(v.sum() - 1.0) < 1e-5  # normalized histogram


def test_frame_sampling_stub(spark):
    media = synth_media(spark, 3)  # all images -> filtered to empty
    assert sample_frames(media).count() == 0  # stub never executes
