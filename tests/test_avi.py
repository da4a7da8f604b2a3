"""Uncompressed-AVI codec + real video frame/feature stages."""

from __future__ import annotations

import numpy as np
import pytest

from docling_eval_spark.operators.avi_codec import avi_decode, avi_encode
from docling_eval_spark.operators.multimodal import video_features


def _fixture_frames(n=8, h=10, w=7, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(n, h, w, 3), dtype=np.uint8)


def test_avi_roundtrip_exact_pixels():
    frames = _fixture_frames()  # w=7 → rows need 4-byte padding
    data = avi_encode(frames, fps=12.0)
    got, fps = avi_decode(data)
    assert got.shape == frames.shape
    assert np.array_equal(got, frames)
    assert abs(fps - 12.0) < 1e-6


def test_avi_rejects_compressed_stream():
    frames = _fixture_frames(2)
    data = bytearray(avi_encode(frames))
    # flip biCompression in strf (BI_RGB=0 → fourcc 'MJPG')
    idx = data.find(b"strf")
    data[idx + 8 + 16 : idx + 8 + 20] = b"MJPG"
    with pytest.raises(ValueError, match="compression"):
        avi_decode(bytes(data))


def test_video_features_real_vs_fake():
    still = np.full((4, 6, 6, 3), 128, dtype=np.uint8)
    feats = video_features(avi_encode(still, fps=5.0))
    n, fps, w, h, luma, motion, fake = feats
    assert (n, w, h, fake) == (4, 6, 6, False)
    assert abs(fps - 5.0) < 1e-6
    assert abs(luma - 128 / 255) < 1e-2
    assert motion == 0.0

    moving = _fixture_frames(6)
    real = video_features(avi_encode(moving))
    assert real[5] > 0.0 and real[6] is False

    fake_feats = video_features(b"\x00\x01" * 100)
    assert fake_feats[6] is True


@pytest.mark.spark
def test_frame_sample_stage_real_avi(spark):
    from docling_eval_spark.operators.multimodal import (
        frame_sample_stage,
        video_features_stage,
    )
    from docling_eval_spark.operators.png_codec import png_decode

    frames = _fixture_frames(20, h=8, w=8)
    avi = avi_encode(frames, fps=10.0)
    blob = b"\x01\x02" * 5000
    df = spark.createDataFrame(
        [("vid", bytearray(avi)), ("junk", bytearray(blob))],
        "url string, media binary",
    )
    out = frame_sample_stage(df, max_frames=4).collect()
    vid = sorted(
        (r for r in out if r["url"] == "vid"), key=lambda r: r["frame_no"]
    )
    junk = [r for r in out if r["url"] == "junk"]
    # 20 frames, max 4 → stride 5 → frames 0,5,10,15
    assert [r["frame_no"] for r in vid] == [0, 1, 2, 3]
    assert all(not r["fake"] and r["frame_w"] == 8 for r in vid)
    decoded = png_decode(bytes(vid[2]["frame_bytes"]))
    assert np.array_equal(decoded, frames[10])
    assert len(junk) == 2 and all(r["fake"] for r in junk)

    vf = {r["url"]: r["video_features"] for r in video_features_stage(df).collect()}
    assert vf["vid"]["fake"] is False and vf["vid"]["n_frames"] == 20
    assert vf["junk"]["fake"] is True
