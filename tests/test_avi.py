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
    # flip biCompression in strf (BI_RGB=0 → fourcc 'H264')
    idx = data.find(b"strf")
    data[idx + 8 + 16 : idx + 8 + 20] = b"H264"
    with pytest.raises(ValueError, match="compression"):
        avi_decode(bytes(data))
    # MJPG fourcc over non-JPEG chunk bytes must also fail loudly
    data[idx + 8 + 16 : idx + 8 + 20] = b"MJPG"
    with pytest.raises(ValueError):
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


def test_avi_malformed_header_degrades_not_crashes(spark):
    import struct

    from docling_eval_spark.operators.multimodal import frame_sample_stage

    frames = _fixture_frames(2, h=6, w=6)
    data = bytearray(avi_encode(frames))
    # declare absurd dimensions in BOTH headers (avih + BMIH agree, so
    # only the plausibility guard can save us)
    huge = 0x40000000
    i = data.find(b"avih") + 8
    data[i + 32 : i + 40] = struct.pack("<II", huge, huge)
    j = data.find(b"strf") + 8
    data[j + 4 : j + 12] = struct.pack("<ii", huge, huge)
    with pytest.raises(ValueError, match="implausible"):
        avi_decode(bytes(data))
    # through the stage: fake rows, never a task failure
    df = spark.createDataFrame(
        [("bad", bytearray(bytes(data)))], "url string, media binary"
    )
    rows = frame_sample_stage(df).collect()
    assert rows and all(r["fake"] for r in rows)


def test_avi_header_dimension_mismatch_rejected():
    import struct

    frames = _fixture_frames(2, h=6, w=6)
    data = bytearray(avi_encode(frames))
    i = data.find(b"avih") + 8
    data[i + 32 : i + 36] = struct.pack("<I", 12)  # avih width != BMIH
    with pytest.raises(ValueError, match="disagrees"):
        avi_decode(bytes(data))


def test_avi_top_down_dib_and_selective_decode():
    import numpy as np
    import struct

    frames = _fixture_frames(5, h=4, w=4)
    data = bytearray(avi_encode(frames))
    # flip to top-down DIB: negate biHeight AND pre-flip stored rows
    # (encoder wrote bottom-up) — build by hand instead: decode indices
    got, _ = avi_decode(bytes(data), indices=[0, 3])
    assert got.shape[0] == 2
    assert np.array_equal(got[0], frames[0])
    assert np.array_equal(got[1], frames[3])
    with pytest.raises(ValueError, match="out of range"):
        avi_decode(bytes(data), indices=[5])
    # top-down: negate biHeight; stored rows are bottom-up so the
    # decoded frame should now be vertically flipped
    j = data.find(b"strf") + 8
    (h,) = struct.unpack("<i", data[j + 8 : j + 12])
    data[j + 8 : j + 12] = struct.pack("<i", -h)
    flipped, _ = avi_decode(bytes(data), indices=[0])
    assert np.array_equal(flipped[0], frames[0][::-1])


def test_avi_mjpg_real_decode():
    import numpy as np

    # smooth gradient frames (JPEG-friendly); decode is lossy so
    # compare within a tolerance, plus exact dims and frame count
    h, w = 16, 24
    yy, xx = np.mgrid[0:h, 0:w]
    frames = np.stack(
        [
            np.stack(
                [(xx * 10 + t * 3) % 256, (yy * 8) % 256,
                 ((xx + yy) * 4) % 256], axis=-1
            ).astype(np.uint8)
            for t in range(4)
        ]
    )
    data = avi_encode(frames, fps=6.0, codec="mjpg")
    got, fps = avi_decode(data)
    assert got.shape == frames.shape and abs(fps - 6.0) < 1e-6
    err = np.abs(got.astype(int) - frames.astype(int)).mean()
    assert err < 12.0  # lossy but clearly the same pixels
    # selective decode works for MJPG too
    two, _ = avi_decode(data, indices=[1, 3])
    assert np.array_equal(two[0], got[1]) and np.array_equal(two[1], got[3])
    # features flow real
    feats = video_features(data)
    assert feats[6] is False and feats[0] == 4
