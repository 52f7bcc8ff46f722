"""Motion-JPEG AVI: container round-trip, real frame pixel decode through
the sampling pipeline, fps/stream-header parsing, and malformed payloads."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hfsa_spark.operators.multimodal import (
    encode_avi_mjpeg,
    extract_frame_features,
    parse_avi,
    sample_frames,
    synthesize_avi_table,
)


def _solid(v):
    return np.full((16, 16, 3), v, dtype=np.uint8)


def test_roundtrip_container_fields():
    avi = encode_avi_mjpeg([_solid([10, 20, 30])] * 4, fps=25)
    p = parse_avi(avi)
    assert (p["format"], p["codec"], p["n_frames"]) == ("avi", "MJPG", 4)
    assert (p["width"], p["height"], p["fps"]) == (16, 16, 25.0)


def test_frames_are_complete_jpegs():
    avi = encode_avi_mjpeg([_solid([200, 100, 50]), _solid([0, 0, 0])], fps=10)
    p = parse_avi(avi)
    for fb in p["frames"]:
        assert fb[:2] == b"\xff\xd8" and fb[-2:] == b"\xff\xd9"


def test_decoded_frame_pixels_match_source():
    from hfsa_spark.operators.jpeg import decode_jpeg

    src = _solid([120, 130, 140])
    p = parse_avi(encode_avi_mjpeg([src], fps=25, quality=90))
    arr = decode_jpeg(p["frames"][0])
    # quality-90 solid block: within quantization error of the source
    assert arr.shape == (16, 16, 3)
    assert np.abs(arr.astype(int) - src.astype(int)).max() <= 4


def test_parse_rejects_non_avi():
    assert parse_avi(b"RIFF\x04\x00\x00\x00WAVE") is None
    assert parse_avi(b"\x00" * 40) is None
    assert parse_avi(b"") is None


def test_odd_sized_frames_stay_word_aligned():
    # JPEG payloads of odd length force the RIFF pad byte on the hot path
    frames = [_solid([i * 40, 7, 255 - i * 40]) for i in range(5)]
    avi = encode_avi_mjpeg(frames, fps=10)
    p = parse_avi(avi)
    assert p["n_frames"] == 5
    for fb in p["frames"]:
        assert fb[:2] == b"\xff\xd8" and fb[-2:] == b"\xff\xd9"


def test_sample_frames_real_avi_path(spark):
    docs = spark.createDataFrame([(i,) for i in range(4)], "doc_id bigint")
    media = synthesize_avi_table(docs, n_frames=6)
    out = sample_frames(media, every_n=2).collect()
    assert len(out) == 4 * 3  # frames 0, 2, 4 per doc
    by_doc = {(r.doc_id, r.frame_idx): r for r in out}
    # even doc_id → 25 fps → frame 2 at 0.08 s; odd → 10 fps → 0.2 s
    assert by_doc[(0, 2)].frame_ts_s == pytest.approx(0.08)
    assert by_doc[(1, 2)].frame_ts_s == pytest.approx(0.2)
    assert all(r.frame_payload is not None for r in out)


def test_extract_frame_features_real_pixels(spark):
    docs = spark.createDataFrame([(0,)], "doc_id bigint")
    media = synthesize_avi_table(docs, n_frames=2)
    feats = extract_frame_features(sample_frames(media, every_n=1)).collect()
    assert len(feats) == 2
    for r in feats:
        assert (r.width, r.height) == (16, 16)
        assert 0.0 <= r.mean_luma <= 1.0
    # frame 1 color (s=41): r,g,b = 205, 31, 195 — distinctly brighter red
    assert feats[0].mean_luma != feats[1].mean_luma


def test_mp4_probe_still_works_alongside_avi(spark):
    from hfsa_spark.operators.multimodal import build_mp4_skeleton

    rows = [(0, "video", bytearray(build_mp4_skeleton()))]
    media = spark.createDataFrame(
        rows, "doc_id bigint, media_type string, payload binary"
    )
    out = sample_frames(media, every_n=30).collect()
    assert out and all(r.frame_payload is None for r in out)
