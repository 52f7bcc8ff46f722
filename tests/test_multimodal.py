"""Multimodal plumbing tests: Arrow batch shapes, schemas, binary-column
round-trips, JVM-side media-type filtering, and the NotImplementedError
gate on the (stubbed) real decoders."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hfsa_spark.operators.multimodal import (
    extract_audio_features,
    extract_image_features,
    resize_images,
    sample_frames,
    synthesize_media_table,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"text body {i} " * (i + 1), "en", "src0", 10) for i in range(20)],
        "doc_id bigint, text string, lang string, source string, n_chars int",
    )


def test_image_features_deterministic(spark, docs):
    media = synthesize_media_table(docs, "image")
    a = {r["doc_id"]: r["phash"] for r in extract_image_features(media, fake=True).collect()}
    b = {r["doc_id"]: r["phash"] for r in extract_image_features(media, fake=True).collect()}
    assert a == b and len(a) == 20


def test_non_image_rows_never_reach_python(spark, docs):
    media = synthesize_media_table(docs, "video")
    out = extract_image_features(media, fake=True)
    assert out.count() == 0  # filter is JVM-side; python stage sees nothing


def test_real_decode_gated(spark, docs):
    media = synthesize_media_table(docs, "image")
    with pytest.raises(Exception) as exc:
        extract_image_features(media, fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_resize_round_trip(spark, docs):
    media = synthesize_media_table(docs, "image")
    out = resize_images(media, 224, 224, fake=True).collect()
    assert len(out) == 20
    assert all(r["width"] == 224 and r["height"] == 224 for r in out)
    assert all(isinstance(bytes(r["payload"]), bytes) and len(r["payload"]) == 32 for r in out)


def test_audio_features(spark, docs):
    media = synthesize_media_table(docs, "audio")
    out = extract_audio_features(media, fake=True).collect()
    assert len(out) == 20
    assert all(r["sample_rate"] in (16000, 22050, 44100, 48000) for r in out)
    assert all(0 <= r["rms"] <= 1 for r in out)


def test_frame_sampling_fanout(spark, docs):
    media = synthesize_media_table(docs, "video")
    out = sample_frames(media, every_n=5, fake=True)
    rows = out.collect()
    assert len(rows) >= 20  # >= 1 frame per video
    per_doc = out.groupBy("doc_id").count().collect()
    assert len(per_doc) == 20
