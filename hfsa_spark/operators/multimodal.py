"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery here — schemas, batch iteration, partition-size
control, UDF signatures — is real and tested. The actual media decoding is
STUBBED (this environment ships no image/audio libraries): each codec
function raises ``NotImplementedError`` unless ``fake=True``, in which case
a deterministic fake decoder exercises the identical plumbing end-to-end.

Scale notes:
* media bytes dominate row size → repartition so batches stay within
  executor memory (``target_rows_per_batch`` maps to
  spark.sql.execution.arrow.maxRecordsPerBatch).
* metadata-only transformations (filtering by width/height/duration,
  sampling) must NOT deserialize payloads — they operate on the typed
  metadata columns and prune the binary column entirely (column pruning
  keeps the scan cheap).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hfsa_spark.plans import parallelize_compute

IMAGE_SCHEMA = (
    "doc_id bigint, media_type string, payload binary,"
    " width int, height int, n_channels int, format string"
)

IMAGE_FEATURES_SCHEMA = (
    "doc_id bigint, width int, height int, aspect_ratio double,"
    " mean_luma double, phash bigint"
)

FRAME_SAMPLE_SCHEMA = "doc_id bigint, frame_idx int, frame_payload binary"


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real image decode: derives pseudo pixel
    stats from a digest of the payload. Keeps plumbing testable without
    media libraries."""
    d = hashlib.sha256(payload or b"").digest()
    return {
        "width": 16 + d[0] % 64,
        "height": 16 + d[1] % 64,
        "mean_luma": d[2] / 255.0,
        "phash": int.from_bytes(d[3:11], "big", signed=True),
    }


def decode_image_batch(batch: pd.DataFrame, fake: bool = False) -> pd.DataFrame:
    if not fake:
        raise NotImplementedError(
            "real image decoding requires an image library (PIL/cv2) not "
            "present in this environment; pass fake=True for the "
            "deterministic plumbing-test decoder"
        )
    feats = batch["payload"].map(lambda p: _fake_decode(bytes(p) if p is not None else b""))
    out = pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "width": [f["width"] for f in feats],
            "height": [f["height"] for f in feats],
        }
    )
    out["aspect_ratio"] = out["width"] / out["height"]
    out["mean_luma"] = [f["mean_luma"] for f in feats]
    out["phash"] = [f["phash"] for f in feats]
    return out


def _maybe_parallel(df: DataFrame, min_partitions: int | None) -> DataFrame:
    """Pre-mapInPandas repartition, OPT-IN: a real (CPU-heavy) decoder on a
    few-split input should pass min_partitions to fan out; the default adds
    no shuffle because (a) at corpus scale inputs are already multi-split
    and (b) for light/stub decoders the shuffle + per-partition Python
    worker dispatch costs more than it saves (measured 1.1 s vs 0.3 s on a
    200-row batch)."""
    if min_partitions:
        return parallelize_compute(df, min_partitions)
    return df


def extract_image_features(
    media: DataFrame, fake: bool = False, min_partitions: int | None = None
) -> DataFrame:
    """media(doc_id, media_type, payload, ...) → image feature rows.

    Non-image rows are filtered BEFORE the Python stage (predicate stays
    JVM-side); only image payloads cross the Arrow boundary.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if len(batch):
                yield decode_image_batch(batch, fake=fake)

    return (
        _maybe_parallel(
            media.filter(F.col("media_type") == "image").select("doc_id", "payload"),
            min_partitions,
        )
        .mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)
    )


def sample_frames(
    media: DataFrame, every_n: int = 10, fake: bool = False, min_partitions: int | None = None
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame index.

    Frame decode is stubbed like image decode; the fan-out shape (1 row in,
    k rows out via mapInPandas) is the real, tested plumbing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for _, r in batch.iterrows():
                if not fake:
                    raise NotImplementedError(
                        "real video decoding unavailable; pass fake=True"
                    )
                payload = bytes(r["payload"]) if r["payload"] is not None else b""
                n_frames = 1 + (len(payload) % 50)
                for idx in range(0, n_frames, every_n):
                    digest = hashlib.sha256(payload + idx.to_bytes(4, "big")).digest()
                    rows.append((r["doc_id"], idx, digest))
            if rows:
                yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_payload"])

    return (
        _maybe_parallel(
            media.filter(F.col("media_type") == "video").select("doc_id", "payload"),
            min_partitions,
        )
        .mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)
    )


RESIZED_SCHEMA = "doc_id bigint, payload binary, width int, height int"

AUDIO_FEATURES_SCHEMA = (
    "doc_id bigint, duration_s double, sample_rate int, rms double, clip_ratio double"
)


def resize_images(
    media: DataFrame,
    target_width: int = 224,
    target_height: int = 224,
    fake: bool = False,
    min_partitions: int | None = None,
) -> DataFrame:
    """Batch image resize → (doc_id, payload, width, height).

    Real resize needs PIL/cv2 (absent here); the fake path re-digests the
    payload to a deterministic pseudo-resized blob so the Arrow batch
    shapes, output schema, and binary-column round-trip are fully tested.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not len(batch):
                continue
            if not fake:
                raise NotImplementedError(
                    "real image resizing requires PIL/cv2; pass fake=True"
                )
            payloads = batch["payload"].map(
                lambda p: hashlib.sha256(
                    (bytes(p) if p is not None else b"")
                    + f"{target_width}x{target_height}".encode()
                ).digest()
            )
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "payload": payloads,
                    "width": target_width,
                    "height": target_height,
                }
            )

    return (
        _maybe_parallel(
            media.filter(F.col("media_type") == "image").select("doc_id", "payload"),
            min_partitions,
        )
        .mapInPandas(run, schema=RESIZED_SCHEMA)
    )


def extract_audio_features(
    media: DataFrame, fake: bool = False, min_partitions: int | None = None
) -> DataFrame:
    """Audio feature extraction → (doc_id, duration_s, sample_rate, rms,
    clip_ratio). Decode stubbed like images (no soundfile/librosa here);
    the deterministic fake derives stats from a payload digest."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not len(batch):
                continue
            if not fake:
                raise NotImplementedError(
                    "real audio decoding requires soundfile/librosa; pass fake=True"
                )
            rows = []
            for _, r in batch.iterrows():
                payload = bytes(r["payload"]) if r["payload"] is not None else b""
                d = hashlib.sha256(payload).digest()
                rows.append(
                    (
                        r["doc_id"],
                        0.1 + (len(payload) % 3000) / 100.0,
                        [16000, 22050, 44100, 48000][d[0] % 4],
                        d[1] / 255.0,
                        (d[2] % 32) / 255.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "duration_s", "sample_rate", "rms", "clip_ratio"],
            )

    return (
        _maybe_parallel(
            media.filter(F.col("media_type") == "audio").select("doc_id", "payload"),
            min_partitions,
        )
        .mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)
    )


def synthesize_media_table(documents: DataFrame, media_type: str = "image") -> DataFrame:
    """Build a media table from the documents fixture: payload = text bytes
    (opaque, deterministic), metadata typed. Lets every multimodal operator
    be exercised against driver testdata."""
    return documents.select(
        F.col("doc_id"),
        F.lit(media_type).alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(3).alias("n_channels"),
        F.lit("fake").alias("format"),
    )
