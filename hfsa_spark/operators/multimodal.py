"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

Decode status (this environment ships no media libraries; everything below
is dependency-free stdlib/numpy over public file-format layouts):
* images — REAL header decode for PNG / JPEG / GIF / BMP
  (``parse_image_header``: width, height, channels, format). Pixel-level
  stats (mean_luma, phash) need a full raster decode of compressed
  formats, so they are null on the real path and only the deterministic
  ``fake=True`` plumbing decoder fills them.
* audio — REAL WAV (RIFF PCM) decode: duration, sample rate from the fmt
  chunk; RMS and clip ratio computed from the actual PCM samples with
  numpy.
* video — still stubbed behind ``fake=True`` (container demux genuinely
  needs codec libraries); the fan-out plumbing is real and tested.

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
import struct
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


# ------------------------------------------------ real header decoders --
# Public file-format layouts: PNG (RFC 2083 / ISO 15948), JPEG (ITU T.81),
# GIF87a/89a, BMP (BITMAPINFOHEADER), WAV (RIFF). Pure stdlib.

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
             0xCD, 0xCE, 0xCF}


def parse_image_header(data: bytes) -> dict | None:
    """(format, width, height, n_channels) from the image header bytes, or
    None if the payload is not a recognized image. Reads only the header —
    O(1) for PNG/GIF/BMP, O(#segments) for JPEG — never the raster."""
    if len(data) >= 24 and data[:8] == b"\x89PNG\r\n\x1a\n" and data[12:16] == b"IHDR":
        w, h = struct.unpack_from(">II", data, 16)
        color_type = data[25]
        return {"format": "png", "width": w, "height": h,
                "n_channels": _PNG_CHANNELS.get(color_type, 3)}
    if len(data) >= 4 and data[:2] == b"\xff\xd8":
        pos = 2
        while pos + 9 < len(data):
            if data[pos] != 0xFF:
                pos += 1
                continue
            marker = data[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            (seg_len,) = struct.unpack_from(">H", data, pos + 2)
            if marker in _JPEG_SOF:
                h, w = struct.unpack_from(">HH", data, pos + 5)
                return {"format": "jpeg", "width": w, "height": h,
                        "n_channels": data[pos + 9]}
            pos += 2 + seg_len
        return None
    if len(data) >= 10 and data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack_from("<HH", data, 6)
        return {"format": "gif", "width": w, "height": h, "n_channels": 3}
    if len(data) >= 26 and data[:2] == b"BM":
        w, h = struct.unpack_from("<ii", data, 18)
        bpp = struct.unpack_from("<H", data, 28)[0] if len(data) >= 30 else 24
        return {"format": "bmp", "width": w, "height": abs(h),
                "n_channels": max(1, bpp // 8)}
    return None


def parse_wav(data: bytes) -> dict | None:
    """RIFF/WAVE decode: fmt-chunk metadata plus the REAL PCM samples
    (int16/int8) as a numpy array for downstream stats. Returns None for
    non-WAV payloads."""
    import numpy as np

    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt " and len(body) >= 16:
            _, n_ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            fmt = {"n_channels": n_ch, "sample_rate": rate, "bits": bits}
        elif cid == b"data" and fmt is not None:
            if fmt["bits"] == 16:
                samples = np.frombuffer(body[: len(body) & ~1], dtype="<i2")
                full = 32768.0
            elif fmt["bits"] == 8:
                samples = np.frombuffer(body, dtype="u1").astype("int16") - 128
                full = 128.0
            else:
                return None
            n_frames = len(samples) // max(fmt["n_channels"], 1)
            return {
                **fmt,
                "duration_s": n_frames / max(fmt["sample_rate"], 1),
                "rms": float(np.sqrt(np.mean((samples / full) ** 2)))
                if len(samples)
                else 0.0,
                "clip_ratio": float(np.mean(np.abs(samples) >= full - 1))
                if len(samples)
                else 0.0,
            }
        pos += 8 + clen + (clen & 1)
    return None


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
    """Real path: header decode (PNG/JPEG/GIF/BMP) — width/height/aspect
    from actual bytes; pixel stats (mean_luma, phash) stay null (raster
    decode of compressed formats needs a codec library). Unrecognized
    payloads yield null dimensions rather than dropping the row, so the
    output stays 1:1 with input and the caller can audit decode coverage.
    ``fake=True`` keeps the deterministic plumbing decoder that also fills
    the pixel stats."""
    if fake:
        feats = batch["payload"].map(
            lambda p: _fake_decode(bytes(p) if p is not None else b"")
        )
    else:
        feats = batch["payload"].map(
            lambda p: parse_image_header(bytes(p) if p is not None else b"") or {}
        )
    out = pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "width": pd.array([f.get("width") for f in feats], dtype="Int32"),
            "height": pd.array([f.get("height") for f in feats], dtype="Int32"),
        }
    )
    out["aspect_ratio"] = out["width"].astype("Float64") / out["height"].astype(
        "Float64"
    )
    out["mean_luma"] = pd.array([f.get("mean_luma") for f in feats], dtype="Float64")
    out["phash"] = pd.array([f.get("phash") for f in feats], dtype="Int64")
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
    clip_ratio). Real path: full WAV (RIFF PCM) decode — metadata from the
    fmt chunk, RMS / clip ratio from the actual samples (``parse_wav``);
    non-WAV payloads get null features. ``fake=True`` keeps the digest-
    derived plumbing decoder for synthetic corpora."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not len(batch):
                continue
            rows = []
            for _, r in batch.iterrows():
                payload = bytes(r["payload"]) if r["payload"] is not None else b""
                if fake:
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
                else:
                    w = parse_wav(payload)
                    rows.append(
                        (
                            r["doc_id"],
                            w["duration_s"] if w else None,
                            w["sample_rate"] if w else None,
                            w["rms"] if w else None,
                            w["clip_ratio"] if w else None,
                        )
                    )
            out = pd.DataFrame(
                rows,
                columns=["doc_id", "duration_s", "sample_rate", "rms", "clip_ratio"],
            )
            out["sample_rate"] = pd.array(out["sample_rate"], dtype="Int32")
            yield out

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
