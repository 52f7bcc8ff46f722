"""TFRecord sink/source: wire-format goldens (CRC32C, varint, proto),
exact round-trip, CRC corruption detection, byte-determinism."""

from __future__ import annotations

import hashlib
import os
import struct

import pytest

from hfsa_spark.sinks.tfrecord import (
    crc32c,
    decode_example,
    encode_example,
    iter_records,
    read_tfrecord_shards,
    write_record,
    write_tfrecord_shards,
)


def test_crc32c_known_vectors():
    # RFC 3720 appendix B.4 test vectors for CRC-32C
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43
    assert crc32c(bytes(range(32))) == 0x46DD794E
    # classic check value
    assert crc32c(b"123456789") == 0xE3069283


def test_example_wire_golden():
    # hand-assembled tf.Example{features{feature{"id": int64_list[7]}}}
    int64_list = b"\x0a\x01\x07"  # field1 packed, len1, varint(7)
    feature = b"\x1a" + bytes([len(int64_list)]) + int64_list
    entry = b"\x0a\x02id" + b"\x12" + bytes([len(feature)]) + feature
    features = b"\x0a" + bytes([len(entry)]) + entry
    example = b"\x0a" + bytes([len(features)]) + features
    assert encode_example({"id": ("int64", [7])}) == example


def test_example_roundtrip_types():
    feats = {
        "ids": ("int64", [0, 1, -1, 2**62, -(2**62)]),
        "payload": ("bytes", [b"\x00\xffabc", b""]),
        "vec": ("float", [0.5, -2.25, 0.0]),
    }
    back = decode_example(encode_example(feats))
    assert back["ids"] == ("int64", [0, 1, -1, 2**62, -(2**62)])
    assert back["payload"] == ("bytes", [b"\x00\xffabc", b""])
    assert back["vec"][0] == "float"
    assert back["vec"][1] == [0.5, -2.25, 0.0]  # dyadic — exact in f32


def test_framing_roundtrip_and_crc_detection(tmp_path):
    p = tmp_path / "r.tfrecord"
    with open(p, "wb") as fh:
        write_record(fh, b"hello")
        write_record(fh, b"")
        write_record(fh, b"x" * 1000)
    buf = open(p, "rb").read()
    assert list(iter_records(buf)) == [b"hello", b"", b"x" * 1000]
    # flip one payload byte → data CRC must fail
    bad = bytearray(buf)
    bad[12] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        list(iter_records(bytes(bad)))
    # corrupt the length prefix → length CRC must fail
    bad2 = bytearray(buf)
    bad2[0] ^= 0x01
    with pytest.raises(ValueError, match="length CRC"):
        list(iter_records(bytes(bad2)))


def test_iter_records_chunked_streaming_and_error_order(tmp_path):
    """r8 advisor fix: validation is chunked (bounded memory), and a
    corrupt EARLY record reports before a truncation LATER in the file
    — the order a record-at-a-time scalar reader would produce."""
    import io

    fh = io.BytesIO()
    payloads = [f"rec{i}".encode() for i in range(10)]
    for p in payloads:
        write_record(fh, p)
    buf = fh.getvalue()

    # multi-chunk traversal yields everything, in order
    assert list(iter_records(buf, _chunk=3)) == payloads

    # early data-CRC corruption + late truncation: CRC wins (root cause)
    bad = bytearray(buf[:-3])  # truncate the tail record
    bad[12] ^= 0x01  # and corrupt record 0's payload
    with pytest.raises(ValueError, match="data CRC mismatch at offset 0"):
        list(iter_records(bytes(bad), _chunk=3))

    # truncation alone: every intact earlier record yields first, then
    # the truncation raises (streaming consumers keep the good prefix)
    got = []
    with pytest.raises(ValueError, match="truncated"):
        for r in iter_records(buf[:-3], _chunk=3):
            got.append(r)
    assert got == payloads[:-1]


def test_tfrecord_shards_roundtrip(spark, tmp_path):
    rows = [
        (i, f"doc {i} é", [float(i), i / 2.0], [i, -i]) for i in range(25)
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, vec array<double>, ids array<bigint>"
    )
    spec = {
        "doc_id": "int64",
        "text": "bytes",
        "vec": "float_list",
        "ids": "int64_list",
    }
    out = str(tmp_path / "tfr")
    paths = write_tfrecord_shards(df, out, spec, n_shards=4)
    assert [os.path.basename(p) for p in paths] == [
        f"part-{i:05d}.tfrecord" for i in range(4)
    ]

    back = read_tfrecord_shards(spark, out, spec).collect()
    got = {r["doc_id"]: r for r in back}
    assert len(got) == 25
    for i in range(25):
        assert bytes(got[i]["text"]) == f"doc {i} é".encode()
        assert got[i]["vec"] == [float(i), i / 2.0]  # halves exact in f32
        assert got[i]["ids"] == [i, -i]

    # deterministic rewrite → byte-identical shards
    h1 = [hashlib.md5(open(p, "rb").read()).hexdigest() for p in paths]
    out2 = str(tmp_path / "tfr2")
    paths2 = write_tfrecord_shards(df, out2, spec, n_shards=4)
    h2 = [hashlib.md5(open(p, "rb").read()).hexdigest() for p in paths2]
    assert h1 == h2


def test_tfrecord_unpacked_int64_accepted():
    # other writers may emit repeated int64 UNPACKED (wire type 0 repeats)
    unpacked = b"\x08\x07\x08\x2a"  # field1 varint 7, field1 varint 42
    feature = b"\x1a" + bytes([len(unpacked)]) + unpacked
    entry = b"\x0a\x01n" + b"\x12" + bytes([len(feature)]) + feature
    features = b"\x0a" + bytes([len(entry)]) + entry
    example = b"\x0a" + bytes([len(features)]) + features
    assert decode_example(example)["n"] == ("int64", [7, 42])


def test_crc32c_many_matches_scalar():
    """The vectorized across-records CRC must be bit-identical to the
    per-byte scalar on every length class (word-multiple, tail, empty)."""
    import random

    import numpy as np

    from hfsa_spark.sinks.tfrecord import crc32c_many

    # RFC 3720 vectors through the batch path too
    got = crc32c_many([b"", b"\x00" * 32, b"\xff" * 32, bytes(range(32)),
                       b"123456789"])
    assert list(got) == [0x00000000, 0x8A9136AA, 0x62A8AB43, 0x46DD794E,
                         0xE3069283]

    random.seed(11)
    bufs = [
        bytes(random.randrange(256) for _ in range(ln))
        for ln in (0, 1, 7, 8, 9, 15, 16, 17, 63, 64, 65, 255, 1000, 4096)
        for _ in range(3)
    ]
    random.shuffle(bufs)  # exercise the length-sort grouping
    assert list(crc32c_many(bufs)) == [crc32c(b) for b in bufs]
    assert crc32c_many([]).shape == (0,)
    assert crc32c_many([]).dtype == np.uint32


def test_frame_records_byte_identical_to_write_record():
    import io

    from hfsa_spark.sinks.tfrecord import frame_records

    datas = [b"hello", b"", b"x" * 1000, bytes(range(256)) * 3]
    fh = io.BytesIO()
    for d in datas:
        write_record(fh, d)
    assert frame_records(datas) == fh.getvalue()
    assert frame_records([]) == b""


def test_masked_crc_matches_spec():
    # mask(crc) = rotr15(crc) + 0xa282ead8 (record_writer.h); verify the
    # framing of a known record against an independently computed value
    data = b"hello"
    ln = struct.pack("<Q", 5)
    c = crc32c(ln)
    expected_mask = (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF
    import io

    fh = io.BytesIO()
    write_record(fh, data)
    buf = fh.getvalue()
    assert struct.unpack("<I", buf[8:12])[0] == expected_mask


def test_null_policy(spark, tmp_path):
    import pytest as _pytest

    # null bytes → empty string, round-trips
    df = spark.createDataFrame([(1, None)], "doc_id bigint, text string")
    out = str(tmp_path / "nulls")
    write_tfrecord_shards(df, out, {"doc_id": "int64", "text": "bytes"}, n_shards=1)
    got = read_tfrecord_shards(
        spark, out, {"doc_id": "int64", "text": "bytes"}
    ).collect()
    assert bytes(got[0]["text"]) == b""

    # null numeric → clear error, not an opaque task crash
    df2 = spark.createDataFrame([(None, "x")], "doc_id bigint, text string")
    with _pytest.raises(Exception, match="NULL value in 'int64'"):
        write_tfrecord_shards(
            df2, str(tmp_path / "bad"), {"doc_id": "int64", "text": "bytes"},
            n_shards=1,
        )


def test_truncated_file_raises_valueerror(tmp_path):
    import io

    fh = io.BytesIO()
    write_record(fh, b"hello")
    buf = fh.getvalue()
    with pytest.raises(ValueError, match="truncated record"):
        list(iter_records(buf[:-3]))  # lost the tail mid-record
    with pytest.raises(ValueError, match="truncated header"):
        list(iter_records(buf + buf[:5]))  # partial next header


def test_gzip_shards_roundtrip_and_determinism(spark, tmp_path):
    import hashlib as _hashlib

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(10)], "doc_id bigint, text string"
    )
    spec = {"doc_id": "int64", "text": "bytes"}
    out = str(tmp_path / "gz")
    paths = write_tfrecord_shards(df, out, spec, n_shards=2, compression="gzip")
    assert all(p.endswith(".tfrecord.gz") for p in paths)
    got = {
        r["doc_id"]: bytes(r["text"])
        for r in read_tfrecord_shards(spark, out, spec).collect()
    }
    assert got == {i: f"doc {i}".encode() for i in range(10)}
    # pinned gzip mtime → byte-identical rewrite
    h1 = [_hashlib.md5(open(p, "rb").read()).hexdigest() for p in paths]
    out2 = str(tmp_path / "gz2")
    p2 = write_tfrecord_shards(df, out2, spec, n_shards=2, compression="gzip")
    assert h1 == [_hashlib.md5(open(p, "rb").read()).hexdigest() for p in p2]
