"""TFRecord sharded sink/source with hand-rolled tf.Example encoding.

TFRecord (public format: tensorflow.org/tutorials/load_data/tfrecord)
is the other de-facto training-corpus interchange format next to
WebDataset: a flat stream of length-prefixed, CRC32C-checksummed
records, each usually a serialized ``tf.train.Example`` protobuf. This
module implements BOTH layers from the public wire specs with zero
TensorFlow/protobuf dependency:

* record framing — ``uint64 length (LE) · masked crc32c(length) ·
  data · masked crc32c(data)``, mask = ``rotr15(crc) + 0xa282ead8``
  (the spec from tensorflow/core/lib/io/record_writer.h);
* ``tf.Example`` proto wire bytes — ``Example{1: Features{1: map<string,
  Feature>}}`` with ``Feature`` oneof ``{1: BytesList, 2: FloatList,
  3: Int64List}``, numeric lists packed, map keys emitted in sorted
  order so a rewrite of the same rows is byte-identical.

Spark shape mirrors :mod:`hfsa_spark.sinks.webdataset`: writing keys the
one payload shuffle on a deterministic shard id and writes each shard in
exactly one task (groupBy → applyInPandas); reading is one task per
shard with zero shuffles, CRCs verified on every record.

Scale notes: shards are the parallelism unit (keep them 100 MB–1 GB, the
standard practice); the encode/decode is pure per-row byte work inside
Arrow-batched tasks — map-only, no driver involvement beyond the shard
manifest. No counterpart in the reference (beyond-reference sink family
with webdataset/jsonl).
"""

from __future__ import annotations

import gzip
import os
import struct

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------- crc32c

_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ (0x82F63B78 if _c & 1 else 0)  # reflected Castagnoli
    _CRC_TABLE.append(_c)

# slicing-by-8 tables (Kounavis & Berry, "Novel Table Lookup-Based
# Algorithms for High-Performance CRC Generation", public method): T[0]
# is the byte-at-a-time table; T[k][v] advances v's contribution k more
# bytes through the register, so one step folds 8 input bytes at once.
_T8 = np.zeros((8, 256), dtype=np.uint32)
_T8[0] = np.array(_CRC_TABLE, dtype=np.uint32)
for _k in range(1, 8):
    _prev = _T8[_k - 1]
    _T8[_k] = _T8[0][_prev & 0xFF] ^ (_prev >> np.uint32(8))


def crc32c(data: bytes) -> int:
    """CRC-32C (Castagnoli), the checksum TFRecord framing uses.
    Scalar form (single buffer); the batch paths use :func:`crc32c_many`,
    which this stays bit-identical to (RFC 3720 vectors pin both)."""
    crc = 0xFFFFFFFF
    tab = _CRC_TABLE
    for b in data:
        crc = (crc >> 8) ^ tab[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def crc32c_many(bufs: list[bytes]) -> np.ndarray:
    """CRC-32C of MANY buffers at once — vectorized ACROSS records.

    A single CRC is a serial byte recurrence, so the per-buffer loop
    can't vectorize; but a shard checksums thousands of records, and the
    recurrences are independent. This runs the slicing-by-8 state machine
    on a uint32 VECTOR of states: each step folds the next 8 bytes of
    every active record via eight table gathers + xors (numpy fancy
    indexing), then the ≤7 tail bytes byte-at-a-time, still vectorized.
    Records are length-sorted and processed in ≤32 MB padded groups so
    padding waste and peak memory stay bounded. ~40× the scalar loop at
    tfrecord-typical record sizes — the difference between a CPU-bound
    sink and a disk-bound one at 100 TB (PERFORMANCE.md round-7 row).
    """
    n = len(bufs)
    out = np.zeros(n, dtype=np.uint32)
    if not n:
        return out
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n)
    order = np.argsort(lens, kind="stable")
    budget = 32 << 20
    start = 0
    while start < n:
        # grow the group while padded size stays within budget
        end = start + 1
        maxlen = int(lens[order[start]])
        while end < n:
            cand = max(maxlen, int(lens[order[end]]))
            if cand * (end - start + 1) > budget and end > start:
                break
            maxlen = cand
            end += 1
        idx = order[start:end]
        g = len(idx)
        glens = lens[idx]
        width = ((maxlen + 7) // 8) * 8
        arr = np.zeros((g, max(width, 8)), dtype=np.uint8)
        for row, i in enumerate(idx):
            b = bufs[i]
            if b:
                arr[row, : len(b)] = np.frombuffer(b, dtype=np.uint8)
        crc = np.full(g, 0xFFFFFFFF, dtype=np.uint32)
        nwords = glens // 8
        for j in range(int(nwords.max()) if g else 0):
            active = nwords > j
            c = arr[:, j * 8 : j * 8 + 8].astype(np.uint32)
            x = crc ^ (c[:, 0] | (c[:, 1] << np.uint32(8))
                       | (c[:, 2] << np.uint32(16)) | (c[:, 3] << np.uint32(24)))
            nxt = (
                _T8[7][x & 0xFF]
                ^ _T8[6][(x >> np.uint32(8)) & 0xFF]
                ^ _T8[5][(x >> np.uint32(16)) & 0xFF]
                ^ _T8[4][x >> np.uint32(24)]
                ^ _T8[3][c[:, 4]]
                ^ _T8[2][c[:, 5]]
                ^ _T8[1][c[:, 6]]
                ^ _T8[0][c[:, 7]]
            )
            crc = np.where(active, nxt, crc)
        # tail: up to 7 trailing bytes, byte-at-a-time but still vectorized
        rows = np.arange(g)
        for t in range(7):
            pos = nwords * 8 + t
            active = pos < glens
            byte = arr[rows, np.minimum(pos, arr.shape[1] - 1)].astype(
                np.uint32
            )
            nxt = (crc >> np.uint32(8)) ^ _T8[0][(crc ^ byte) & 0xFF]
            crc = np.where(active, nxt, crc)
        out[idx] = crc ^ np.uint32(0xFFFFFFFF)
        start = end
    return out


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _masked_crc_many(crcs: np.ndarray) -> np.ndarray:
    return (
        ((crcs >> np.uint32(15)) | (crcs << np.uint32(17)))
        + np.uint32(0xA282EAD8)
    )


# ------------------------------------------------------------ proto wire

_BYTE = [bytes([i]) for i in range(256)]  # 1-byte cache: hot in _ld/_varint


def _varint(n: int) -> bytes:
    """Unsigned LEB128. int64 values are encoded as their 64-bit two's
    complement (protobuf's int64 rule: negatives take 10 bytes)."""
    n &= 0xFFFFFFFFFFFFFFFF
    if n < 0x80:  # the common case: small lengths/values, one byte
        return _BYTE[n]
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _ld(tag_byte: int, payload: bytes) -> bytes:
    """One length-delimited field: tag · varint(len) · payload."""
    ln = len(payload)
    if ln < 0x80:
        return _BYTE[tag_byte] + _BYTE[ln] + payload
    return _BYTE[tag_byte] + _varint(ln) + payload


def _feature(kind: str, values) -> bytes:
    """Encode one ``Feature`` message."""
    if kind == "bytes":
        inner = b"".join(_ld(0x0A, v) for v in values)  # BytesList.value = 1
        return _ld(0x0A, inner)  # Feature.bytes_list = 1
    if kind == "float":
        inner = _ld(0x0A, struct.pack(f"<{len(values)}f", *values))  # packed
        return _ld(0x12, inner)  # Feature.float_list = 2
    if kind == "int64":
        inner = _ld(0x0A, b"".join(_varint(int(v)) for v in values))  # packed
        return _ld(0x1A, inner)  # Feature.int64_list = 3
    raise ValueError(f"unknown feature kind {kind!r}")


def encode_example(feats: dict[str, tuple[str, list]]) -> bytes:
    """``{name: (kind, values)}`` → serialized ``tf.Example`` bytes.

    Keys are emitted sorted (protobuf map order is unspecified; pinning
    it makes rewrites byte-identical)."""
    entries = b""
    for name in sorted(feats):
        kind, values = feats[name]
        entry = _ld(0x0A, name.encode()) + _ld(0x12, _feature(kind, values))
        entries += _ld(0x0A, entry)  # Features.feature map entry
    return _ld(0x0A, entries)  # Example.features = 1


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


def _to_i64(n: int) -> int:
    return n - (1 << 64) if n >= (1 << 63) else n


def decode_example(data: bytes) -> dict[str, tuple[str, list]]:
    """Inverse of :func:`encode_example` (accepts unpacked int64/float
    repeats too, which other writers may emit)."""

    def fields(buf: bytes):
        pos = 0
        while pos < len(buf):
            key, pos = _read_varint(buf, pos)
            num, wire = key >> 3, key & 7
            if wire == 2:
                ln, pos = _read_varint(buf, pos)
                yield num, buf[pos : pos + ln]
                pos += ln
            elif wire == 0:
                v, pos = _read_varint(buf, pos)
                yield num, v
            elif wire == 5:
                yield num, buf[pos : pos + 4]
                pos += 4
            else:  # pragma: no cover - wire types tf.Example never uses
                raise ValueError(f"unsupported wire type {wire}")

    out: dict[str, tuple[str, list]] = {}
    for num, features_buf in fields(data):
        if num != 1:
            continue
        for enum, entry in fields(features_buf):
            if enum != 1:
                continue
            name, feat = "", b""
            for fnum, val in fields(entry):
                if fnum == 1:
                    name = val.decode()
                elif fnum == 2:
                    feat = val
            for knum, kval in fields(feat):
                if knum == 1:  # BytesList
                    vals = [v for n2, v in fields(kval) if n2 == 1]
                    out[name] = ("bytes", vals)
                elif knum == 2:  # FloatList
                    vals: list = []
                    for n2, v in fields(kval):
                        if n2 != 1:
                            continue
                        if isinstance(v, bytes) and len(v) != 4:
                            vals.extend(
                                struct.unpack(f"<{len(v) // 4}f", v)
                            )  # packed
                        elif isinstance(v, bytes):
                            vals.append(struct.unpack("<f", v)[0])
                        else:  # pragma: no cover
                            raise ValueError("float wire mismatch")
                    out[name] = ("float", vals)
                elif knum == 3:  # Int64List
                    vals = []
                    for n2, v in fields(kval):
                        if n2 != 1:
                            continue
                        if isinstance(v, bytes):  # packed
                            p = 0
                            while p < len(v):
                                x, p = _read_varint(v, p)
                                vals.append(_to_i64(x))
                        else:
                            vals.append(_to_i64(v))
                    out[name] = ("int64", vals)
    return out


# --------------------------------------------------------------- framing

def write_record(fh, data: bytes) -> None:
    """Frame ONE record (scalar path; shard writes use
    :func:`frame_records`, which is byte-identical)."""
    ln = struct.pack("<Q", len(data))
    fh.write(ln)
    fh.write(struct.pack("<I", _masked_crc(ln)))
    fh.write(data)
    fh.write(struct.pack("<I", _masked_crc(data)))


def frame_records(datas: list[bytes]) -> bytes:
    """Frame a record batch into one buffer — both CRC columns computed
    in two vectorized :func:`crc32c_many` passes instead of a per-byte
    Python loop per record. Byte-identical to repeated
    :func:`write_record` calls (pinned in tests)."""
    lens = [struct.pack("<Q", len(d)) for d in datas]
    lc = _masked_crc_many(crc32c_many(lens)).astype("<u4").tobytes()
    dc = _masked_crc_many(crc32c_many(datas)).astype("<u4").tobytes()
    parts = []
    for i, (ln, d) in enumerate(zip(lens, datas)):
        parts.append(ln)
        parts.append(lc[i * 4 : i * 4 + 4])
        parts.append(d)
        parts.append(dc[i * 4 : i * 4 + 4])
    return b"".join(parts)


def iter_records(buf: bytes, _chunk: int = 1024):
    """Yield record payloads, verifying both CRCs (raises ValueError).

    Chunked: frames are located and validated ``_chunk`` at a time —
    both CRC columns verify in two vectorized :func:`crc32c_many`
    passes per chunk, then the chunk's payloads yield before the next
    chunk materializes. This keeps extra memory bounded by the chunk
    (not O(file), the pre-r8 behavior) AND preserves the per-record
    scalar error order the docstring promises: a structural problem
    found while LOCATING frame k (truncation, bad length CRC) is
    raised only after every earlier frame in flight has CRC-validated
    and yielded, exactly as a record-at-a-time reader would report it."""
    pos = 0
    n = len(buf)
    while pos < n:
        offs: list[int] = []
        ln_bufs: list[bytes] = []
        datas: list[bytes] = []
        pending: ValueError | None = None
        while pos < n and len(datas) < _chunk:
            if n - pos < 12:
                pending = ValueError(
                    f"tfrecord truncated header at offset {pos}"
                )
                break
            ln_bytes = buf[pos : pos + 8]
            (ln,) = struct.unpack("<Q", ln_bytes)
            if n - pos < 16 + ln:
                # an unverified length could be garbage from corruption;
                # if its CRC fails, report THAT (the root cause), not
                # truncation
                if struct.unpack("<I", buf[pos + 8 : pos + 12])[
                    0
                ] != _masked_crc(ln_bytes):
                    pending = ValueError(
                        f"tfrecord length CRC mismatch at offset {pos}"
                    )
                else:
                    pending = ValueError(
                        f"tfrecord truncated record at offset {pos}"
                    )
                break
            offs.append(pos)
            ln_bufs.append(ln_bytes)
            datas.append(buf[pos + 12 : pos + 12 + ln])
            pos += 16 + ln
        if offs:
            len_ok = _masked_crc_many(crc32c_many(ln_bufs)) == np.frombuffer(
                b"".join(buf[o + 8 : o + 12] for o in offs), dtype="<u4"
            )
            data_ok = _masked_crc_many(crc32c_many(datas)) == np.frombuffer(
                b"".join(
                    buf[o + 12 + len(d) : o + 16 + len(d)]
                    for o, d in zip(offs, datas)
                ),
                dtype="<u4",
            )
            for i, o in enumerate(offs):  # first bad frame, scalar order
                if not len_ok[i]:
                    raise ValueError(
                        f"tfrecord length CRC mismatch at offset {o}"
                    )
                if not data_ok[i]:
                    raise ValueError(
                        f"tfrecord data CRC mismatch at offset {o}"
                    )
        yield from datas
        if pending is not None:
            raise pending


# ------------------------------------------------------------ spark side

def _is_null(v) -> bool:
    return v is None or (isinstance(v, float) and v != v)  # NaN from Arrow


def _row_features(r, feature_spec: dict[str, str]) -> dict[str, tuple[str, list]]:
    """Null policy, uniform and explicit: a NULL ``bytes`` value writes
    an empty byte string (tar/wds convention, round-trips as b''); a
    NULL numeric value has no representable tf.Example encoding that
    round-trips, so it raises a clear error naming the column instead of
    letting ``int(nan)`` blow up the task opaquely."""
    feats = {}
    for col, kind in feature_spec.items():
        v = r[col]
        if kind == "bytes":
            if _is_null(v):
                raw = b""
            else:
                raw = v.encode() if isinstance(v, str) else bytes(v)
            feats[col] = ("bytes", [raw])
            continue
        if _is_null(v):
            raise ValueError(
                f"tfrecord: NULL value in {kind!r} column {col!r} "
                "(tf.Example has no numeric null; filter or fill first)"
            )
        if kind == "int64":
            feats[col] = ("int64", [int(v)])
        elif kind == "int64_list":
            feats[col] = ("int64", [int(x) for x in v])
        elif kind == "float_list":
            feats[col] = ("float", [float(x) for x in v])
        else:
            raise ValueError(f"unknown feature spec kind {kind!r}")
    return feats


def _encode_batch(pdf: pd.DataFrame, feature_spec: dict[str, str]) -> list[bytes]:
    """Encode a shard's rows to tf.Example payloads COLUMNARLY: one
    values-array per column pulled once, rows assembled by zip — no
    ``iterrows`` Series construction per record (the other half of the
    round-7 throughput fix next to :func:`crc32c_many`). Same null
    policy and byte output as :func:`_row_features` row-at-a-time."""
    cols = list(feature_spec)
    arrays = [pdf[c].to_numpy() for c in cols]
    out: list[bytes] = []
    for vals in zip(*arrays):
        out.append(
            encode_example(_row_features(dict(zip(cols, vals)), feature_spec))
        )
    return out


def write_tfrecord_shards(
    df: DataFrame,
    out_dir: str,
    feature_spec: dict[str, str],
    n_shards: int = 8,
    id_col: str = "doc_id",
    compression: str = "",
) -> list[str]:
    """Write rows as ``part-{i:05d}.tfrecord[.gz]`` shards.

    ``feature_spec`` maps column → ``'int64' | 'int64_list' | 'bytes' |
    'float_list'`` (``bytes`` accepts string columns, UTF-8 encoded).
    Sharding is ``pmod(id_col, n_shards)``; members are ordered by
    ``id_col`` within a shard, so a rewrite is byte-identical (gzip
    mtime pinned to 0 for the same reason). ``compression='gzip'``
    matches TFRecordDataset(compression_type='GZIP'). Returns paths.
    """
    if compression not in ("", "gzip"):
        raise ValueError(f"unsupported compression {compression!r}")
    os.makedirs(out_dir, exist_ok=True)
    cols = list(dict.fromkeys([id_col, *feature_spec]))
    suffix = ".tfrecord.gz" if compression else ".tfrecord"

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["__shard"].iloc[0])
        path = os.path.join(out_dir, f"part-{shard:05d}{suffix}")
        pdf = pdf.sort_values(id_col)
        datas = _encode_batch(pdf, feature_spec)
        framed = frame_records(datas)  # both CRC columns vectorized
        opener = (
            (lambda p: gzip.GzipFile(p, "wb", mtime=0))
            if compression
            else (lambda p: open(p, "wb"))
        )
        with opener(path) as fh:
            fh.write(framed)
        return pd.DataFrame(
            {"shard": [shard], "n_records": [len(pdf)],
             "n_bytes": [len(framed)], "path": [path]}
        )

    # pmod keeps negative ids in [0, n_shards); a NULL id routes to shard
    # 0 so the row reaches _row_features, whose error names the column —
    # instead of an opaque NaN crash on the shard key itself
    manifest = (
        df.select(*cols)
        .withColumn(
            "__shard",
            F.coalesce(F.pmod(F.col(id_col), F.lit(n_shards)), F.lit(0)).cast(
                "int"
            ),
        )
        .groupBy("__shard")
        .applyInPandas(
            write_shard,
            schema="shard int, n_records long, n_bytes long, path string",
        )
        .collect()
    )
    return [r["path"] for r in sorted(manifest, key=lambda r: r["shard"])]


def read_tfrecord_shards(
    spark: SparkSession,
    in_dir: str,
    feature_spec: dict[str, str],
) -> DataFrame:
    """Read a :func:`write_tfrecord_shards` directory back — one task per
    shard, zero shuffles, every record CRC-verified. Columns follow
    ``feature_spec``: int64 → bigint, bytes → binary, int64_list →
    array<bigint>, float_list → array<float>."""
    paths = sorted(
        os.path.join(in_dir, f)
        for f in os.listdir(in_dir)
        if f.endswith(".tfrecord") or f.endswith(".tfrecord.gz")
    )
    pdf = spark.createDataFrame([(p,) for p in paths], "path string").repartition(
        max(len(paths), 1)
    )
    spec = dict(feature_spec)

    def read_shard(batches):
        for batch in batches:
            for path in batch["path"]:
                if path.endswith(".gz"):
                    with gzip.open(path, "rb") as fh:
                        buf = fh.read()
                else:
                    with open(path, "rb") as fh:
                        buf = fh.read()
                rows: dict[str, list] = {c: [] for c in spec}
                for data in iter_records(buf):
                    feats = decode_example(data)
                    for col, kind in spec.items():
                        _, vals = feats.get(col, (None, []))
                        if kind == "int64":
                            rows[col].append(vals[0] if vals else None)
                        elif kind == "bytes":
                            rows[col].append(vals[0] if vals else b"")
                        else:
                            rows[col].append(list(vals))
                yield pd.DataFrame(rows)

    types = {
        "int64": "bigint",
        "bytes": "binary",
        "int64_list": "array<bigint>",
        "float_list": "array<float>",
    }
    schema = ", ".join(f"{c} {types[k]}" for c, k in spec.items())
    return pdf.mapInPandas(read_shard, schema=schema)
