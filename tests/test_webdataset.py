"""WebDataset tar sharding: exact round-trip, deterministic bytes,
payload+metadata pairing."""

from __future__ import annotations

import hashlib
import json
import os


def test_wds_roundtrip_and_determinism(spark, tmp_path):
    from hfsa_spark.sinks.webdataset import read_wds_shards, write_wds_shards

    rows = [(i, bytes([i % 256]) * (i + 1), f"lang{i % 3}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary, lang string")
    out = str(tmp_path / "wds")
    paths = write_wds_shards(df, out, n_shards=4, meta_cols=("lang",))
    assert [os.path.basename(p) for p in paths] == [
        f"shard-{i:05d}.tar" for i in range(4)
    ]

    back = read_wds_shards(spark, out, with_meta=True).collect()
    got = {r["doc_id"]: (bytes(r["payload"]), json.loads(r["meta"])) for r in back}
    assert len(got) == 20
    for i in range(20):
        assert got[i][0] == bytes([i % 256]) * (i + 1)
        assert got[i][1] == {"lang": f"lang{i % 3}"}

    # rewrite of identical data → byte-identical shards (pinned mtimes,
    # doc_id member order)
    h1 = [hashlib.md5(open(p, "rb").read()).hexdigest() for p in paths]
    out2 = str(tmp_path / "wds2")
    paths2 = write_wds_shards(df, out2, n_shards=4, meta_cols=("lang",))
    h2 = [hashlib.md5(open(p, "rb").read()).hexdigest() for p in paths2]
    assert h1 == h2


def test_wds_payload_only(spark, tmp_path):
    from hfsa_spark.sinks.webdataset import read_wds_shards, write_wds_shards

    df = spark.createDataFrame(
        [(1, b"abc"), (2, None)], "doc_id bigint, payload binary"
    )
    out = str(tmp_path / "wds")
    write_wds_shards(df, out, n_shards=1)
    got = {r["doc_id"]: bytes(r["payload"])
           for r in read_wds_shards(spark, out).collect()}
    assert got == {1: b"abc", 2: b""}  # null payload → empty member
