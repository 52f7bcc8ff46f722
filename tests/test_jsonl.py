"""JSONL shard write/read: exact round-trip, shard naming, schema path."""

from __future__ import annotations

import os


def test_jsonl_roundtrip(spark, tmp_path):
    from hfsa_spark.sinks.jsonl import read_jsonl, write_jsonl_shards

    rows = [(i, f"text {i}", f"lang{i % 3}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    out = str(tmp_path / "jsonl")
    paths = write_jsonl_shards(df, out, n_shards=4)
    assert [os.path.basename(p) for p in paths] == [
        f"part-{i:05d}.jsonl" for i in range(4)
    ]
    with open(paths[0]) as fh:
        first = fh.readline()
    assert first.startswith("{") and '"doc_id"' in first

    back = read_jsonl(spark, out, schema="doc_id bigint, text string, lang string")
    got = {r["doc_id"]: (r["text"], r["lang"]) for r in back.collect()}
    assert got == {i: (f"text {i}", f"lang{i % 3}") for i in range(40)}
