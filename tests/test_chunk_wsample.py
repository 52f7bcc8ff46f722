"""Tests for document chunking and deterministic weighted sampling."""

import pytest
from pyspark.sql import functions as F

from hfsa_spark.operators.sampling import weighted_sample
from hfsa_spark.operators.text import chunk_documents


def test_chunk_boundaries_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=4, overlap=2).orderBy("chunk_id").collect()
    # stride 2: starts 0,2,4,6,8 → last chunks shrink at the tail
    assert [(r["chunk_id"], r["n_tokens"], r["chunk_text"]) for r in out] == [
        (0, 4, "t0 t1 t2 t3"),
        (1, 4, "t2 t3 t4 t5"),
        (2, 4, "t4 t5 t6 t7"),
        (3, 4, "t6 t7 t8 t9"),
        (4, 2, "t8 t9"),
    ]


def test_chunk_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "only three tokens"), (2, "   "), (3, "x")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_tokens=8, overlap=2).collect()
    got = {(r["doc_id"], r["chunk_id"]): r["n_tokens"] for r in out}
    # doc 2 (whitespace-only) yields no chunks; short docs → single chunk
    assert got == {(1, 0): 3, (3, 0): 1}


def test_chunk_overlap_must_be_smaller(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_weighted_sample_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [(i, float(1 + i % 7)) for i in range(300)], "id long, w double"
    )
    a = {r["id"] for r in weighted_sample(df, "id", "w", k=50).collect()}
    b = {r["id"] for r in weighted_sample(df, "id", "w", k=50).collect()}
    assert a == b and len(a) == 50
    # different salt → different (but still deterministic) sample
    c = {r["id"] for r in weighted_sample(df, "id", "w", k=50, salt="other").collect()}
    assert c != a


def test_weighted_sample_prefers_heavy_rows(spark):
    # 100 heavy rows (w=1000) vs 900 light rows (w=1): a k=100 sample
    # should be dominated by heavy rows (A-ES inclusion ∝ weight).
    rows = [(i, 1000.0) for i in range(100)] + [(i, 1.0) for i in range(100, 1000)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = weighted_sample(df, "id", "w", k=100).collect()
    n_heavy = sum(1 for r in got if r["id"] < 100)
    assert n_heavy > 80


def test_weighted_sample_k_exceeds_rows(spark):
    df = spark.createDataFrame([(1, 2.0), (2, 3.0)], "id long, w double")
    assert weighted_sample(df, "id", "w", k=10).count() == 2
