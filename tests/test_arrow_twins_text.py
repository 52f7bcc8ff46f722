"""Equivalence tests for the Arrow kernel twins of the token-hash /
char-level scorers (hashed_linear_score, char_entropy_profile,
bigram_logprob_score, count_min_estimate): the twin must produce the
IDENTICAL rows as the expression path — both on the driver testdata
documents (the gate corpus) and on synthetic edge cases (empty text,
single token, heavy repetition, ASCII whitespace variants). The gate
keeps the expression paths for oracle bit-exactness; these twins are the
throughput paths, so any divergence is a correctness bug, not noise."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def docs(spark):
    if os.path.isdir(f"{SF_DIR}/documents.parquet"):
        real = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "text"
        )
    else:
        real = None
    edge = spark.createDataFrame(
        [
            (100001, ""),
            (100002, "solo"),
            (100003, "a a a a a a a a"),
            (100004, "  leading  and \t tab\nnewline\x0bvt\ffeed\rcr  "),
            (100005, "MiXeD CaSe ToKeNs MIXED mixed"),
            (100006, None),
        ],
        "doc_id long, text string",
    )
    return real.unionByName(edge) if real is not None else edge


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_hashed_linear_score_arrow_equivalence(docs):
    from hfsa_spark.operators.text import (
        hashed_linear_score,
        hashed_linear_score_arrow,
    )

    a = _rows(hashed_linear_score(docs))
    b = _rows(hashed_linear_score_arrow(docs))
    assert a == b


def test_char_entropy_arrow_equivalence(docs):
    from hfsa_spark.operators.text import (
        char_entropy_profile,
        char_entropy_profile_arrow,
    )

    a = _rows(char_entropy_profile(docs))
    b = _rows(char_entropy_profile_arrow(docs))
    assert a == b


def test_bigram_logprob_arrow_equivalence(docs):
    from hfsa_spark.operators.text import (
        bigram_logprob_score,
        bigram_logprob_score_arrow,
    )

    a = _rows(bigram_logprob_score(docs))
    b = _rows(bigram_logprob_score_arrow(docs))
    assert a == b


def test_bigram_logprob_collision_fallback(docs):
    """r13: the arrow twin joins on a 64-bit content hash of the bigram
    (kernel-computed, no strings on the doc rows), with an exact min!=max
    collision detector and an expression-twin fallback. Force EVERY
    bigram onto one hash value: the fallback must engage and still
    produce rows identical to the expression path. monkeypatch cannot be
    used — the kernel closure is pickled to executors, so the patched
    module global must be visible to cloudpickle at closure-capture time;
    patch + restore around the call instead."""
    import numpy as np

    import hfsa_spark.operators.text as textmod

    orig = textmod._py_bg_hash
    textmod._py_bg_hash = lambda values: np.ones(len(values), dtype="int64")
    try:
        a = _rows(textmod.bigram_logprob_score(docs))
        b = _rows(textmod.bigram_logprob_score_arrow(docs))
    finally:
        textmod._py_bg_hash = orig
    assert a == b


def test_count_min_arrow_equivalence(docs):
    from hfsa_spark.operators.sketches import count_min_estimate
    from hfsa_spark.operators.text import tokens

    toks = docs.select(F.explode(tokens("text")).alias("tok"))
    probes = ["table", "spark", "a", "zzz_absent", "query"]
    a = _rows(count_min_estimate(toks, "tok", probes, kernel="expr"))
    b = _rows(count_min_estimate(toks, "tok", probes, kernel="arrow"))
    assert a == b
    # the one-sided CM guarantee must hold on the arrow path too
    assert all(r[3] >= 0 for r in b)
