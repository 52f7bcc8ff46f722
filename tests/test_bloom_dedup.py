"""Bloom-prefilter dedup: no false negatives, measured FPR vs theory,
exact equivalence with the plain anti-join path, prebuilt-filter reuse."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hfsa_spark.operators.dedup import (
    bloom_build,
    bloom_dedup,
    bloom_might_contain,
    incremental_dedup,
    normalize_text,
)


def _keys(spark, prefix, n):
    return spark.range(n).select(F.concat(F.lit(prefix), F.col("id")).alias("v"))


def _test(spark, bf, df):
    return df.crossJoin(F.broadcast(bf.to_row_df(spark))).filter(
        bloom_might_contain(bf, "v")
    )


def test_no_false_negatives(spark):
    keys = _keys(spark, "k", 2000)
    bf = bloom_build(keys, "v", num_bits=1 << 14, num_hashes=4)
    assert _test(spark, bf, keys).count() == 2000


def test_fpr_near_theoretical(spark):
    n, m, k = 1000, 1 << 14, 4
    bf = bloom_build(_keys(spark, "k", n), "v", num_bits=m, num_hashes=k)
    theo = (1 - math.exp(-k * n / m)) ** k
    fp = _test(spark, bf, _keys(spark, "x", 10000)).count() / 10000
    assert fp <= 3 * theo + 0.003  # loose: one-sided sampling slack


def test_bloom_dedup_equals_exact_anti_join(spark):
    docs = spark.createDataFrame(
        [(i, f"document body {i % 7} with shared tail") for i in range(50)],
        "doc_id bigint, text string",
    )
    corpus = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.md5(normalize_text("text")).alias("digest")
    )
    a = sorted(r.doc_id for r in bloom_dedup(docs, corpus, "doc_id", "text").collect())
    b = sorted(
        r.doc_id for r in incremental_dedup(docs, corpus, "doc_id", "text").collect()
    )
    assert a == b


def test_prebuilt_filter_reused_across_batches(spark):
    docs = spark.createDataFrame(
        [(i, f"text number {i}") for i in range(40)], "doc_id bigint, text string"
    )
    corpus = docs.filter(F.col("doc_id") < 20).select(
        F.md5(normalize_text("text")).alias("digest")
    )
    bf = bloom_build(corpus, "digest", num_bits=1 << 12, num_hashes=3)
    out = bloom_dedup(docs, corpus, "doc_id", "text", bloom=bf)
    assert sorted(r.doc_id for r in out.collect()) == list(range(20, 40))


def test_num_bits_must_be_word_aligned(spark):
    with pytest.raises(ValueError):
        bloom_build(_keys(spark, "k", 10), "v", num_bits=100)
