"""Determinism under partitioning — the Spark analog of the reference's
serial-vs-parallel visitor equivalence (SURVEY.md §5): selected operators
must produce IDENTICAL rows whether their input arrives as 1 partition or
32. Integer-exact designs make this hold bit-for-bit; batch-local Arrow
kernels must merge to the same global answer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(12)), f"s{i % 4}")
         for i in range(200)],
        "doc_id bigint, text string, source string",
    ).cache()


def test_classifier_scores_partition_invariant(spark, docs):
    from hfsa_spark.operators.text import hashed_linear_score

    a = _rows(hashed_linear_score(docs.repartition(1)))
    b = _rows(hashed_linear_score(docs.repartition(32)))
    assert a == b


def test_bigram_logprob_partition_invariant(spark, docs):
    from hfsa_spark.operators.text import bigram_logprob_score

    a = _rows(bigram_logprob_score(docs.repartition(1)))
    b = _rows(bigram_logprob_score(docs.repartition(32)))
    assert a == b


def test_count_min_partition_invariant(spark, docs):
    from hfsa_spark.operators.sketches import count_min_estimate

    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    a = _rows(count_min_estimate(toks.repartition(1), "tok", ["w0", "w5"]))
    b = _rows(count_min_estimate(toks.repartition(32), "tok", ["w0", "w5"]))
    assert a == b


def test_exact_topk_arrow_partition_invariant(spark):
    """Batch-local top-k must merge to the same global ranking no matter
    how the corpus is partitioned."""
    import random

    from hfsa_spark.operators.similarity import exact_topk_arrow

    rng = random.Random(7)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(300)],
        "vec_id bigint, embedding array<double>",
    ).cache()
    q = emb.filter("vec_id < 3")
    a = _rows(exact_topk_arrow(emb.repartition(1), q, k=7))
    b = _rows(exact_topk_arrow(emb.repartition(32), q, k=7))
    assert a == b


def test_pagerank_partition_invariant(spark):
    from hfsa_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i, (i * 3 + 1) % 40) for i in range(40)] + [(7, 13), (21, 13)],
        "src bigint, dst bigint",
    )
    a = _rows(pagerank(edges.repartition(1), iters=3))
    b = _rows(pagerank(edges.repartition(32), iters=3))
    assert a == b


def test_curriculum_partition_invariant(spark, docs):
    from hfsa_spark.operators.sampling import curriculum_order

    scored = docs.select("doc_id", (F.col("doc_id") % 17).alias("score"))
    a = _rows(curriculum_order(scored.repartition(1)))
    b = _rows(curriculum_order(scored.repartition(32)))
    assert a == b
