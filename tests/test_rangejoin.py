"""Bucketized range join: boundary semantics, multi-bucket intervals, no
duplicate pairs, equivalence with the naive inequality join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_boundaries_and_multibucket(spark):
    from hfsa_spark.operators.rangejoin import range_join

    points = spark.createDataFrame(
        [("k", 100, 1), ("k", 250, 2), ("k", 9999, 3), ("k", 101, 4)],
        "key string, t long, pid int",
    )
    intervals = spark.createDataFrame(
        [("k", 100, 250, 10), ("k", 240, 9999, 11)],
        "key string, s long, e long, iid int",
    )
    out = range_join(
        points, intervals, point_col="t", start_col="s", end_col="e",
        by_cols=["key"], bucket_width=100,
    )
    pairs = {(r["pid"], r["iid"]) for r in out.collect()}
    assert pairs == {
        (1, 10),  # t == start (closed)
        (4, 10),
        (2, 10),  # t == end (closed)
        (2, 11),
        (3, 11),  # t == end of a 97-bucket interval
    }
    # exactly once per containment — the bucketization must not duplicate
    assert out.count() == len(pairs)


def test_matches_naive_inequality_join(spark):
    import random

    rnd = random.Random(11)
    points = [("k%d" % rnd.randint(0, 3), rnd.randint(0, 1000), i) for i in range(200)]
    ivals = []
    for i in range(60):
        s = rnd.randint(0, 950)
        ivals.append(("k%d" % rnd.randint(0, 3), s, s + rnd.randint(0, 300), i))
    p = spark.createDataFrame(points, "key string, t long, pid int")
    iv = spark.createDataFrame(ivals, "key string, s long, e long, iid int")

    from hfsa_spark.operators.rangejoin import range_join

    fast = range_join(
        p, iv, point_col="t", start_col="s", end_col="e", by_cols=["key"], bucket_width=64
    )
    naive = iv.join(p, "key").filter((F.col("t") >= F.col("s")) & (F.col("t") <= F.col("e")))
    fast_pairs = {(r["pid"], r["iid"]) for r in fast.collect()}
    naive_pairs = {(r["pid"], r["iid"]) for r in naive.collect()}
    assert fast_pairs == naive_pairs
    assert fast.count() == naive.count()
