"""Tests for mixture sampling, salted join, sketch reports, next-token stats."""

import pytest
from pyspark.sql import functions as F

from hfsa_spark.operators.sampling import mixture_sample, stratified_sample
from hfsa_spark.operators.sketches import (
    approx_distinct_report,
    approx_quantile_report,
)
from hfsa_spark.operators.text import next_token_stats
from hfsa_spark.plans import num_exchanges, salted_join


@pytest.fixture()
def strata(spark):
    rows = [(i, f"s{i % 4}") for i in range(400)]
    return spark.createDataFrame(rows, "id long, src string")


def test_mixture_rates_full_zero_and_default(strata):
    out = mixture_sample(strata, "id", "src", {"s0": 1.0, "s1": 0.0}, default=0.5)
    by = {r["src"]: r["n"] for r in
          out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert by["s0"] == 100          # rate 1.0 keeps everything
    assert "s1" not in by           # rate 0.0 keeps nothing
    # default 0.5 applies to unlisted strata, roughly half kept
    assert 30 <= by["s2"] <= 70 and 30 <= by["s3"] <= 70


def test_mixture_equals_stratified_at_uniform_rate(strata):
    # with every stratum at the same rate and the same salt, mixture and
    # plain stratified sampling pick the IDENTICAL rows (same hash cut)
    rates = {f"s{i}": 0.3 for i in range(4)}
    a = {r["id"] for r in
         mixture_sample(strata, "id", "src", rates, salt="x").collect()}
    b = {r["id"] for r in stratified_sample(strata, "id", 0.3, salt="x").collect()}
    assert a == b


def test_mixture_is_map_only(strata):
    assert num_exchanges(mixture_sample(strata, "id", "src", {"s0": 0.5})) == 0


def test_salted_join_matches_plain_join(spark):
    # skewed fact: one hot key carries most rows
    fact = spark.createDataFrame(
        [(1 if i % 10 else i % 5, i) for i in range(1000)], "k long, v long"
    )
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(5)], "k2 long, name string")
    got = (
        salted_join(fact, dim, "k", "k2", salt_buckets=4)
        .groupBy("name")
        .agg(F.sum("v").alias("sv"), F.count("*").alias("n"))
    )
    want = (
        fact.join(dim, fact.k == dim.k2)
        .groupBy("name")
        .agg(F.sum("v").alias("sv"), F.count("*").alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_join_left_keeps_unmatched(spark):
    fact = spark.createDataFrame([(1, 10), (99, 20)], "k long, v long")
    dim = spark.createDataFrame([(1, "a")], "k2 long, name string")
    out = salted_join(fact, dim, "k", "k2", salt_buckets=3, how="left").collect()
    assert len(out) == 2
    unmatched = [r for r in out if r["k"] == 99][0]
    assert unmatched["name"] is None
    with pytest.raises(ValueError):
        salted_join(fact, dim, "k", "k2", how="full")


def test_approx_distinct_within_bound(spark):
    rows = [(f"g{i % 3}", i % 50) for i in range(3000)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = approx_distinct_report(df, "g", "v", rsd=0.05, bound=0.15).collect()
    assert len(out) == 3
    for r in out:
        assert r["exact_nd"] == 50 and r["within_bound"]


def test_approx_distinct_sketch_only_has_no_exact(spark):
    df = spark.createDataFrame([("g", 1)], "g string, v long")
    cols = approx_distinct_report(df, "g", "v", with_exact=False).columns
    assert cols == ["g", "approx_nd"]


def test_approx_quantiles_bracket_exact(spark):
    df = spark.createDataFrame([("g", float(i)) for i in range(1001)], "g string, v double")
    r = approx_quantile_report(df, "g", "v", [0.5, 0.9], accuracy=10_000).collect()[0]
    assert r["exact_q"] == [500.0, 900.0]
    for a, e in zip(r["approx_q"], r["exact_q"]):
        assert abs(a - e) <= 1.0  # rank error 1/accuracy on 1001 rows


def test_next_token_topk_and_ties(spark):
    text = "a b a b a c a c a d"  # a→b:2, a→c:2, a→d:1; b→a:2, c→a:2, d→: none
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = next_token_stats(df, k=2, min_count=1).orderBy("prefix", "rank").collect()
    got = [(r["prefix"], r["nxt"], r["n"], r["rank"]) for r in out]
    assert got == [
        ("a", "b", 2, 1),   # tie with c broken by nxt asc
        ("a", "c", 2, 2),
        ("b", "a", 2, 1),
        ("c", "a", 2, 1),
    ]  # "a d" bigram (count 1) exists but k=2 cuts it; d has no successor


def test_next_token_min_count_prunes(spark):
    df = spark.createDataFrame(
        [(1, "x y x y x z")], "doc_id long, text string"
    )
    out = next_token_stats(df, k=5, min_count=2).collect()
    pairs = {(r["prefix"], r["nxt"]) for r in out}
    assert pairs == {("x", "y"), ("y", "x")}  # x→z (count 1) pruned


def test_frequent_items_exact_when_capacity_suffices(spark):
    from pyspark.sql import functions as F

    from hfsa_spark.operators.sketches import frequent_items

    rows = [(v,) for v in ["a"] * 50 + ["b"] * 30 + ["c"] * 5]
    df = spark.createDataFrame(rows, "v string").repartition(8)
    out = frequent_items(df, "v", capacity=16, k=3).collect()
    got = [(r["value"], r["min_count"], r["max_count"]) for r in out]
    assert got == [("a", 50, 50), ("b", 30, 30), ("c", 5, 5)]


def test_frequent_items_bounds_under_pressure(spark):
    """capacity=2 with 6 distinct values forces decrements: the heavy
    hitter must survive and every reported bound must contain the truth."""
    from hfsa_spark.operators.sketches import frequent_items

    truth = {"hot": 400, "w1": 30, "w2": 30, "w3": 25, "w4": 20, "w5": 15}
    rows = [(v,) for v, n in truth.items() for _ in range(n)]
    df = spark.createDataFrame(rows, "v string").repartition(4)
    out = frequent_items(df, "v", capacity=2, k=6).collect()
    by_val = {r["value"]: r for r in out}
    assert "hot" in by_val
    for r in out:
        assert r["min_count"] <= truth[r["value"]] <= r["max_count"]


def test_frequent_items_excludes_nulls(spark):
    """NULL values must be dropped before sketching: they'd otherwise be
    conflated with the sentinel events row and silently vanish from the
    top-k while still inflating nothing — the documented contract is that
    NULL is excluded and non-null counts stay exact."""
    from pyspark.sql import functions as F

    from hfsa_spark.operators.sketches import frequent_items

    rows = [("a",)] * 5 + [(None,)] * 50 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "v string").repartition(4)
    out = frequent_items(df, "v", capacity=16, k=10).collect()
    got = {r["value"]: (r["min_count"], r["max_count"]) for r in out}
    assert None not in got
    assert got == {"a": (5, 5), "b": (3, 3), "c": (1, 1)}


def test_count_min_estimate(spark):
    from hfsa_spark.operators.sketches import count_min_estimate

    # tiny width forces collisions → overestimates, never underestimates
    vals = ["a"] * 10 + ["b"] * 5 + ["c"] * 3 + [f"x{i}" for i in range(50)]
    df = spark.createDataFrame([(v,) for v in vals], "tok string")
    got = {r["value"]: r for r in
           count_min_estimate(df, "tok", ["a", "b", "c", "missing"],
                              depth=4, width=8).collect()}
    for v, true in [("a", 10), ("b", 5), ("c", 3), ("missing", 0)]:
        assert got[v]["exact"] == true
        assert got[v]["est"] >= true          # one-sided guarantee
        assert got[v]["overestimate"] == got[v]["est"] - true
    # generous width → exact answers (no collisions among 53 distinct)
    wide = {r["value"]: r for r in
            count_min_estimate(df, "tok", ["a", "missing"],
                               depth=4, width=65536).collect()}
    assert wide["a"]["est"] == 10 and wide["missing"]["est"] == 0


def test_daily_distinct_rollup(spark):
    from datetime import datetime

    from hfsa_spark.operators.sketches import daily_distinct_rollup

    rows = []
    # 3 days: day1 users {1..50}, day2 {26..75}, day3 {1..10}
    for u in range(1, 51):
        rows.append((datetime(2024, 1, 1, 10), u))
    for u in range(26, 76):
        rows.append((datetime(2024, 1, 2, 11), u))
    for u in range(1, 11):
        rows.append((datetime(2024, 1, 3, 9), u))
    df = spark.createDataFrame(rows, "ts timestamp, user_id bigint")
    got = {str(r["day"])[:10]: r
           for r in daily_distinct_rollup(df, window_days=2, bound=0.05).collect()}
    d1, d2, d3 = got["2024-01-01"], got["2024-01-02"], got["2024-01-03"]
    assert (d1["d1_exact"], d2["d1_exact"], d3["d1_exact"]) == (50, 50, 10)
    # trailing-2-day exact windows: 50, 75 (1..75), 60 (26..75 ∪ 1..10)
    assert (d1["w_exact"], d2["w_exact"], d3["w_exact"]) == (50, 75, 60)
    # HLL at lg_k=14 on tiny sets is exact-ish; bound asserts it
    assert all(r["within_bound"] for r in got.values())
    assert d2["w_est"] != d2["d1_exact"] + d1["d1_exact"]  # union ≠ sum


def test_dp_noisy_counts(spark):
    import hashlib
    import math

    from hfsa_spark.operators.sketches import dp_noisy_counts

    df = spark.createDataFrame(
        [("a",)] * 100 + [("b",)] * 10, "g string"
    )
    got = {r["g"]: r for r in dp_noisy_counts(df, "g", epsilon_milli=500).collect()}

    def expected(g, n):
        h = int(hashlib.md5(f"41:{g}".encode()).hexdigest()[:15], 16)
        u = h / float(1 << 60) - 0.5
        mag = -2.0 * math.log(1.0 - 2.0 * abs(u))
        noise = -mag if u < 0 else mag
        return math.floor((n + noise) * 1e6)

    assert got["a"]["noisy_micro"] == expected("a", 100)
    assert got["b"]["noisy_micro"] == expected("b", 10)
    # released counts are clamped and integral
    assert got["a"]["released"] >= 0
    # deterministic across runs (noise-reuse defense)
    again = {r["g"]: r["noisy_micro"]
             for r in dp_noisy_counts(df, "g", epsilon_milli=500).collect()}
    assert again == {g: r["noisy_micro"] for g, r in got.items()}
