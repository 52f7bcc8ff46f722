"""Deterministic sampling / split / token-budget operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_hash_split_fractions_and_total(docs):
    from hfsa_spark.operators.sampling import hash_split

    out = hash_split(docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = docs.count()
    assert sum(counts.values()) == total
    assert set(counts) <= {"train", "val", "test"}
    assert 0.8 * total <= counts["train"] <= 0.97 * total


def test_hash_split_partitioning_invariant(docs):
    """Membership is a pure function of the id — identical under any
    physical partitioning (the property plain df.sample does NOT have)."""
    from hfsa_spark.operators.sampling import hash_split

    a = hash_split(docs.repartition(1), "doc_id", {"train": 0.5, "val": 0.5})
    b = hash_split(docs.repartition(13), "doc_id", {"train": 0.5, "val": 0.5})
    sa = {(r["doc_id"], r["split"]) for r in a.select("doc_id", "split").collect()}
    sb = {(r["doc_id"], r["split"]) for r in b.select("doc_id", "split").collect()}
    assert sa == sb


def test_stratified_sample_rate_and_determinism(docs):
    from hfsa_spark.operators.sampling import stratified_sample

    total = docs.count()
    s1 = stratified_sample(docs, "doc_id", 0.2)
    s2 = stratified_sample(docs, "doc_id", 0.2)
    ids1 = {r["doc_id"] for r in s1.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in s2.select("doc_id").collect()}
    assert ids1 == ids2
    assert 0.1 * total <= len(ids1) <= 0.3 * total
    # nested property: a smaller fraction's sample is NOT guaranteed to nest
    # (different threshold, same hash) — but the same salt + larger fraction
    # must be a superset
    ids_half = {
        r["doc_id"] for r in stratified_sample(docs, "doc_id", 0.5).select("doc_id").collect()
    }
    assert ids1 <= ids_half


def test_token_budget_boundary(spark):
    from hfsa_spark.operators.sampling import token_budget_filter

    df = spark.createDataFrame(
        [
            ("a", 1, 400),
            ("a", 2, 400),
            ("a", 3, 400),  # cum 1200 > 1000 → dropped
            ("b", 1, 1000),  # cum == budget → kept (<=)
            ("b", 2, 1),
        ],
        "source string, doc_id int, n_tokens int",
    )
    kept = token_budget_filter(df, "source", "doc_id", "n_tokens", budget=1000)
    got = {(r["source"], r["doc_id"]) for r in kept.collect()}
    assert got == {("a", 1), ("a", 2), ("b", 1)}


def test_fixed_size_sample_exact_k_and_invariance(spark):
    from hfsa_spark.operators.sampling import fixed_size_sample

    df = spark.createDataFrame(
        [(i, "big" if i < 80 else "small") for i in range(90)],
        "doc_id long, lang string",
    )
    out = fixed_size_sample(df, "doc_id", "lang", k=5).collect()
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    # exactly k from the big stratum, min(k, n) from the small one
    assert len(by_lang["big"]) == 5 and len(by_lang["small"]) == 5
    assert sorted(r["sample_rank"] for r in by_lang["big"]) == [1, 2, 3, 4, 5]
    # deterministic under repartitioning
    again = fixed_size_sample(df.repartition(13), "doc_id", "lang", k=5)
    assert sorted((r["lang"], r["doc_id"]) for r in out) == sorted(
        (r["lang"], r["doc_id"]) for r in again.collect()
    )


def test_fixed_size_sample_small_stratum_keeps_all(spark):
    from hfsa_spark.operators.sampling import fixed_size_sample

    df = spark.createDataFrame([(1, "x"), (2, "x")], "doc_id long, lang string")
    assert fixed_size_sample(df, "doc_id", "lang", k=10).count() == 2


def test_mixture_reweight(spark):
    from hfsa_spark.operators.sampling import mixture_reweight

    df = spark.createDataFrame(
        [
            (1, "a b c", "web"),    # web: 5 tokens
            (2, "d e", "web"),
            (3, "f g h i j", "code"),  # code: 5 tokens
            (4, "k l m n o p q r s t", "books"),  # books: 10 tokens
        ],
        "doc_id bigint, text string, source string",
    )
    # uniform target: each source should get 1/3 of tokens; total = 20
    got = {r["source"]: r for r in mixture_reweight(df).collect()}
    # web: actual 5/20 = 0.25, target 1/3 → repeat = (1/3)/(1/4) = 4/3
    assert got["web"]["repeat_micro"] == 1333333
    assert got["books"]["repeat_micro"] == 666666
    assert got["web"]["n_docs"] == 2 and got["web"]["n_tokens"] == 5

    # explicit target: drop books (weight 0), upweight code
    got2 = {
        r["source"]: r
        for r in mixture_reweight(df, target={"web": 1, "code": 3}).collect()
    }
    assert got2["books"]["repeat_micro"] == 0
    # code: target 3/4, actual 1/4 → 3×
    assert got2["code"]["repeat_micro"] == 3000000


def test_temperature_reweight(spark):
    import math

    from hfsa_spark.operators.sampling import temperature_reweight

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i", "en"),  # 9 tokens
            (2, "j", "zh"),                   # 1 token
        ],
        "doc_id bigint, text string, lang string",
    )
    got = {r["lang"]: r for r in temperature_reweight(df, alpha=0.5).collect()}
    # shares 0.9 / 0.1 → sqrt 0.9487/0.3162 → low-resource zh upsampled
    q_en = math.floor(math.sqrt(0.9) * 1e9)
    q_zh = math.floor(math.sqrt(0.1) * 1e9)
    assert got["en"]["q"] == q_en and got["zh"]["q"] == q_zh
    assert got["zh"]["repeat_micro"] == math.floor(
        1e6 * (q_zh / (q_en + q_zh)) / 0.1
    )
    assert got["zh"]["repeat_micro"] > 1000000 > got["en"]["repeat_micro"]


def test_curriculum_order(spark):
    from hfsa_spark.operators.sampling import curriculum_order

    rows = [(i, 100 - i) for i in range(20)]  # doc 0 easiest (highest score)
    df = spark.createDataFrame(rows, "doc_id bigint, score bigint")
    got = curriculum_order(df, n_bins=4).orderBy("position").collect()
    # positions are 1..20, bins non-decreasing easy→hard
    assert [r["position"] for r in got] == list(range(1, 21))
    bins = [r["bin"] for r in got]
    assert bins == sorted(bins) and bins[0] == 1 and bins[-1] == 4
    # bin 1 holds the 5 easiest docs (ids 0-4), shuffled within
    first = {r["doc_id"] for r in got[:5]}
    assert first == {0, 1, 2, 3, 4}
    assert [r["doc_id"] for r in got[:5]] != [0, 1, 2, 3, 4]  # shuffled
    # deterministic across runs
    again = curriculum_order(df, n_bins=4).orderBy("position").collect()
    assert [r["doc_id"] for r in again] == [r["doc_id"] for r in got]


def test_leakage_safe_split(spark):
    from hfsa_spark.operators.sampling import leakage_safe_split

    rows = [(i, f"doc number {i % 10}") for i in range(50)]  # 5 copies each
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = leakage_safe_split(df).collect()
    # every duplicate group lands wholly in one split
    by_digest = {}
    for r in got:
        by_digest.setdefault(r["digest"], set()).add(r["split"])
    assert len(by_digest) == 10
    assert all(len(s) == 1 for s in by_digest.values())
    # deterministic
    again = {r["doc_id"]: r["split"] for r in leakage_safe_split(df).collect()}
    assert again == {r["doc_id"]: r["split"] for r in got}


def test_materialize_mixture(spark):
    import hashlib

    from hfsa_spark.operators.sampling import materialize_mixture

    df = spark.createDataFrame(
        [(1, 2500000), (2, 1000000), (3, 400000), (4, 0)],
        "doc_id bigint, repeat_micro bigint",
    )
    got = {}
    for r in materialize_mixture(df).collect():
        got.setdefault(r["doc_id"], []).append(r["epoch_idx"])

    def extra(doc_id, frac):
        u = int(hashlib.md5(f"23:{doc_id}".encode()).hexdigest()[:15], 16) % 1000000
        return 1 if u < frac else 0

    assert sorted(got[1]) == list(range(2 + extra(1, 500000)))
    assert got[2] == [0]                      # exactly one epoch
    assert got.get(3, []) == ([0] if extra(3, 400000) else [])
    assert 4 not in got                       # zero weight → dropped
    # deterministic reshuffle keys: distinct per epoch
    rows = materialize_mixture(df).collect()
    keys = [(r["doc_id"], r["epoch_idx"], r["shuffle_key"]) for r in rows]
    assert len({k[2] for k in keys}) == len(keys)


def test_neardup_safe_split(spark):
    from hfsa_spark.operators.sampling import neardup_safe_split

    # docs 1-2-3 chained near-dups (different texts!), 4-5 a pair, 6 alone
    docs = spark.createDataFrame(
        [(i, f"document body {i}") for i in range(1, 7)],
        "doc_id bigint, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a bigint, id_b bigint"
    )
    got = neardup_safe_split(docs, pairs).collect()
    comp = {r["doc_id"]: r["component"] for r in got}
    split = {r["doc_id"]: r["split"] for r in got}
    assert comp[1] == comp[2] == comp[3] != comp[4]
    assert comp[4] == comp[5] != comp[6]
    # the leakage property: a whole component shares one split
    assert split[1] == split[2] == split[3]
    assert split[4] == split[5]
    # content-keyed: renumbering ids preserves the assignment of doc text
    docs2 = docs.withColumn("doc_id", F.col("doc_id") + 100)
    pairs2 = pairs.selectExpr("id_a + 100 as id_a", "id_b + 100 as id_b")
    split2 = {r["text"]: r["split"]
              for r in neardup_safe_split(docs2, pairs2).collect()}
    assert all(split2[f"document body {i}"] == split[i] for i in range(1, 7))
