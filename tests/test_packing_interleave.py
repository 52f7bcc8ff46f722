"""Tests for sequence packing (next-fit) and curriculum interleave."""

from pyspark.sql import functions as F

from hfsa_spark.operators.packing import pack_sequences, packing_efficiency
from hfsa_spark.operators.sampling import interleave_order


def _packed(spark, rows, cap):
    df = spark.createDataFrame(rows, "g string, id long, tok long")
    out = pack_sequences(df, "g", "id", "tok", cap)
    return {(r["g"], r["id"]): (r["seq_id"], r["seq_offset"]) for r in out.collect()}


def test_pack_next_fit_basic(spark):
    # cap 10: [4,4,4] -> seq1 holds 4+4, third opens seq2
    got = _packed(spark, [("a", 1, 4), ("a", 2, 4), ("a", 3, 4)], 10)
    assert got == {("a", 1): (1, 0), ("a", 2): (1, 4), ("a", 3): (2, 0)}


def test_pack_exact_fit_and_oversize(spark):
    rows = [("a", 1, 10), ("a", 2, 25), ("a", 3, 1), ("a", 4, 9)]
    got = _packed(spark, rows, 10)
    # row1 fills seq1 exactly; oversized row2 gets its own seq2;
    # rows 3+4 share seq3 (1+9=10)
    assert got == {
        ("a", 1): (1, 0),
        ("a", 2): (2, 0),
        ("a", 3): (3, 0),
        ("a", 4): (3, 1),
    }


def test_pack_groups_independent(spark):
    rows = [("a", 1, 6), ("b", 1, 6), ("a", 2, 6), ("b", 2, 3)]
    got = _packed(spark, rows, 10)
    assert got[("a", 1)] == (1, 0) and got[("a", 2)] == (2, 0)
    assert got[("b", 1)] == (1, 0) and got[("b", 2)] == (1, 6)


def test_packing_efficiency(spark):
    df = spark.createDataFrame(
        [("a", 1, 4), ("a", 2, 4), ("a", 3, 4)], "g string, id long, tok long"
    )
    packed = pack_sequences(df, "g", "id", "tok", 10)
    r = packing_efficiency(packed, "g", "tok", 10).collect()[0]
    assert (r["n_rows"], r["n_seqs"], r["total_tokens"], r["min_seqs"]) == (3, 2, 12, 2)
    assert r["fill_permille"] == 600  # 12 / (2*10)


def test_interleave_proportions(spark):
    rows = [("a", i) for i in range(8)] + [("b", 100 + i) for i in range(4)]
    df = spark.createDataFrame(rows, "s string, id long")
    out = (
        interleave_order(df, "s", {"a": 2, "b": 1}, "id")
        .orderBy("interleave_key", "s", "stratum_rank")
        .collect()
    )
    seq = [r["s"] for r in out]
    # a at (2k-1)/4 = .25,.75,1.25,…; b at (2k-1)/2 = .5,1.5,…
    assert seq == ["a", "b", "a", "a", "b", "a", "a", "b", "a", "a", "b", "a"]
    # within a stratum the order_col order is preserved
    ids_a = [r["id"] for r in out if r["s"] == "a"]
    assert ids_a == sorted(ids_a)


def test_interleave_drops_unweighted_stratum(spark):
    df = spark.createDataFrame([("a", 1), ("zz", 2)], "s string, id long")
    out = interleave_order(df, "s", {"a": 1}, "id").collect()
    assert [r["s"] for r in out] == ["a"]


def test_length_bucket_batches(spark):
    from hfsa_spark.operators.packing import length_bucket_batches

    rows = [(i, l) for i, l in enumerate([5, 10, 15, 20, 30, 60, 200, 500])]
    df = spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint")
    got = {r["doc_id"]: r for r in
           length_bucket_batches(df, batch_size=2).collect()}
    # bucket edges 16/32/64/128: 5,10,15→0; 20,30→1; 60→2; 200,500→overflow 4
    assert [got[i]["bucket"] for i in range(8)] == [0, 0, 0, 1, 1, 2, 4, 4]
    # bucket 0, batch_size 2, len desc: (15,10) then (5)
    assert got[2]["batch_idx"] == 1 and got[1]["batch_idx"] == 1
    assert got[0]["batch_idx"] == 2
    assert got[1]["batch_max_len"] == 15 and got[1]["pad_tokens"] == 5
    assert got[0]["pad_tokens"] == 0  # alone in its batch
    # overflow bucket pads 200 against 500
    assert got[6]["batch_max_len"] == 500 and got[6]["pad_tokens"] == 300


def test_token_budget_shards(spark):
    from hfsa_spark.operators.packing import token_budget_shards

    # tokens: 3, 4, 5, 6 with budget 7 → cum-before 0,3,7,12 →
    # shards 0,0,1,1
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate([3, 4, 5, 6])]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r["shard_id"]
           for r in token_budget_shards(df, tokens_per_shard=7).collect()}
    assert got == {0: 0, 1: 0, 2: 1, 3: 1}
