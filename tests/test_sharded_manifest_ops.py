"""Per-shard (parallel-window) forms of the three manifest operators
that default to a global total-order window: curriculum_order,
token_budget_shards, order_mixing_audit. Pins

* single-shard equivalence: with a constant shard key the sharded path
  must be byte-identical to the global form (same algebra, different
  physical plan), and
* multi-shard shape: positions are a 1..N permutation with bins
  non-decreasing, shards never share a token shard, boundary-only
  undercount for the audit.
"""

from pyspark.sql import functions as F


def _docs(spark, n=40):
    rows = [(i, f"tok{i} " * ((i % 7) + 1), float((i * 37) % 100), f"s{i % 3}")
            for i in range(n)]
    return spark.createDataFrame(rows, ["doc_id", "text", "score", "src"])


# --------------------------------------------------------- curriculum --
def test_curriculum_shard_single_group_equals_global(spark):
    from hfsa_spark.operators.sampling import curriculum_order

    df = _docs(spark).withColumn("one", F.lit("x"))
    g = {r.doc_id: (r.bin, r.position)
         for r in curriculum_order(df, n_bins=4).collect()}
    s = {r.doc_id: (r.bin, r.position)
         for r in curriculum_order(df, n_bins=4, shard_col="one").collect()}
    assert g == s


def test_curriculum_shard_multi_group_shape(spark):
    from hfsa_spark.operators.sampling import curriculum_order

    df = _docs(spark, 60)
    out = curriculum_order(df, n_bins=4, shard_col="src").collect()
    positions = sorted(r.position for r in out)
    assert positions == list(range(1, 61))
    # bins non-decreasing along the curriculum
    by_pos = sorted(out, key=lambda r: r.position)
    bins = [r.bin for r in by_pos]
    assert bins == sorted(bins)
    # within a (bin, shard) block, order follows (shuffle_key, id)
    from collections import defaultdict
    blocks = defaultdict(list)
    for r in by_pos:
        blocks[(r.bin, r.src)].append((r.shuffle_key, r.doc_id))
    for keys in blocks.values():
        assert keys == sorted(keys)


def test_curriculum_shard_partition_invariant(spark):
    from hfsa_spark.operators.sampling import curriculum_order

    df = _docs(spark, 60)
    a = {(r.doc_id, r.position)
         for r in curriculum_order(df, n_bins=4, shard_col="src").collect()}
    b = {(r.doc_id, r.position)
         for r in curriculum_order(
             df.repartition(7), n_bins=4, shard_col="src").collect()}
    assert a == b


# ------------------------------------------------- token_budget_shards --
def test_token_shards_single_group_equals_global(spark):
    from hfsa_spark.operators.packing import token_budget_shards

    df = _docs(spark).withColumn("one", F.lit("x"))
    g = {(r.doc_id): (r.n_tokens, r.shard_id)
         for r in token_budget_shards(df, tokens_per_shard=9).collect()}
    s = {(r.doc_id): (r.n_tokens, r.shard_id)
         for r in token_budget_shards(
             df, tokens_per_shard=9, shard_col="one").collect()}
    assert g == s


def test_token_shards_groups_never_share_a_shard(spark):
    from hfsa_spark.operators.packing import token_budget_shards

    df = _docs(spark, 60)
    out = token_budget_shards(df, tokens_per_shard=11,
                              shard_col="src").collect()
    shard_groups = {}
    for r in out:
        shard_groups.setdefault(r.shard_id, set()).add(r.src)
    assert all(len(g) == 1 for g in shard_groups.values())
    # shard ids are contiguous 0..K
    ids = sorted(shard_groups)
    assert ids == list(range(len(ids)))
    # per-shard budget: cumulative-before < budget means every shard
    # overshoots by at most its last document
    from collections import defaultdict
    tot = defaultdict(int)
    mx = defaultdict(int)
    for r in out:
        tot[r.shard_id] += r.n_tokens
        mx[r.shard_id] = max(mx[r.shard_id], r.n_tokens)
    for sid, t in tot.items():
        assert t - mx[sid] < 11


# ------------------------------------------------- order_mixing_audit --
def test_order_audit_single_shard_equals_global(spark):
    from hfsa_spark.operators.sampling import order_mixing_audit

    df = _docs(spark).withColumn("pos", F.col("doc_id")).withColumn(
        "one", F.lit("x")
    )
    g = {r.label: (r.n, r.adj_same, r.share_micro)
         for r in order_mixing_audit(df, "pos", "src").collect()}
    s = {r.label: (r.n, r.adj_same, r.share_micro)
         for r in order_mixing_audit(df, "pos", "src",
                                     shard_col="one").collect()}
    assert g == s


def test_order_audit_contiguous_shards_drop_only_boundaries(spark):
    from hfsa_spark.operators.sampling import order_mixing_audit

    # one label, strictly increasing order: globally every adjacent pair
    # matches (N-1); 4 contiguous shards drop exactly 3 boundary pairs
    rows = [(i, "a", i // 10) for i in range(40)]
    df = spark.createDataFrame(rows, ["pos", "lab", "blk"])
    g = order_mixing_audit(df, "pos", "lab").collect()[0]
    s = order_mixing_audit(df, "pos", "lab", shard_col="blk").collect()[0]
    assert g.adj_same == 39
    assert s.adj_same == 39 - 3
    assert g.n == s.n == 40


def test_sharded_paths_have_no_unpartitioned_window(spark):
    """Every Window in the sharded physical plans must carry a partition
    spec (the global form's 'No Partition Defined' single-task sort must
    be gone when a shard key is supplied)."""
    import re

    from hfsa_spark.operators.packing import token_budget_shards
    from hfsa_spark.operators.sampling import (
        curriculum_order,
        order_mixing_audit,
    )
    from hfsa_spark.plans import explain_str

    df = _docs(spark, 60).withColumn("pos", F.col("doc_id"))
    plans = [
        curriculum_order(df, n_bins=4, shard_col="src"),
        token_budget_shards(df, tokens_per_shard=11, shard_col="src"),
        order_mixing_audit(df, "pos", "src", shard_col="src"),
    ]
    for p in plans:
        physical = explain_str(p, "formatted")
        # windowspecdefinition(part..., order ASC/DESC..., frame...):
        # an unpartitioned spec starts directly with an ordered expr
        for m in re.finditer(r"windowspecdefinition\((\w+)#\d+ (ASC|DESC)",
                             physical):
            raise AssertionError(
                f"unpartitioned window over {m.group(1)}:\n"
                + physical[:2000]
            )


def test_curriculum_shard_null_keys_not_dropped(spark):
    """NULL shard values form a real group (ordered last); no rows drop
    and positions stay a 1..N permutation."""
    from hfsa_spark.operators.sampling import curriculum_order

    rows = [(i, float(i % 10), None if i % 4 == 0 else f"s{i % 2}")
            for i in range(24)]
    df = spark.createDataFrame(rows, "doc_id long, score double, src string")
    out = curriculum_order(df, n_bins=3, shard_col="src").collect()
    assert len(out) == 24
    assert sorted(r.position for r in out) == list(range(1, 25))
    # NULL group orders after non-null shards within each bin
    by_pos = sorted(out, key=lambda r: r.position)
    for a, b in zip(by_pos, by_pos[1:]):
        if a.bin == b.bin:
            assert not (a.src is None and b.src is not None)


def test_token_shards_null_keys_not_dropped(spark):
    from hfsa_spark.operators.packing import token_budget_shards

    rows = [(i, "w " * ((i % 5) + 1), None if i % 3 == 0 else "s")
            for i in range(18)]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    out = token_budget_shards(df, tokens_per_shard=6, shard_col="src").collect()
    assert len(out) == 18
    # shards contiguous, each wholly inside one group (None is a group)
    groups = {}
    for r in out:
        groups.setdefault(r.shard_id, set()).add(r.src)
    assert all(len(g) == 1 for g in groups.values())
    assert sorted(groups) == list(range(len(groups)))


def test_quality_drift_psi_null_scores_excluded(spark):
    from hfsa_spark.operators.features import quality_drift_psi

    base = [(i, (i * 53) % 1000) for i in range(200)]
    ref = spark.createDataFrame(base, "doc_id long, score long")
    # same distribution + 50 NULL scores must not fabricate drift
    cur = spark.createDataFrame(
        base + [(1000 + i, None) for i in range(50)],
        "doc_id long, score long",
    )
    out = quality_drift_psi(ref, cur, n_bins=10, lo=0, hi=1000).collect()
    assert all(r.psi_contrib == 0 for r in out)
    assert sum(r.cur_n for r in out) == 200
