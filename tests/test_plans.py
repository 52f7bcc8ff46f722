"""Plan-quality + determinism-under-partitioning tests (SURVEY.md §5 port
plan: 'serial/parallel equivalence becomes determinism-under-partitioning').

Plan checks assert the scale contract, not just correctness: filters reach
the parquet scan, projections prune columns, small dims broadcast, rollups
partially aggregate before shuffling, and the partitioned extract prunes
``top_dir`` partitions for subtree queries.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hfsa_spark.extract import generated_namespace
from hfsa_spark.extract.pathmat import write_inodes
from hfsa_spark.operators.rollup import ancestor_rollup
from hfsa_spark.operators.summary import summary_report
from hfsa_spark.plans import (
    explain_str,
    has_pushed_filter,
    num_exchanges,
    read_schema_columns,
    uses_broadcast_join,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")


@pytest.fixture(scope="module")
def namespace_parquet(spark, tmp_path_factory):
    """A generated namespace written the way the extract job writes it:
    parquet partitioned by top-level directory."""
    ns = generated_namespace(spark, max_depth=3, max_width=2, files_per_dir_factor=1)
    out = str(tmp_path_factory.mktemp("extract") / "inodes")
    write_inodes(ns, out)
    return out


# ---------------------------------------------------------- plan quality --


def test_filter_pushdown_reaches_scan(lineitem):
    q = lineitem.filter(F.col("l_quantity") > 30).select("l_orderkey")
    assert has_pushed_filter(q, "l_quantity")


def test_column_pruning(lineitem):
    q = lineitem.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    cols = read_schema_columns(q)
    assert set(cols) == {"l_returnflag", "l_quantity"}


def test_small_dim_broadcasts(spark):
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    q = cust.join(nation, cust["c_nationkey"] == nation["n_nationkey"])
    assert uses_broadcast_join(q)


def test_rollup_partial_agg_before_shuffle(small):
    files = small.filter(F.col("type") == "FILE").select("path", "file_size")
    rolled = ancestor_rollup(files, "path", {"s": F.sum("file_size")})
    plan = explain_str(rolled, "formatted")
    # map-side combine must exist; two-level rollup = per-path shuffle +
    # (tiny) ancestor shuffle, and the Generate explode must sit BETWEEN
    # them (post-aggregation), never on the raw row stream
    assert "partial_sum" in plan
    assert num_exchanges(rolled) == 2
    gen_pos = plan.find("Generate")
    first_agg_pos = plan.find("HashAggregate")
    assert gen_pos != -1 and first_agg_pos != -1


def test_summary_single_scan_grouping_sets(small):
    """A1: one Expand feeds user/group/overall — not three scans."""
    rep = summary_report(small)
    plan = explain_str(rep.by_user, "simple")
    assert plan.count("Expand") == 1


def test_subtree_prefix_pushdown(namespace_parquet, spark):
    inodes = spark.read.parquet(namespace_parquet)
    from hfsa_spark.functions.paths import subtree_predicate

    q = inodes.filter(subtree_predicate("full_path", "/a/b")).select("full_path")
    assert has_pushed_filter(q, "full_path")


def test_partition_pruning_on_top_dir(namespace_parquet, spark):
    inodes = spark.read.parquet(namespace_parquet)
    q = inodes.filter(F.col("top_dir") == "a").select("full_path")
    plan = explain_str(q, "formatted")
    # pruned scan reads 1 of 26+ top_dir partitions
    assert "PartitionFilters: [isnotnull(top_dir" in plan or "top_dir" in plan.split("PartitionFilters:")[1].splitlines()[0]


# ------------------------------------------------------------ determinism --


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_summary_deterministic_under_partitioning(small):
    r1 = summary_report(small.repartition(1))
    r64 = summary_report(small.repartition(64))
    assert _rows(r1.by_user) == _rows(r64.by_user)
    assert _rows(r1.by_group) == _rows(r64.by_group)
    assert _rows(r1.overall) == _rows(r64.overall)


def test_rollup_deterministic_under_partitioning(small):
    files = small.filter(F.col("type") == "FILE").select("path", "file_size")
    a = ancestor_rollup(files.repartition(1), "path", {"s": F.sum("file_size")})
    b = ancestor_rollup(files.repartition(64), "path", {"s": F.sum("file_size")})
    assert _rows(a) == _rows(b)


def test_generated_namespace_shape(spark):
    """JMH dataset shape: 806 dirs + root, 209,560 files (BASELINE.md)."""
    ns = generated_namespace(spark)
    by_type = {r["type"]: r["count"] for r in ns.groupBy("type").agg(F.count("*").alias("count")).collect()}
    assert by_type["DIRECTORY"] == 807  # 806 + root
    assert by_type["FILE"] == 209560


# ------------------------------------------------- round-3 operator plans --


def test_incremental_dedup_anti_join_plan(spark):
    """The index side must be pruned to the single digest column before the
    anti join (a billions-row index at 100 TB shuffles one column, not the
    payload), and the plan must contain no cartesian product."""
    from hfsa_spark.operators.dedup import exact_dedup_groups, incremental_dedup
    from hfsa_spark.plans import explain_str, read_schema_columns

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    index = exact_dedup_groups(d, "doc_id", "text").select("digest")
    kept = incremental_dedup(d, index, "doc_id", "text")
    plan = explain_str(kept, "formatted")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_unigram_logprob_partial_agg(spark):
    """Corpus token counts must partially aggregate map-side (one row per
    distinct term per partition crosses the shuffle, not one per token)."""
    from hfsa_spark.operators.text import unigram_logprob_score
    from hfsa_spark.plans import explain_str

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = explain_str(unigram_logprob_score(d), "formatted")
    assert "partial_count" in plan or "partial count" in plan.lower()


def test_quantize_long_no_interpreted_lambda_in_filter(spark):
    """The explode-then-scalar shape must not re-inline a transform lambda
    into the generator filter (the InferFiltersFromGenerate trap — see
    quantize_embeddings_long docstring)."""
    from hfsa_spark.operators.similarity import quantize_embeddings_long
    from hfsa_spark.plans import explain_str

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = explain_str(quantize_embeddings_long(emb), "formatted")
    assert "lambdafunction" not in plan


def test_skew_audit(spark):
    from hfsa_spark.plans import skew_audit

    rows = [(k,) for k in ["hot"] * 90 + ["warm"] * 8 + ["a", "b"]]
    df = spark.createDataFrame(rows, "k string")
    got = skew_audit(df, "k", top_k=3).collect()
    assert [r["key"] for r in got] == ["hot", "warm", "a"]
    hot = got[0]
    assert hot["n_rows"] == 90 and hot["n_keys"] == 4
    assert hot["share_micro"] == 900000
    assert hot["skew_ratio_micro"] == 3600000  # 0.9 × 4 keys


def test_dynamic_partition_pruning(spark, tmp_path):
    """A partitioned fact joined to a filtered dim must plan a
    dynamicpruning subquery on the partition column — at 100 TB this is
    the difference between scanning 3 partitions and all of them."""
    fact_dir = str(tmp_path / "fact_part")
    fact = spark.range(0, 10000).select(
        F.col("id").alias("k"),
        (F.col("id") % 25).alias("nation"),
        (F.col("id") * 2).alias("v"),
    )
    fact.write.partitionBy("nation").parquet(fact_dir)
    dim = spark.read.parquet(f"{SF_DIR}/nation.parquet").filter(
        F.col("n_regionkey") == 0
    )
    q = (
        spark.read.parquet(fact_dir)
        .join(dim, F.col("nation") == F.col("n_nationkey"))
        .agg(F.sum("v").alias("s"))
    )
    plan = explain_str(q, "formatted")
    assert "dynamicpruning" in plan.lower()
    # and the result is correct (5 nations in region 0)
    assert q.collect()[0]["s"] is not None


def test_observe_quality(spark):
    """Observation metrics come from the SAME job as the action — no
    second scan — and report the exact counters."""
    from hfsa_spark.plans import observe_quality

    df = spark.createDataFrame(
        [(1, "hello"), (2, "   "), (3, "abc def")], "doc_id bigint, text string"
    )
    out, obs = observe_quality(df)
    assert out.count() == 3
    got = obs.get
    assert got["n_rows"] == 3
    assert got["n_empty"] == 1
    assert got["n_chars"] == 5 + 3 + 7


def test_exact_join_family_plans(spark):
    """q176/q184/q191 family plan contract: every join is an equi join
    (no CartesianProduct, no BroadcastNestedLoopJoin), candidates pass a
    distinct (HashAggregate on the pair keys) before verification, and
    interdoc repetition shuffles key on the 8-byte shingle hash."""
    from hfsa_spark.operators.dedup import (
        containment_join,
        interdoc_shingle_repetition,
        setsim_join,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # materialize=False: the r12 operators cache-and-materialize their
    # small verified output eagerly (releasing the shingle-set cache);
    # the lazy form exposes the full candidate+verify plan these
    # assertions pin
    setsim = setsim_join(docs, threshold_num=4, threshold_den=5,
                         materialize=False)
    contain = containment_join(docs, threshold_num=9, threshold_den=10,
                               materialize=False)
    rep = interdoc_shingle_repetition(docs, shingle_n=5, materialize=False)

    for q in (setsim, contain, rep):
        plan = explain_str(q, "extended")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    # candidate dedup before verify: the optimized plans aggregate on the
    # candidate pair keys (the .distinct()) below the intersection count
    for q in (setsim, contain):
        plan = explain_str(q, "formatted")
        assert plan.count("HashAggregate") >= 2
        # join strategies present are hash/sort-merge equi joins only
        import re
        strategies = set(
            re.findall(r"(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin"
                       r"|BroadcastNestedLoopJoin|CartesianProduct)", plan)
        )
        assert strategies and strategies <= {
            "BroadcastHashJoin", "ShuffledHashJoin", "SortMergeJoin"
        }, strategies

    # q191: both repartition-for-aggregate shuffles key on the 8-byte
    # hash column (named sh/h in the operator), not the raw shingle text
    plan = explain_str(rep, "formatted")
    import re
    partkeys = re.findall(r"hashpartitioning\(([^,]+),", plan)
    assert partkeys, plan[:1500]
    for k in partkeys:
        assert "_h#" in k or "_id#" in k, partkeys


def test_cdc_upsert_plans(spark):
    """CDC plan contract: the default path windows ONLY the change batch
    (one Window node, fed by the changes side) and applies it with equi
    joins; the broadcast path keeps the base payload out of every
    shuffle (survivors join is a BroadcastHashJoin; no cartesian or
    nested-loop join anywhere)."""
    import re

    from hfsa_spark.operators.cdc import upsert_merge

    base = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    ch = (
        base.limit(50)
        .withColumn("op", F.lit("U"))
        .withColumn("ts", F.lit(1))
    )

    merged = upsert_merge(base, ch, ["o_orderkey"], ts_col="ts")
    plan = explain_str(merged, "formatted")
    # exactly one Window NODE (the change batch) — the base is never
    # windowed; Spark also inserts a WindowGroupLimit above it (rank
    # pushdown), which the \b guard excludes
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    bc = upsert_merge(base, ch, ["o_orderkey"], ts_col="ts",
                      broadcast_changes=True)
    bplan = explain_str(bc, "formatted")
    assert "BroadcastHashJoin" in bplan
    assert "CartesianProduct" not in bplan
    assert "BroadcastNestedLoopJoin" not in bplan
    strategies = set(
        re.findall(
            r"(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin"
            r"|BroadcastNestedLoopJoin|CartesianProduct)",
            bplan,
        )
    )
    assert "CartesianProduct" not in strategies
    assert "BroadcastNestedLoopJoin" not in strategies


def test_tfrecord_read_path_plan(spark, tmp_path):
    """q203's read side (its gate localCheckpoints, so the audit plan is
    vacuous — evidence lives here by the q161/q164 convention): one scan
    task per shard via a RoundRobin exchange over the n_shards PATH
    STRINGS only; the record payloads are parsed inside mapInPandas and
    never shuffle (no Exchange above the Python node)."""
    import re

    from hfsa_spark.sinks.tfrecord import (
        read_tfrecord_shards,
        write_tfrecord_shards,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id bigint, text string"
    )
    spec = {"doc_id": "int64", "text": "bytes"}
    out = str(tmp_path / "tfr")
    write_tfrecord_shards(df, out, spec, n_shards=4)
    back = read_tfrecord_shards(spark, out, spec)
    plan = explain_str(back, "formatted")
    # exactly one exchange, and it is the tiny path-list round-robin —
    # NOT a hash/range shuffle of record data
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1
    assert "RoundRobinPartitioning" in plan
    # payload parse happens in exactly one Arrow Python node
    assert len(re.findall(r"\(\d+\) MapInPandas\b", plan)) == 1
    assert back.count() == 40


def test_bucketed_cow_read_path_plan(spark, tmp_path):
    """q212's read side (lifecycle gate → pytest evidence): resolving a
    bucketed snapshot unions manifest-referenced bucket files in ONE
    parquet scan with zero exchanges — untouched buckets are read in
    place across version directories."""
    import re

    from pyspark.sql import functions as F

    from hfsa_spark.streaming.cdc import (
        apply_change_batch_bucketed,
        init_snapshot_bucketed,
        latest_snapshot_bucketed,
    )

    base = spark.createDataFrame(
        [(k, f"v{k}") for k in range(64)], "k bigint, v string"
    )
    snap = str(tmp_path / "snap")
    init_snapshot_bucketed(base, snap, ["k"], n_buckets=8)
    ch = spark.createDataFrame(
        [(7, "x", "U", 1)], "k bigint, v string, op string, ts int"
    )
    apply_change_batch_bucketed(ch, snap, batch_id=0)
    final = latest_snapshot_bucketed(spark, snap)
    plan = explain_str(final, "formatted")
    assert "Exchange" not in plan
    # one multi-path scan node, not N per-bucket scans unioned
    assert len(re.findall(r"\(\d+\) Scan parquet\b", plan)) == 1
    assert final.count() == 64
