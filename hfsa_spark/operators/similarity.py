"""Similarity search over embedding columns (``array<float>``).

Beyond-reference surface (SURVEY.md §7 phase 4): brute-force cosine top-k
as the exact baseline, and a sign-bit LSH bucketed variant as the scale
path.

Scale design:
* the **query side is broadcast** (queries are few; the corpus is the
  100 TB side) — the corpus is scanned once, never shuffled.
* dot products run as ``aggregate(zip_with(...))`` higher-order
  expressions — JVM-side, whole-stage codegen, no Python in the loop.
* top-k per query is a window over (query, score) — with the broadcast
  join, the only shuffle is the final per-query top-k, whose input is
  already reduced to (query_id, corpus_id, score).
* the LSH variant buckets both sides by sign bits of selected dimensions;
  probing scans only matching buckets (a partition-prunable predicate if
  the corpus is written bucketed/partitioned by the signature).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hfsa_spark.plans import parallelize_compute


def dot(a: Column | str, b: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(ca, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, cos_sim, rank), rank 1..k, ties broken
    by neighbor id asc for determinism. Self-matches excluded.
    """
    # norms precomputed per side: the query norm would otherwise be
    # re-folded for every (query, corpus-row) pair
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        l2_norm(vec_col).alias("__qnorm"),
    )
    c = parallelize_compute(corpus.select(id_col, vec_col)).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        l2_norm(vec_col).alias("__cnorm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", dot("__qvec", "__cvec") / (F.col("__qnorm") * F.col("__cnorm")))
        .select("query_id", "neighbor_id", "cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def sign_lsh_bucket(vec: Column | str, dims: list[int]) -> Column:
    """Signature int from the sign bits of the selected dimensions
    (element_at is 1-based). 4 dims → 16 buckets; at scale use 8-12 dims
    and write the corpus partitioned by this column for pruned probes."""
    v = F.col(vec) if isinstance(vec, str) else vec
    sig = F.lit(0)
    for i, d in enumerate(dims):
        sig = sig + F.when(F.element_at(v, d + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return sig


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lsh_dims: list[int] | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos_sim ≥
    threshold): the dedup-by-embedding primitive — feed the output to
    :func:`hfsa_spark.operators.dedup.connected_components` for groups.

    Candidate generation is the sign-bit LSH bucket (near-identical vectors
    share all sign bits, so recall at high thresholds is excellent); the
    self-join shuffles on the bucket key — never a global cross join — and
    exact cosine verifies each candidate. More dims → smaller buckets →
    fewer candidates; at corpus scale write the table partitioned by the
    signature so the join is partition-local.
    """
    dims = lsh_dims or [0, 1, 2, 3]
    sided = parallelize_compute(corpus.select(id_col, vec_col)).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        l2_norm(vec_col).alias("norm"),
        sign_lsh_bucket(vec_col, dims).alias("bucket"),
    )
    a, b = sided.alias("a"), sided.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
        )
        .withColumn(
            "cos_sim",
            dot(F.col("a.vec"), F.col("b.vec")) / (F.col("a.norm") * F.col("b.norm")),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cos_sim")
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lsh_dims: list[int] | None = None,
) -> DataFrame:
    """Approximate top-k: probe only the query's sign-bit bucket.

    Same output shape as :func:`cosine_topk`. Recall depends on bucket
    granularity; the benchmark compares both.
    """
    dims = lsh_dims or [0, 1, 2, 3]
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        l2_norm(vec_col).alias("__qnorm"),
        sign_lsh_bucket(vec_col, dims).alias("__bucket"),
    )
    c = parallelize_compute(corpus.select(id_col, vec_col)).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        l2_norm(vec_col).alias("__cnorm"),
        sign_lsh_bucket(vec_col, dims).alias("__bucket"),
    )
    scored = (
        c.join(F.broadcast(q), ["__bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", dot("__qvec", "__cvec") / (F.col("__qnorm") * F.col("__cnorm")))
        .select("query_id", "neighbor_id", "cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )
