"""ANN scale probe: drive the Arrow IVF/PQ pipeline at 1M vectors — the
regime the gate's 2k-vector embeddings table can't exercise — and print
one JSON line of wall times + throughputs.

What it demonstrates for the 100 TB posture:
* vectors are GENERATED distributed (no driver materialization),
* IVF assignment and PQ encode are the BLAS Arrow kernels (the scale
  paths; the literal-expression twins exist for oracle exactness),
* the ADC query probes the persisted (list_id, codes) index shape.

Usage:
    python scripts/ann_scale_probe.py [n_vectors] [dim]     # kernel timings
    python scripts/ann_scale_probe.py recall [n] [dim]      # recall@10 curve

The recall mode measures approximation QUALITY: recall@10 of every
approximate path (IVF at n_probe 1/4/16, sign-bit LSH, PQ-ADC with seed
and k-means-trained codebooks, IVF-PQ) against the exact_topk_arrow brute
force on a clustered synthetic corpus — the number the similarity stack
is ultimately judged by.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hfsa_spark import get_spark
from hfsa_spark.operators.similarity import (
    ivf_assign_arrow,
    pq_adc_topk_arrow,
    pq_encode_arrow,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_lists = 1000
    m, k_codes = 8, 256

    spark = get_spark("ann_scale_probe")
    timings: dict[str, float] = {}

    def run(name: str, thunk) -> None:
        t0 = time.perf_counter()
        thunk()
        timings[name] = round(time.perf_counter() - t0, 2)

    # deterministic synthetic corpus, generated executor-side (element j of
    # vector i = integer hash mapped to [-1, 1)) and MATERIALIZED as
    # parquet once — stages below read the stored corpus, as a real
    # pipeline would, so timings measure the kernels, not the generator
    corpus_path = f"/tmp/ann_probe_corpus_{n}_{dim}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        vec_expr = (
            f"transform(sequence(1, {dim}),"
            f" j -> cast(pmod(hash(id * {dim} + j), 10007) as double) / 5003.5 - 1.0)"
        )
        run(
            "generate_corpus",
            lambda: spark.range(n)
            .select(F.col("id").alias("vec_id"), F.expr(vec_expr).alias("embedding"))
            .write.mode("overwrite")
            .parquet(corpus_path),
        )
    corpus = spark.read.parquet(corpus_path)

    # centroids / codebooks from the first rows (deterministic seeds)
    seeds = corpus.filter(F.col("vec_id") < max(n_lists, k_codes)).collect()
    cmat = [list(r["embedding"]) for r in seeds[:n_lists]]
    cids = [int(r["vec_id"]) for r in seeds[:n_lists]]
    d0 = dim // m
    books = [
        [list(r["embedding"][mm * d0 : (mm + 1) * d0]) for r in seeds[:k_codes]]
        for mm in range(m)
    ]

    run("ivf_assign_1m", lambda: ivf_assign_arrow(corpus, cmat, cids).write.format("noop").mode("overwrite").save())
    run("pq_encode_1m", lambda: pq_encode_arrow(corpus, books).write.format("noop").mode("overwrite").save())

    # stored-index shape: codes persisted once, ADC probes read them back
    codes_path = f"/tmp/ann_probe_codes_{n}_{dim}"
    run(
        "pq_index_write_1m",
        lambda: pq_encode_arrow(corpus, books)
        .write.mode("overwrite")
        .parquet(codes_path),
    )
    codes = spark.read.parquet(codes_path)
    queries = corpus.filter(F.col("vec_id") < 3)
    run("adc_topk_1m", lambda: pq_adc_topk_arrow(codes, queries, books, k=10).collect())

    out = {
        "n_vectors": n,
        "dim": dim,
        "n_lists": n_lists,
        "pq": f"{m}x{k_codes}",
        "timings_s": timings,
        "ivf_vectors_per_s": round(n / timings["ivf_assign_1m"]),
        "pq_vectors_per_s": round(n / timings["pq_encode_1m"]),
    }
    print(json.dumps(out))


def _recall_at_k(approx_df, gt: dict[int, list[int]], k: int) -> float:
    """Mean |approx ∩ exact| / k over queries."""
    got: dict[int, set[int]] = {}
    for r in approx_df.collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return round(
        sum(len(got.get(q, set()) & set(ids)) / k for q, ids in gt.items())
        / len(gt),
        4,
    )


def _gt(corpus, queries, k: int, metric: str) -> dict[int, list[int]]:
    from hfsa_spark.operators.similarity import exact_topk_arrow

    out: dict[int, list[int]] = {}
    for r in exact_topk_arrow(corpus, queries, k=k, metric=metric).collect():
        out.setdefault(r["query_id"], []).append(r["neighbor_id"])
    return out


def recall_main(n: int = 100_000, dim: int = 64, noise: float = 0.5) -> None:
    from pyspark.sql import functions as F  # noqa: F811

    from hfsa_spark.operators.similarity import (
        cosine_topk_lsh,
        ivf_topk,
        ivfpq_index_arrow,
        ivfpq_topk,
        ivfpq_topk_arrow,
        pq_adc_rerank_topk,
        pq_adc_topk_arrow,
        pq_codebooks_from_seeds,
        pq_encode_arrow,
        pq_train,
        synthesize_clustered_embeddings,
    )

    k = 10
    spark = get_spark("ann_recall_probe")
    path = f"/tmp/ann_recall_corpus_{n}_{dim}_{noise}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        synthesize_clustered_embeddings(spark, n, dim, noise=noise).write.mode(
            "overwrite"
        ).parquet(path)
    corpus = spark.read.parquet(path)
    queries = corpus.filter(F.col("vec_id") < 16)

    t0 = time.perf_counter()
    gt_cos = _gt(corpus, queries, k, "cosine")
    gt_l2 = _gt(corpus, queries, k, "l2")
    bf_s = round(time.perf_counter() - t0, 2)

    recalls: dict[str, float] = {}
    costs: dict[str, float] = {}

    def run(name: str, thunk, gt) -> None:
        t = time.perf_counter()
        recalls[name] = _recall_at_k(thunk(), gt, k)
        costs[name] = round(time.perf_counter() - t, 2)

    stride = max(1, n // 1000)  # ≈1000 inverted lists (√N-ish regime)
    for n_probe in (1, 4, 16):
        run(
            f"ivf_nprobe{n_probe}",
            lambda np_=n_probe: ivf_topk(
                corpus, queries, k=k, n_probe=np_, centroid_stride=stride
            ),
            gt_cos,
        )
    run(
        "lsh_8bit",
        lambda: cosine_topk_lsh(corpus, queries, k=k, lsh_dims=list(range(8))),
        gt_cos,
    )

    m, k_codes = 8, 256
    seeds = pq_codebooks_from_seeds(corpus, m=m, num_codes=k_codes)
    run(
        "pq_adc_seed",
        lambda: pq_adc_topk_arrow(
            pq_encode_arrow(corpus, seeds), queries, seeds, k=k
        ),
        gt_l2,
    )
    t = time.perf_counter()
    trained = pq_train(corpus, m=m, num_codes=k_codes, iters=3)
    train_s = round(time.perf_counter() - t, 2)
    run(
        "pq_adc_trained",
        lambda: pq_adc_topk_arrow(
            pq_encode_arrow(corpus, trained), queries, trained, k=k
        ),
        gt_l2,
    )
    # the production composition: ADC shortlist + exact re-rank
    for depth in (100, 300):
        run(
            f"pq_adc_trained_rerank{depth}",
            lambda d=depth: pq_adc_rerank_topk(
                corpus, pq_encode_arrow(corpus, trained), queries, trained,
                k=k, depth=d,
            ),
            gt_l2,
        )

    # the PRODUCTION IVF-PQ: one-scan Arrow index over the FULL corpus
    # (trained books, ~1000 stride centroids), pruned ADC probing, exact
    # rerank on top — the path a real deployment runs
    cent_rows = corpus.filter(F.col("vec_id") % stride == 0).collect()
    cmat = [list(r["embedding"]) for r in cent_rows]
    cids = [int(r["vec_id"]) for r in cent_rows]
    t = time.perf_counter()
    idx = ivfpq_index_arrow(corpus, cmat, cids, trained).localCheckpoint(eager=True)
    index_s = round(time.perf_counter() - t, 2)
    run(
        "ivfpq_arrow_np16",
        lambda: ivfpq_topk_arrow(idx, queries, trained, cmat, cids, k=k, n_probe=16),
        gt_l2,
    )
    run(
        "ivfpq_arrow_np16_rerank300",
        lambda: ivfpq_topk_arrow(
            idx, queries, trained, cmat, cids, k=k, n_probe=16,
            corpus=corpus, rerank_depth=300,
        ),
        gt_l2,
    )

    # IVF-PQ literal-expression composition (the gate's oracle twin) —
    # probes a smaller corpus slice at small codebooks; label carries n
    ivfpq_n = min(n, 20_000)
    sub = corpus.filter(F.col("vec_id") < ivfpq_n)
    sub_gt = _gt(sub, queries, k, "l2")
    books_s = pq_codebooks_from_seeds(sub, m=4, num_codes=16)
    for n_probe in (4, 16):
        run(
            f"ivfpq_{ivfpq_n // 1000}k_nprobe{n_probe}",
            lambda np_=n_probe: ivfpq_topk(
                sub, queries, books_s, k=k, n_probe=np_,
                centroid_stride=max(1, ivfpq_n // 100),
            ),
            sub_gt,
        )

    print(
        json.dumps(
            {
                "probe": "recall@10",
                "n_vectors": n,
                "dim": dim,
                "n_queries": 16,
                "bruteforce_gt_s": bf_s,
                "pq_train_s": train_s,
                "ivfpq_index_build_s": index_s,
                "recall": recalls,
                "query_cost_s": costs,
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "recall":
        recall_main(
            int(sys.argv[2]) if len(sys.argv) > 2 else 100_000,
            int(sys.argv[3]) if len(sys.argv) > 3 else 64,
            float(sys.argv[4]) if len(sys.argv) > 4 else 0.5,
        )
    else:
        main()
