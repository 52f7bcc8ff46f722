"""ANN scale probe: drive the Arrow IVF/PQ pipeline at 1M vectors — the
regime the gate's 2k-vector embeddings table can't exercise — and print
one JSON line of wall times + throughputs.

What it demonstrates for the 100 TB posture:
* vectors are GENERATED distributed (no driver materialization),
* IVF assignment and PQ encode are the BLAS Arrow kernels (the scale
  paths; the literal-expression twins exist for oracle exactness),
* the ADC query probes the persisted (list_id, codes) index shape.

Usage: python scripts/ann_scale_probe.py [n_vectors] [dim]
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


if __name__ == "__main__":
    main()
