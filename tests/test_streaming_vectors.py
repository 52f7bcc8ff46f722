"""Streaming IVF index maintenance: batch-split invariance vs the
one-shot index, replay idempotency, frozen-centroid discipline."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _corpus(spark, n=120):
    from hfsa_spark.operators.similarity import synthesize_clustered_embeddings

    return synthesize_clustered_embeddings(spark, n, dim=16).cache()


def test_streaming_index_equals_one_shot(spark, tmp_path):
    from hfsa_spark.operators.similarity import (
        ivf_topk_indexed,
        write_ivf_index,
    )
    from hfsa_spark.streaming.vectors import index_vector_batch, init_ivf_index

    emb = _corpus(spark)
    cents = emb.filter(F.col("vec_id") % 20 == 0)

    one_shot = str(tmp_path / "oneshot")
    write_ivf_index(emb, one_shot, centroids=cents)

    grown = str(tmp_path / "grown")
    init_ivf_index(cents, grown)
    for b in range(3):
        index_vector_batch(
            emb.filter(F.col("vec_id") % 3 == b), grown, batch_id=b
        )

    qs = emb.filter(F.col("vec_id") < 3)
    a = ivf_topk_indexed(spark, one_shot, qs, k=5, n_probe=2).collect()
    b = ivf_topk_indexed(spark, grown, qs, k=5, n_probe=2).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted([(r["query_id"], r["rank"], r["neighbor_id"]) for r in a]) == \
           sorted([(r["query_id"], r["rank"], r["neighbor_id"]) for r in b])


def test_index_batch_replay_idempotent(spark, tmp_path):
    from hfsa_spark.streaming.vectors import BATCH_ID_COL, index_vector_batch, init_ivf_index

    emb = _corpus(spark)
    idx = str(tmp_path / "idx")
    init_ivf_index(emb.filter(F.col("vec_id") % 20 == 0), idx)
    b0 = emb.filter(F.col("vec_id") % 2 == 0)
    b1 = emb.filter(F.col("vec_id") % 2 == 1)
    index_vector_batch(b0, idx, batch_id=0)
    index_vector_batch(b1, idx, batch_id=1)
    before = sorted(
        (r["id"], r["list_id"], r[BATCH_ID_COL])
        for r in spark.read.parquet(idx).collect()
    )
    # replay batch 0: rewrites only its own partitions, identical content
    index_vector_batch(b0, idx, batch_id=0)
    after = sorted(
        (r["id"], r["list_id"], r[BATCH_ID_COL])
        for r in spark.read.parquet(idx).collect()
    )
    assert before == after
    assert len(before) == 120
    # centroids remain frozen and out of partition discovery
    assert os.path.isdir(os.path.join(idx, "_centroids"))


def test_compact_ivf_index_preserves_answers(spark, tmp_path):
    from hfsa_spark.operators.similarity import ivf_topk_indexed
    from hfsa_spark.streaming.vectors import (
        compact_ivf_index,
        index_vector_batch,
        init_ivf_index,
    )

    emb = _corpus(spark)
    idx = str(tmp_path / "grown")
    init_ivf_index(emb.filter(F.col("vec_id") % 20 == 0), idx)
    for b in range(4):
        index_vector_batch(emb.filter(F.col("vec_id") % 4 == b), idx, batch_id=b)

    flat = str(tmp_path / "flat")
    compact_ivf_index(spark, idx, flat)

    qs = emb.filter(F.col("vec_id") < 3)
    a = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in ivf_topk_indexed(spark, idx, qs, k=5, n_probe=2).collect()
    )
    b = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in ivf_topk_indexed(spark, flat, qs, k=5, n_probe=2).collect()
    )
    assert a == b
    # layout really is flat: no batch-segment partition level remains
    import os
    top = [d for d in os.listdir(flat) if not d.startswith(("_", "."))]
    assert all(d.startswith("list_id=") for d in top)
