"""Property-based checks (hypothesis) for the IVF maintenance lifecycle
(VERDICT r11 stretch 8): under ANY interleaving of batch appends, batch
replays, and compactions, the index must serve results identical to a
from-scratch one-shot index over whatever subset has arrived — at EVERY
step, not just at the end (the deterministic tests in
test_streaming_vectors.py pin single fixed sequences; this drives random
ones, the way test_properties_cdc.py drives the CDC maintenance stack).

Semantics under test (hfsa_spark/streaming/vectors.py):
* append  — index_vector_batch(batch_id=b): idempotent dynamic overwrite
  of ingest_batch_id=b; assignment is a pure function of (vector,
  frozen centroids), so arrival ORDER must never matter;
* replay  — re-running an already-applied batch id must be a no-op in
  content (the q93/q164/q205 exactly-once protocol);
* compact — compact_ivf_index is write-to-NEW-dir (the source stays
  serveable throughout): the compacted index must answer identically,
  and the source must keep accepting appends afterwards.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_FAST = settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_N = 48  # corpus size: every 8th vector is a centroid -> 6 lists
_N_BATCHES = 3


def _topk(spark, path, qs, limit):
    """Serve rows as a comparable set (expr_centroid_limit exercises the
    expression scorer at 32 and the Arrow kernel at 0)."""
    from hfsa_spark.operators.similarity import ivf_topk_indexed

    return sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in ivf_topk_indexed(
            spark, path, qs, k=3, n_probe=2, expr_centroid_limit=limit
        ).collect()
    )


@_FAST
@given(
    # which batch each vector belongs to (arbitrary, possibly empty ones)
    st.lists(
        st.integers(min_value=0, max_value=_N_BATCHES - 1),
        min_size=_N, max_size=_N,
    ),
    # arrival order of the batches
    st.permutations(list(range(_N_BATCHES))),
    # after each arrival: 0 = continue, 1 = serve-check, 2 = replay a
    # random earlier batch then serve-check, 3 = compact then serve-check
    st.lists(
        st.integers(min_value=0, max_value=3),
        min_size=_N_BATCHES, max_size=_N_BATCHES,
    ),
    # 32 -> expression scorer path, 0 -> Arrow-kernel assignment path
    st.sampled_from([32, 0]),
)
def test_ivf_lifecycle_any_interleaving_serves_like_rebuild(
    spark, tmp_path_factory, assignment, order, actions, expr_limit
):
    from hfsa_spark.operators.similarity import (
        _collect_centroids,
        synthesize_clustered_embeddings,
        write_ivf_index,
    )
    from hfsa_spark.streaming.vectors import (
        compact_ivf_index,
        index_vector_batch,
        init_ivf_index,
    )

    # pin the first _N_BATCHES vectors to distinct batches so every batch
    # is non-empty: an index with zero data partitions is unreadable
    # (schema inference), and "serve an empty index" is not the property
    # under test
    assignment = list(assignment)
    for i in range(_N_BATCHES):
        assignment[i] = i

    tmp = tmp_path_factory.mktemp("ivf_prop")
    emb = synthesize_clustered_embeddings(spark, _N, dim=8).cache()
    cents = emb.filter(F.col("vec_id") % 8 == 0)
    qs = emb.filter(F.col("vec_id").isin(0, 1, 2))

    # hypothesis-drawn vector->batch assignment, evaluated Spark-side so
    # the batches are DataFrames like a real feed's micro-batches
    amap = F.array(*[F.lit(b) for b in assignment])
    labeled = emb.withColumn(
        "__b", F.element_at(amap, F.col("vec_id").cast("int") + 1)
    )

    idx = str(tmp / "grown")
    init_ivf_index(cents, idx)
    cent_rows = _collect_centroids(
        spark.read.parquet(f"{idx}/_centroids"), "centroid_id", "vec"
    )

    arrived: list[int] = []
    n_compacts = 0

    def check(serve_path):
        """Serving from serve_path must equal a from-scratch one-shot
        index over exactly the arrived subset (same frozen centroids)."""
        sub = labeled.filter(
            F.col("__b").isin([int(b) for b in arrived])
        ).select("vec_id", "embedding")
        rebuilt = str(tmp / f"rebuild_{len(arrived)}_{n_compacts}")
        write_ivf_index(
            sub, rebuilt, centroids=cents, expr_centroid_limit=expr_limit
        )
        got = _topk(spark, serve_path, qs, expr_limit)
        want = _topk(spark, rebuilt, qs, expr_limit)
        assert got == want, (
            f"arrived={arrived} order={order} actions={actions}"
            f" expr_limit={expr_limit}: grown/compacted index diverged"
            f" from the from-scratch rebuild"
        )

    for step, b in enumerate(order):
        index_vector_batch(
            labeled.filter(F.col("__b") == int(b)).select(
                "vec_id", "embedding"
            ),
            idx, batch_id=int(b),
            expr_centroid_limit=expr_limit, cent_rows=cent_rows,
        )
        arrived.append(int(b))
        act = actions[step]
        if act == 0:
            continue
        if act == 2:  # replay an already-applied batch: content no-op
            rb = arrived[step % len(arrived)]
            index_vector_batch(
                labeled.filter(F.col("__b") == int(rb)).select(
                    "vec_id", "embedding"
                ),
                idx, batch_id=int(rb),
                expr_centroid_limit=expr_limit, cent_rows=cent_rows,
            )
        if act == 3:  # compact to a new dir; source stays appendable
            n_compacts += 1
            compacted = str(tmp / f"compacted_{n_compacts}")
            compact_ivf_index(spark, idx, compacted)
            check(compacted)
        check(idx)

    # final invariant regardless of drawn serve points
    check(idx)
