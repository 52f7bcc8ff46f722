"""Behavioral tests for the round-5 data-selection operators: DSIR
importance scores (target-tilted log-weights) and SemDedup semantic
dedup (cluster-local cosine dropping, min-id keeper)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_dsir_scores_tilt_toward_target(spark):
    from hfsa_spark.operators.text import dsir_scores

    # target-only vocabulary vs source-only vocabulary: docs written in
    # the target's words must outscore docs written in the source's
    rows = [
        (1, "alpha beta alpha beta", "tgt"),
        (2, "alpha beta gamma alpha", "tgt"),
        (3, "delta epsilon zeta delta", "src"),
        (4, "delta zeta zeta epsilon", "src"),
        (5, "alpha beta alpha alpha", "src"),   # target-like but in source
        (6, "", "src"),                          # empty doc keeps a row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, kind string")
    out = {r["doc_id"]: r for r in
           dsir_scores(df, df.filter(F.col("kind") == "tgt")).collect()}
    assert len(out) == 6
    assert out[6]["n_tokens"] == 0 and out[6]["logw_micro"] == 0
    # target-word docs score higher than source-word docs
    assert out[5]["logw_micro"] > out[3]["logw_micro"]
    assert out[1]["logw_micro"] > out[4]["logw_micro"]


def test_semantic_dedup_keeps_min_id_per_neighborhood(spark):
    from hfsa_spark.operators.similarity import semantic_dedup

    def v(x, y):
        return [float(x), float(y), 0.0, 0.0]

    # ids 0 and 25 are the stride-25 centroids; 0/1/2 are near-identical
    # (cosine ≈ 1 → 1 and 2 drop, 0 keeps); 25/26 point elsewhere and
    # differ enough to both survive a 0.95 cut
    rows = [
        (0, v(1.0, 0.0)),
        (1, v(1.0, 0.01)),
        (2, v(1.0, 0.02)),
        (25, v(0.0, 1.0)),
        (26, v(0.5, 1.0)),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["id"]: r for r in semantic_dedup(emb, threshold=0.95).collect()}
    assert out[0]["keep"] and not out[1]["keep"] and not out[2]["keep"]
    assert out[25]["keep"] and out[26]["keep"]
    # cluster assignment: 26 leans toward centroid 25? both its coords —
    # cos(26, c25) ≈ 0.89 > cos(26, c0) ≈ 0.45
    assert out[26]["cluster"] == 25
    assert out[1]["cluster"] == 0


def test_nb_classifier_separable_corpus(spark):
    from hfsa_spark.operators.text import nb_train_classify

    # two classes with disjoint vocabularies -> resubstitution must be
    # perfect; a doc with no tokens gets predicted = null, match = false
    rows = [
        (1, "apple banana apple", "fruit"),
        (2, "banana cherry cherry", "fruit"),
        (3, "bolt nut bolt washer", "tool"),
        (4, "washer nut nut", "tool"),
        (5, "", "tool"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in nb_train_classify(df).collect()}
    assert all(out[i]["match"] for i in (1, 2, 3, 4))
    assert out[5]["predicted"] is None and out[5]["match"] is False


def test_bm25_ranks_relevant_docs_first(spark):
    from hfsa_spark.operators.text import bm25_topk

    rows = [
        (1, "cat cat cat dog"),        # heavy 'cat'
        (2, "cat dog dog dog"),        # one 'cat'
        (3, "bird bird bird bird"),    # no match
        (4, "cat"),                    # short doc: length norm boosts it
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(df, [(0, "cat")], k=10).collect()
    ids = [r["doc_id"] for r in out]
    assert 3 not in ids                     # non-matching doc absent
    assert ids[0] in (1, 4)                 # tf-heavy or length-normalized win
    assert ids.index(2) == len(ids) - 1     # weakest match ranks last
    assert [r["rank"] for r in out] == list(range(1, len(ids) + 1))
    # multi-term query sums components
    out2 = bm25_topk(df, [(1, "cat"), (1, "dog")], k=10).collect()
    got = {r["doc_id"]: r["score_micro"] for r in out2}
    assert got[2] > 0 and 3 not in got
