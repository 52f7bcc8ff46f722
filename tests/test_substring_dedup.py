"""Exact-substring dedup (duplicate_substring_spans / duplicate_char_ratio):
span detection, maximality, within-doc repeats, stride sampling, and the
short-document / no-duplicate edge cases."""

from __future__ import annotations

from hfsa_spark.operators.dedup import (
    duplicate_char_ratio,
    duplicate_substring_spans,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def _spans(spark, texts, **kw):
    out = duplicate_substring_spans(_docs(spark, texts), "doc_id", "text", **kw)
    return sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_len) for r in out.collect()
    )


def test_shared_substring_detected_in_both_docs(spark):
    shared = "the quick brown fox jumps over the lazy dog"  # 43 chars
    # flanks share no characters, so the maximal common substring is
    # exactly `shared` (a shared space in the flanks would extend it)
    texts = ["AAA" + shared + "BBB", "CCCC" + shared + "DD", "unrelated text entirely"]
    got = _spans(spark, texts, gram=10, min_len=20)
    # span covers exactly the shared region in each doc (1-based, inclusive)
    assert (0, 4, 4 + len(shared) - 1, len(shared)) in got
    assert (1, 5, 5 + len(shared) - 1, len(shared)) in got
    assert all(d != 2 for d, *_ in got)


def test_spans_are_maximal_and_disjoint(spark):
    shared = "x" * 30
    texts = [shared + "abcdefghij" + shared, "padpad" + shared + "padpad"]
    got = _spans(spark, texts, gram=10, min_len=10)
    for doc in (0, 1):
        spans = [(s, e) for d, s, e, _ in got if d == doc]
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 < s2  # disjoint, no touching merge missed


def test_within_doc_repeat_counts(spark):
    # the duplicated window occurs twice in ONE doc only
    t = "X" * 25 + "-middle-" + "X" * 25
    got = _spans(spark, [t, "totally different content here"], gram=10, min_len=10)
    assert any(d == 0 for d, *_ in got)
    assert all(d == 0 for d, *_ in got)


def test_min_len_filter(spark):
    shared = "s" * 24
    texts = ["aa" + shared + "bb", "cc" + shared + "dd"]
    assert _spans(spark, texts, gram=10, min_len=25) == []
    assert len(_spans(spark, texts, gram=10, min_len=24)) == 2


def test_short_docs_yield_no_positions(spark):
    got = _spans(spark, ["tiny", "tiny", ""], gram=10, min_len=10)
    assert got == []


def test_content_sampling_finds_unaligned_duplicates(spark):
    # doc 0 carries a 5-char prefix, so the shared region's positions
    # disagree mod 3 between the docs — content-defined sampling must
    # still find it (a positional stride would not)
    shared = "the exact same long duplicated sentence appears here" * 2
    texts = ["head " + shared + " tail", shared]
    exact = _spans(spark, texts, gram=10, min_len=40, sample_mod=1)
    coarse = _spans(spark, texts, gram=10, min_len=40, sample_mod=3)
    assert {d for d, *_ in coarse} == {0, 1}
    # sampled duplicated windows are a subset of the exact ones, and each
    # doc's exact result is a single region here, so every coarse span
    # nests inside an exact span
    for d, s, e, _ in coarse:
        assert any(d2 == d and s >= s2 and e <= e2 for d2, s2, e2, _ in exact)


def test_char_ratio_sums_disjoint_spans(spark):
    shared = "z" * 40
    t0 = shared + "-" * 10 + shared  # two 40-char spans? merged? gap of 10 > 0 so separate
    texts = [t0, shared]
    out = {
        r.doc_id: (r.n_spans, r.dup_chars, r.n_chars)
        for r in duplicate_char_ratio(
            _docs(spark, texts), "doc_id", "text", gram=10, min_len=40
        ).collect()
    }
    # doc 1 fully duplicated
    assert out[1] == (1, 40, 40)
    n_spans, dup_chars, n_chars = out[0]
    assert n_chars == 90 and dup_chars >= 80


def test_sample_mod_rejects_zero(spark):
    import pytest

    with pytest.raises(ValueError):
        duplicate_substring_spans(
            _docs(spark, ["abc"]), "doc_id", "text", sample_mod=0
        )
