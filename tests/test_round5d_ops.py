"""Round-5d operators: gopher_rules, URL canonicalization/dedup,
inter-document shingle repetition."""

from __future__ import annotations

from pyspark.sql import functions as F


# ----------------------------------------------------------- gopher_rules --
def test_gopher_rules_flags_each_rule_independently(spark):
    from hfsa_spark.operators.text import gopher_rules

    good = " ".join(
        "the quick brown fox jumps over that lazy dog with energy and grace"
        .split()
        * 5
    )  # 60 words, all alpha, stopword-rich
    rows = [
        (0, good),
        (1, "short doc"),  # fails r_wordcount
        (2, good + " " + "#" * 40),  # symbol soup -> fails r_symbol
        (3, "\n".join("- bullet line %d the of and that" % i for i in range(10))),
        (4, " ".join(str(i) for i in range(60))),  # all-numeric words
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in gopher_rules(df).collect()}
    assert out[0].keep
    assert not out[1].r_wordcount and not out[1].keep
    assert not out[2].r_symbol
    assert not out[3].r_bullet
    assert not out[4].r_alpha and not out[4].r_stopwords


def test_gopher_rules_ellipsis_and_mean_wlen(spark):
    from hfsa_spark.operators.text import gopher_rules

    ell = "\n".join("a line that trails off..." for _ in range(10))
    longw = " ".join("pneumonoultramicroscopic" for _ in range(60))
    df = spark.createDataFrame(
        [(0, ell), (1, longw)], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in gopher_rules(df).collect()}
    assert not out[0].r_ellipsis  # 100% ellipsis lines > 30%
    assert not out[1].r_mean_wlen  # mean word length 24 > 10


# ------------------------------------------------------- canonicalize_url --
def test_canonicalize_url_rules(spark):
    from hfsa_spark.operators.text import canonicalize_url

    cases = [
        ("HTTP://Example.COM:80/a/", "http://example.com/a"),
        ("https://example.com:443/a?utm_source=x", "https://example.com/a"),
        ("https://example.com/a#frag", "https://example.com/a"),
        (
            "https://example.com/a?utm_medium=y&q=1",
            "https://example.com/a?q=1",
        ),
        ("http://example.com/", "http://example.com/"),  # root slash kept
        ("http://example.com:8080/x", "http://example.com:8080/x"),
        # no parseable scheme:// — pass through unchanged, never collapse
        # unrelated URLs onto '://...'
        ("/relative/path?utm_source=x", "/relative/path?utm_source=x"),
        ("example.com/bare-host", "example.com/bare-host"),
        ("not a url at all", "not a url at all"),
    ]
    df = spark.createDataFrame(cases, ["url", "expected"])
    out = df.select("expected", canonicalize_url("url").alias("got")).collect()
    for r in out:
        assert r.got == r.expected, (r.expected, r.got)


def test_url_dedup_profile_groups_variants(spark):
    from hfsa_spark.operators.text import url_dedup_profile

    rows = [
        (1, "HTTP://A.com:80/x"),
        (2, "http://a.com/x"),
        (3, "http://a.com/x#f"),
        (4, "http://a.com/y"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    out = {r.canonical_url: r for r in url_dedup_profile(df).collect()}
    assert out["http://a.com/x"].n_variants == 3
    assert out["http://a.com/x"].n_spellings == 3
    assert out["http://a.com/x"].keeper_id == 1
    assert out["http://a.com/y"].n_variants == 1


# ------------------------------------------- interdoc_shingle_repetition --
def test_interdoc_repetition_detects_boilerplate(spark):
    from hfsa_spark.operators.dedup import interdoc_shingle_repetition

    boiler = "all rights reserved copyright two thousand"
    rows = [
        (0, "unique alpha beta gamma delta epsilon zeta " + boiler),
        (1, "other omega psi chi phi upsilon tau " + boiler),
        (2, "totally distinct words nothing shared here at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r
        for r in interdoc_shingle_repetition(df, shingle_n=5).collect()
    }
    assert out[0].n_shared >= 2  # the shared boilerplate 5-grams
    assert out[2].n_shared == 0 and out[2].shared_micro == 0
    assert 0 < out[0].shared_micro < 1_000_000


def test_interdoc_repetition_short_docs_emit_rows(spark):
    from hfsa_spark.operators.dedup import interdoc_shingle_repetition

    df = spark.createDataFrame(
        [(0, "tiny doc"), (1, "tiny doc"), (2, "different")],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in interdoc_shingle_repetition(df, shingle_n=5).collect()
    }
    assert set(out) == {0, 1, 2}
    # degenerate whole-doc shingle shared between docs 0 and 1
    assert out[0].n_shared == 1 and out[1].n_shared == 1
    assert out[0].shared_micro == 1_000_000
