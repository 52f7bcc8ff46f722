"""Tests for the training-data text-pipeline operators: repetition
profile, benchmark contamination, TF-IDF top terms (operators/text.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hfsa_spark.operators.text import (
    benchmark_contamination,
    repetition_profile,
    tfidf_top_terms,
)
from hfsa_spark.plans import uses_broadcast_join


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a a a b c"),          # top unigram 'a'×3; bigram 'a a'×2
        (2, "x y"),                # one bigram
        (3, "solo"),               # no bigrams
        (4, ""),                   # no tokens at all
        (5, "p q p q p q"),        # bigrams: 'p q'×3, 'q p'×2
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_profile_exact(docs):
    got = {r["doc_id"]: r.asDict() for r in repetition_profile(docs).collect()}
    assert got[1] == {
        "doc_id": 1, "n_tokens": 5, "n_distinct_tokens": 3,
        "top_unigram_cnt": 3, "n_bigrams": 4, "top_bigram_cnt": 2,
    }
    assert got[2]["n_bigrams"] == 1 and got[2]["top_bigram_cnt"] == 1
    assert got[3] == {
        "doc_id": 3, "n_tokens": 1, "n_distinct_tokens": 1,
        "top_unigram_cnt": 1, "n_bigrams": 0, "top_bigram_cnt": 0,
    }
    # empty doc keeps its row, all zeros
    assert got[4]["n_tokens"] == 0 and got[4]["top_bigram_cnt"] == 0
    assert got[5]["n_bigrams"] == 5 and got[5]["top_bigram_cnt"] == 3


def test_repetition_profile_partition_invariant(docs):
    a = repetition_profile(docs).orderBy("doc_id").collect()
    b = repetition_profile(docs.repartition(7)).orderBy("doc_id").collect()
    assert a == b


def test_contamination_counts(spark):
    bench = spark.createDataFrame(
        [(100, "one two three four five six")], "doc_id long, text string"
    )
    cand = spark.createDataFrame(
        [
            # shares the 5-grams starting at 'one' and 'two'
            (1, "one two three four five six seven"),
            (2, "nothing in common here at all"),
            (3, "tiny"),  # short-doc fallback shingle, not in benchmark
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in benchmark_contamination(cand, bench, shingle_n=5).collect()
    }
    assert got[1] == {"doc_id": 1, "n_shingles": 3, "n_contaminated": 2}
    assert got[2]["n_contaminated"] == 0 and got[2]["n_shingles"] == 2
    assert got[3] == {"doc_id": 3, "n_shingles": 1, "n_contaminated": 0}


def test_contamination_broadcasts_benchmark(spark):
    bench = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    cand = spark.createDataFrame([(2, "a b c d e f")], "doc_id long, text string")
    assert uses_broadcast_join(benchmark_contamination(cand, bench))


def test_tfidf_top_terms(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry date"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, k=2).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 'apple' df=1 tf=2/3 → top; 'banana' df=2 second
    assert [r["term"] for r in by_doc[1]] == ["apple", "banana"]
    assert by_doc[1][0]["tf"] == 2 and by_doc[1][0]["df"] == 1
    expected = (2.0 / 3.0) * math.log(3.0 / 1.0)
    assert by_doc[1][0]["score"] == pytest.approx(expected, abs=1e-12)
    # doc 3: 'date' (df=1, tf=1/4) vs 'cherry' (df=2, tf=3/4):
    # cherry 0.75*ln(1.5) > date 0.25*ln(3)
    assert [r["term"] for r in by_doc[3]] == ["cherry", "date"]
    # ranks are 1..k and deterministic
    assert all([r["rank"] for r in rs] == list(range(1, len(rs) + 1))
               for rs in by_doc.values())


def test_regex_redact_counts_and_templates(spark):
    from hfsa_spark.operators.text import regex_redact

    df = spark.createDataFrame(
        [
            (1, "user 42 bought 3 items from 10.0.0.1 (mail: a@b.co)"),
            (2, "no digits here"),
        ],
        "id long, msg string",
    )
    out = {r["id"]: r.asDict() for r in regex_redact(df, "msg").collect()}
    # email and ip are masked before bare numbers (dict order)
    assert out[1]["n_email"] == 1 and out[1]["n_ip"] == 1
    assert out[1]["n_number"] == 6  # counts on ORIGINAL text: 42,3,10,0,0,1
    assert out[1]["msg_redacted"] == (
        "user <number> bought <number> items from <ip> (mail: <email>)"
    )
    assert out[2]["msg_redacted"] == "no digits here"
    assert out[2]["n_number"] == 0


def test_salted_agg_matches_plain_groupby(spark):
    from hfsa_spark.plans import salted_agg

    df = spark.createDataFrame(
        [(k, v) for k in ("hot", "hot", "hot", "cold") for v in range(1, 26)],
        "k string, v long",
    ).repartition(8)
    got = {
        r["k"]: r.asDict()
        for r in salted_agg(
            df,
            ["k"],
            [("count", "v", "n"), ("sum", "v", "s"),
             ("min", "v", "lo"), ("max", "v", "hi")],
            salt_buckets=4,
        ).collect()
    }
    assert got["hot"] == {"k": "hot", "n": 75, "s": 3 * 325, "lo": 1, "hi": 25}
    assert got["cold"] == {"k": "cold", "n": 25, "s": 325, "lo": 1, "hi": 25}


def test_salted_agg_rejects_non_decomposable(spark):
    from hfsa_spark.plans import salted_agg

    df = spark.createDataFrame([(1, 2)], "k long, v long")
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_agg(df, ["k"], [("avg", "v", "a")])


def test_tfidf_tie_breaks_by_term(spark):
    # two terms with identical (tf, df, doc_len) → identical score; the
    # lexicographically smaller term must win rank 1 on both engines
    docs = spark.createDataFrame(
        [(1, "zeta alpha"), (2, "unrelated words")], "doc_id long, text string"
    )
    out = tfidf_top_terms(docs, k=2).filter(F.col("doc_id") == 1).collect()
    assert [r["term"] for r in out] == ["alpha", "zeta"]


def test_vocab_top_terms_counts_and_order(spark):
    from hfsa_spark.operators.text import vocab_top_terms

    rows = [(1, "a a a b b c"), (2, "a b  B x"), (3, "A c d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = vocab_top_terms(df, "text", min_count=2, k=10).collect()
    # a:5, b:4 (case-folded), c:2; d/x below min_count
    assert [(r["term"], r["n"]) for r in got] == [("a", 5), ("b", 4), ("c", 2)]


def test_vocab_top_terms_k_limit_tie_break(spark):
    from hfsa_spark.operators.text import vocab_top_terms

    df = spark.createDataFrame(
        [(1, "z z y y x x w w")], "doc_id long, text string"
    )
    got = vocab_top_terms(df, "text", min_count=1, k=3).collect()
    # equal counts → term-ascending tie-break decides the cut
    assert [r["term"] for r in got] == ["w", "x", "y"]


def test_unigram_logprob_score(spark):
    import math

    from hfsa_spark.operators.text import unigram_logprob_score

    d = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id bigint, text string"
    )
    rows = {r["doc_id"]: r for r in unigram_logprob_score(d).collect()}
    # corpus: a=2, b=2, c=1, N=5
    lp_ab = round(math.log(2 / 5) * 1e6)  # -916291
    lp_c = round(math.log(1 / 5) * 1e6)  # -1609438
    assert rows[1]["n_tokens"] == 3
    assert rows[1]["sum_logp_micro"] == 3 * lp_ab
    assert rows[2]["n_tokens"] == 2
    assert rows[2]["sum_logp_micro"] == lp_ab + lp_c


def test_hashed_linear_score(spark):
    import hashlib

    from hfsa_spark.operators.text import hashed_linear_score

    d = spark.createDataFrame(
        [(1, "Alpha beta  beta"), (2, "")], "doc_id bigint, text string"
    )
    rows = {r["doc_id"]: r for r in hashed_linear_score(d).collect()}

    def w(tok: str) -> int:
        b = int(hashlib.md5(f"7:{tok}".encode()).hexdigest()[:15], 16) % 64
        return (b % 17) - 8

    num = w("alpha") + 2 * w("beta")
    assert rows[1]["n_tokens"] == 3
    assert rows[1]["logit_num"] == num
    import math

    assert rows[1]["logit_micro"] == math.floor(num * 1e6 / 3)
    assert rows[1]["keep"] == (rows[1]["logit_micro"] >= 0)
    # empty text: zero tokens, null logit, keep=false (ANSI div-by-zero safe)
    assert rows[2]["n_tokens"] == 0
    assert rows[2]["logit_num"] == 0
    assert rows[2]["logit_micro"] is None
    assert rows[2]["keep"] is False


def test_bigram_logprob_score(spark):
    import math

    from hfsa_spark.operators.text import bigram_logprob_score

    # corpus: doc1 "a b a b", doc2 "a b c"
    # bigrams: a b (x3), b a (x1), b c (x1); heads: a→3, b→2; V=3
    d = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")], "doc_id bigint, text string"
    )
    rows = {r["doc_id"]: r for r in bigram_logprob_score(d).collect()}
    lp_ab = round(math.log((3 + 1) / (3 + 3)) * 1e6)
    lp_ba = round(math.log((1 + 1) / (2 + 4)) * 1e6)  # V=4: a,b,c,x
    lp_bc = round(math.log((1 + 1) / (2 + 4)) * 1e6)
    # recompute with V=4 (vocab includes the bigram-less doc3's token)
    lp_ab = round(math.log((3 + 1) / (3 + 4)) * 1e6)
    assert rows[1]["n_bigrams"] == 3
    assert rows[1]["sum_logp_micro"] == 2 * lp_ab + lp_ba
    assert rows[2]["n_bigrams"] == 2
    assert rows[2]["sum_logp_micro"] == lp_ab + lp_bc
    assert 3 not in rows  # no bigrams → no row


def test_char_entropy_profile(spark):
    import math

    from hfsa_spark.operators.text import char_entropy_profile

    d = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, "")],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in char_entropy_profile(d).collect()}
    # constant string → 0 bits
    assert rows[1]["entropy_nano"] == 0 and rows[1]["n_distinct_chars"] == 1
    # two equiprobable chars → 1 bit = 2 × round(0.5e9)
    assert rows[2]["entropy_nano"] == 2 * round(0.5 * 1e9)
    # four distinct → 2 bits
    assert rows[3]["entropy_nano"] == 4 * round(-(0.25) * math.log2(0.25) * 1e9)
    assert rows[3]["n_chars"] == 4
    # empty doc keeps a zero row
    assert rows[4]["n_chars"] == 0 and rows[4]["entropy_nano"] == 0


def test_pii_scan(spark):
    from hfsa_spark.operators.text import pii_scan

    d = spark.createDataFrame(
        [
            (1, "contact me at bob@corp.io or +12345678", "a"),
            (2, "server 192.168.1.1 and 10.0.0.2 up", "a"),
            (3, "clean document", "b"),
        ],
        "doc_id bigint, text string, source string",
    )
    per_doc = {r["doc_id"]: r for r in pii_scan(d).collect()}
    assert per_doc[1]["n_email"] == 1 and per_doc[1]["n_phone"] == 1
    assert per_doc[2]["n_ipv4"] == 2
    assert per_doc[3]["n_email"] == per_doc[3]["n_ipv4"] == per_doc[3]["n_phone"] == 0

    rolled = {r["source"]: r for r in pii_scan(d, group_col="source").collect()}
    assert rolled["a"]["docs_with_pii"] == 2 and rolled["a"]["n_ipv4"] == 2
    assert rolled["b"]["docs_with_pii"] == 0 and rolled["b"]["n_docs"] == 1


def test_strip_html_and_extract(spark):
    from hfsa_spark.operators.text import html_extract

    d = spark.createDataFrame(
        [
            (1, '<div class="x">Hello <b>big</b> world</div>'),
            (2, "<script>evil(1 < 2);</script>keep<style>p{}</style>this"),
            (3, "a &amp; b &lt;tag&gt; &#65; c"),
            (4, "no markup here"),
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in html_extract(d).collect()}
    assert got[1]["clean_text"] == "Hello big world"
    assert got[1]["n_tags"] == 4
    # script bodies are dropped wholesale, even containing '<'
    assert got[2]["clean_text"] == "keep this"
    assert got[2]["n_scripts"] == 1
    # entity decode: &amp; last (no double-decode), numeric → space
    assert got[3]["clean_text"] == "a & b <tag> c"
    assert got[4]["clean_text"] == "no markup here"
    assert got[4]["kept_ratio_micro"] == 1000000


def test_compression_ratio(spark):
    import zlib

    from hfsa_spark.operators.text import compression_ratio

    rep = "spam " * 200
    rnd = "".join(chr(33 + ((i * 7919) % 90)) for i in range(1000))
    d = spark.createDataFrame(
        [(1, rep), (2, rnd), (3, "")], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: r for r in compression_ratio(d).collect()}
    assert got[1]["n_bytes"] == 1000
    assert got[1]["n_compressed"] == len(zlib.compress(rep.encode(), 6))
    # repetitive text compresses an order of magnitude harder
    assert got[1]["ratio_micro"] < 100000 < got[2]["ratio_micro"]
    assert got[3]["ratio_micro"] is None and got[3]["n_compressed"] == 0


def test_extract_links(spark):
    from hfsa_spark.operators.text import extract_links

    d = spark.createDataFrame(
        [
            (1, 'see <a href="x">a</a> and <A HREF="y">b</A> and <a href="z">c</a>'),
            (2, "no links"),
        ],
        "doc_id bigint, text string",
    )
    got = [(r["src"], r["link_idx"], r["href"])
           for r in extract_links(d).orderBy("src", "link_idx").collect()]
    # lowercase href= only (case-sensitive by design — normalize upstream)
    assert got == [(1, 0, "x"), (1, 1, "z")]


def test_corpus_datasheet(spark):
    from hfsa_spark.operators.text import corpus_datasheet

    d = spark.createDataFrame(
        [
            (1, "a b c", "en"),        # 3 tokens
            (2, "a b c d e", "en"),    # 5
            (3, "a b c d e f g", "en"),  # 7
            (4, "x", "zh"),            # 1
        ],
        "doc_id bigint, text string, lang string",
    )
    got = {r["lang"]: r for r in corpus_datasheet(d).collect()}
    en = got["en"]
    assert en["n_docs"] == 3 and en["n_tokens"] == 15
    assert en["p50_tokens"] == 5.0
    assert abs(en["p90_tokens"] - (5 + 0.8 * 2)) < 1e-9  # pos = 1.8
    assert en["max_tokens"] == 7
    assert en["share_micro"] == 937500  # 15/16
    assert got["zh"]["share_micro"] == 62500


def test_tokenizer_fertility(spark):
    from hfsa_spark.operators.text import tokenizer_fertility

    d = spark.createDataFrame(
        [
            (1, "short words here", "en"),          # 3 words, all ≤5 chars
            (2, "internationalization", "de"),      # 1 word, 20 chars → 5 pieces
        ],
        "doc_id bigint, text string, lang string",
    )
    got = {r["lang"]: r for r in tokenizer_fertility(d).collect()}
    assert got["en"]["n_words"] == 3
    # "short"→1+0, "words"→1+0, "here"→1+0 pieces; no punct runs
    assert got["en"]["n_pieces"] == 3
    assert got["en"]["pieces_per_word_micro"] == 1000000
    # 20-char word: 1 + floor((20-4)/4) = 5 pieces
    assert got["de"]["n_pieces"] == 5
    assert got["de"]["pieces_per_word_micro"] == 5000000
    assert got["de"]["chars_per_piece_micro"] == 4000000


def test_bigram_pmi(spark):
    import math

    from hfsa_spark.operators.text import bigram_pmi

    # "of the" appears 5 times; "xx yy" 5 times but xx/yy appear ONLY
    # together → maximal PMI; "of"/"the" also appear apart → lower PMI
    docs = ["of the thing"] * 5 + ["xx yy"] * 5 + ["of sorts", "the end"]
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id bigint, text string"
    )
    got = {r["bg"]: r for r in bigram_pmi(d, min_count=5, k=10).collect()}
    assert set(got) == {"of the", "the thing", "xx yy"}
    assert got["xx yy"]["pmi_micro"] > got["of the"]["pmi_micro"]
    # closed form for 'xx yy': C=5, c1=c2=5, Nuni=29, Nbi=17
    want = round(math.log(5 * 29 * 29 / (17 * 5 * 5)) * 1e6)
    assert got["xx yy"]["pmi_micro"] == want
