"""Round-5 additions: blocked-Levenshtein fuzzy dedup, C4-style line-level
boilerplate removal, and CCNet perplexity bucketing."""

from __future__ import annotations

from pyspark.sql import functions as F

from hfsa_spark.operators.dedup import edit_distance_neardup_pairs, line_dedup
from hfsa_spark.operators.text import perplexity_buckets


# ------------------------------------------- edit_distance_neardup_pairs --


def _ed_corpus(spark):
    rows = [
        (1, "the quick brown fox", "en"),
        (2, "the quick brown fax", "en"),  # dist 1 to id 1
        (3, "the quick brown fox jumps", "en"),  # dist 6 to id 1 (> 4)
        (4, "the quick brown fox", "de"),  # identical text, other lang block
        (5, "completely different words", "en"),
        (6, "xx", "en"),
        (7, "xxyy", "en"),  # dist 2 to id 6
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_edit_distance_pairs_exact(spark):
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_neardup_pairs(
            _ed_corpus(spark), "doc_id", "text", max_dist=4, block_cols=["lang"]
        ).collect()
    }
    assert got == {(1, 2, 1), (6, 7, 2)}


def test_edit_distance_band_recall_matches_bruteforce(spark):
    # candidate banding must be lossless: compare against the O(n^2) truth
    import itertools

    rows = [(i, "a" * (5 + i % 7) + "b" * (i % 3), "en") for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    d = 3

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    want = {
        (ia, ib)
        for (ia, ta, _), (ib, tb, _) in itertools.combinations(rows, 2)
        if lev(ta, tb) <= d
    }
    got = {
        (r.id_a, r.id_b)
        for r in edit_distance_neardup_pairs(
            df, "doc_id", "text", max_dist=d
        ).collect()
    }
    assert got == want


def test_edit_distance_max_bucket_caps_degenerate_blocks(spark):
    # 50 equal-length docs all land in one band bucket; cap drops it
    rows = [(i, f"doc number {i:02d}", "en") for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    capped = edit_distance_neardup_pairs(df, "doc_id", "text", 4, max_bucket=10)
    assert capped.count() == 0


# -------------------------------------------------------------- line_dedup --


def _pages(spark):
    nl = "\n"
    rows = [
        (1, f"BANNER{nl}unique one{nl}FOOTER"),
        (2, f"BANNER{nl}unique two{nl}FOOTER"),
        (3, f"intro{nl}unique three{nl}FOOTER"),
        (4, f"BANNER{nl}BANNER{nl}solo"),  # internal repeat: one doc, 3 total
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_line_dedup_distinct_doc_counting(spark):
    # BANNER: 3 distinct docs -> boilerplate; FOOTER: 3 -> boilerplate;
    # a line repeated INSIDE one doc does not count extra docs
    out = {
        r.doc_id: (r.n_lines, r.n_kept, r.clean_text)
        for r in line_dedup(_pages(spark), min_docs=3).collect()
    }
    assert out[1] == (3, 1, "unique one")
    assert out[2] == (3, 1, "unique two")
    assert out[3] == (3, 2, "intro\nunique three")
    assert out[4] == (3, 1, "solo")


def test_line_dedup_fully_boilerplate_doc_keeps_row(spark):
    rows = [(1, "X\nX"), (2, "X"), (3, "X")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: (r.n_kept, r.clean_text) for r in line_dedup(df, min_docs=2).collect()}
    assert out == {1: (0, ""), 2: (0, ""), 3: (0, "")}


def test_line_dedup_trim_matching_preserves_original_lines(spark):
    # counting trims, rebuild keeps the original spacing of kept lines
    rows = [(1, " pad \nkeep me"), (2, "pad\nother")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r.clean_text for r in line_dedup(df, min_docs=2).collect()}
    assert out == {1: "keep me", 2: "other"}


# ------------------------------------------------------ perplexity_buckets --


def test_perplexity_buckets_rank_and_cuts(spark):
    # 10 en docs: fluent docs repeat common tokens, tail docs are rare-heavy
    rows = [(i, ("common " * 5 + f"rare{i} " * (i % 4)).strip(), "en") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = perplexity_buckets(df, head_frac=0.3, tail_frac=0.3).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r.grank)
    n = 10
    assert sorted(by_bucket["head"]) == [1, 2, 3]
    assert sorted(by_bucket["tail"]) == [8, 9, 10]
    assert len(by_bucket["middle"]) == n - 6
    # grank is a permutation of 1..n
    assert sorted(r.grank for r in out) == list(range(1, n + 1))


def test_perplexity_buckets_matches_plain_rank_window(spark):
    # histogram-decomposed rank == the naive per-lang rank window
    from pyspark.sql import Window

    rows = [
        (i, " ".join(f"t{(i * 7 + j) % 5}" for j in range(3 + i % 4)), l)
        for i in range(40)
        for l in (["en"] if i % 3 else ["de"])
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = perplexity_buckets(df).select("doc_id", "grank").collect()
    from hfsa_spark.operators.text import unigram_logprob_score

    s = unigram_logprob_score(df)
    naive = (
        df.select("doc_id", "lang")
        .join(s, "doc_id", "left")
        .withColumn(
            "_m",
            F.coalesce(
                F.floor(
                    F.col("sum_logp_micro").cast("double")
                    / F.col("n_tokens").cast("double")
                ).cast("long"),
                F.lit(-(10**18)),
            ),
        )
        .withColumn(
            "grank",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(F.desc("_m"), F.asc("doc_id"))
            ),
        )
        .select("doc_id", "grank")
        .collect()
    )
    assert {(r.doc_id, r.grank) for r in got} == {(r.doc_id, r.grank) for r in naive}


def test_perplexity_buckets_tokenless_doc_lands_in_tail(spark):
    rows = [(1, "a a a", "en"), (2, "a b", "en"), (3, "   ", "en"), (4, "a", "en")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r.doc_id: (r.bucket, r.mean_lp_micro) for r in perplexity_buckets(df).collect()}
    assert out[3][1] is None
    assert out[3][0] == "tail"


# ------------------------------------------------------- corpus_divergence --


def test_corpus_divergence_zero_on_identical_corpora(spark):
    rows = [(i, "a b c d", "en") for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    from hfsa_spark.operators.text import corpus_divergence

    out = corpus_divergence(df, df, k=10).collect()
    assert all(r.contrib_nano == 0 for r in out)


def test_corpus_divergence_disjoint_vocab_hits_ln2(spark):
    from hfsa_spark.operators.text import corpus_divergence
    import math

    a = spark.createDataFrame([(1, "x x x x")], ["doc_id", "text"])
    b = spark.createDataFrame([(2, "y y y y")], ["doc_id", "text"])
    out = corpus_divergence(a, b, k=10).collect()
    total = sum(r.contrib_nano for r in out) / 1e9
    assert abs(total - math.log(2.0)) < 1e-6
    # symmetry
    out_ba = corpus_divergence(b, a, k=10).collect()
    assert sum(r.contrib_nano for r in out_ba) == sum(r.contrib_nano for r in out)


def test_corpus_divergence_one_sided_term_no_nulls(spark):
    from hfsa_spark.operators.text import corpus_divergence

    a = spark.createDataFrame([(1, "shared only_a")], ["doc_id", "text"])
    b = spark.createDataFrame([(2, "shared shared")], ["doc_id", "text"])
    out = {r.term: r for r in corpus_divergence(a, b, k=10).collect()}
    assert out["only_a"].cnt_b == 0 and out["only_a"].contrib_nano > 0
    assert out["shared"].contrib_nano is not None


# -------------------------------------------------------- blocklist_filter --


def test_blocklist_filter_counts_and_keep(spark):
    from hfsa_spark.operators.text import blocklist_filter

    rows = [
        (1, "clean text here"),
        (2, "bad bad word"),
        (3, "one bad in a much longer stretch of acceptable text " + "pad " * 50),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: (r.n_blocked, r.keep)
        for r in blocklist_filter(df, ["bad"], max_ratio_micro=20000).collect()
    }
    assert out[1] == (0, True)
    assert out[2] == (2, False)  # 2/3 ratio way over 2%
    assert out[3][0] == 1 and out[3][1] is True  # 1/54 < 2%
    assert out[4] == (0, True)  # empty doc keeps (0 tokens, ratio 0)


def test_blocklist_filter_default_any_hit_drops(spark):
    from hfsa_spark.operators.text import blocklist_filter

    df = spark.createDataFrame([(1, "a bad day"), (2, "fine day")], ["doc_id", "text"])
    out = {r.doc_id: r.keep for r in blocklist_filter(df, ["bad"]).collect()}
    assert out == {1: False, 2: True}


# ------------------------------------------------------------- span_dedup --


def test_span_dedup_first_occurrence_keeps(spark):
    from hfsa_spark.operators.dedup import span_dedup

    rows = [
        (1, "A. B. C. D."),          # spans: ABC(0), BCD(1)
        (2, "B. C. D. E."),          # spans: BCD(0) dup of doc1 pos1, CDE(1)
        (3, "X! Y? Z."),             # one span XYZ
        (4, "short. only."),         # < 3 sentences -> no spans
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {(r.doc_id, r.pos): (r.keep, r.n_occurrences) for r in span_dedup(df).collect()}
    assert out[(1, 0)] == (True, 1)
    assert out[(1, 1)] == (True, 2)   # first BCD
    assert out[(2, 0)] == (False, 2)  # duplicate BCD dropped
    assert out[(2, 1)] == (True, 1)
    assert out[(3, 0)] == (True, 1)
    assert (4, 0) not in out


def test_span_dedup_within_doc_duplicates(spark):
    from hfsa_spark.operators.dedup import span_dedup

    # the same span twice INSIDE one doc: first pos keeps
    df = spark.createDataFrame([(7, "A. B. C. A. B. C.")], ["doc_id", "text"])
    out = {(r.doc_id, r.pos): r.keep for r in span_dedup(df).collect()}
    assert out[(7, 0)] is True and out[(7, 3)] is False


# -------------------------------------------------- neardup_canonical_keeper --


def test_neardup_keeper_picks_best_quality_per_cluster(spark):
    from hfsa_spark.operators.dedup import neardup_canonical_keeper

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, base, 10),
        (2, base + " iota", 50),           # near-dup of 1, higher quality
        (3, base + " iota kappa", 30),     # chains to 2
        (9, "совершенно другой текст без общих шинглов вовсе", 99),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "n_chars"])
    out = {r.doc_id: (r.group_id, r.keeper_id, r.keep, r.group_size)
           for r in neardup_canonical_keeper(df).collect()}
    # docs 1-3 form one component labeled by min id 1; keeper = max quality (id 2)
    assert out[1] == (1, 2, False, 3)
    assert out[2] == (1, 2, True, 3)
    assert out[3] == (1, 2, False, 3)
    assert out[9] == (9, 9, True, 1)


def test_neardup_keeper_quality_tie_breaks_on_lower_id(spark):
    from hfsa_spark.operators.dedup import neardup_canonical_keeper

    base = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [(5, base, 7), (6, base, 7)], ["doc_id", "text", "n_chars"]
    )
    out = {r.doc_id: r.keep for r in neardup_canonical_keeper(df).collect()}
    assert out == {5: True, 6: False}


# ----------------------------------------------------- review-fix pins --


def test_perplexity_buckets_null_lang_docs_survive(spark):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ])
    rows = [(1, "a a", "en"), (2, "a b", "en"), (3, "b b", None)]
    df = spark.createDataFrame(rows, schema)
    out = perplexity_buckets(df)
    assert out.count() == 3
    assert {r.doc_id for r in out.collect()} == {1, 2, 3}


def test_blocklist_filter_empty_list_keeps_everything(spark):
    from hfsa_spark.operators.text import blocklist_filter

    df = spark.createDataFrame([(1, "any text")], ["doc_id", "text"])
    out = blocklist_filter(df, []).collect()
    assert out[0].n_blocked == 0 and out[0].keep is True


def test_line_dedup_metachar_separator_is_literal(spark):
    rows = [(1, "keep|X"), (2, "X|other"), (3, "X|third")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: (r.n_lines, r.clean_text) for r in line_dedup(df, min_docs=3, sep="|").collect()}
    assert out[1] == (2, "keep")
    assert out[2] == (2, "other")
    assert out[3] == (2, "third")


# ---------------------------------------------------------- script_profile --


def test_script_profile_counts_and_dominant(spark):
    from hfsa_spark.operators.text import script_profile

    rows = [
        (1, "hello world"),
        (2, "Привет мир ok"),
        (3, "你好世界"),
        (4, "123 456"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in script_profile(df).collect()}
    assert (out[1].n_latin, out[1].dominant) == (10, "latin")
    assert (out[2].n_cyrillic, out[2].dominant) == (9, "cyrillic")
    assert (out[3].n_han, out[3].dominant) == (4, "han")
    assert (out[4].n_digit, out[4].dominant) == (6, "digit")
    assert (out[5].n_visible, out[5].latin_ratio_micro) == (0, 0)
    # ratio: 10 latin of 10 visible in doc 1
    assert out[1].latin_ratio_micro == 1000000


# --------------------------------------------------------- pipeline_funnel --


def test_pipeline_funnel_cumulative_accounting(spark):
    from hfsa_spark.operators.features import pipeline_funnel

    rows = [
        (1, True, True),
        (2, True, False),
        (3, False, True),   # fails stage 1 -> never reaches stage 2
        (4, True, True),
    ]
    df = spark.createDataFrame(rows, ["id", "p1", "p2"])
    out = {r.stage_no: (r.stage, r.n_out, r.n_dropped)
           for r in pipeline_funnel(df, [("a", "p1"), ("b", "p2")]).collect()}
    assert out[0] == ("input", 4, 0)
    assert out[1] == ("a", 3, 1)
    assert out[2] == ("b", 2, 1)


def test_pipeline_funnel_single_aggregate_plan(spark):
    from hfsa_spark.operators.features import pipeline_funnel

    df = spark.createDataFrame([(1, True)], ["id", "p"])
    plan = pipeline_funnel(df, [("only", "p")])._jdf.queryExecution().toString()
    # one scan, no join, no extra shuffle beyond the single-row aggregate
    assert "Join" not in plan


# --------------------------------------------------------- chat_turn_stats --


def test_chat_turn_stats_parses_roles_and_alternation(spark):
    from hfsa_spark.operators.text import chat_turn_stats

    rows = [
        (1, "User: hi there Assistant: hello!"),
        (2, "<|system|> be nice <|user|> q <|assistant|> a"),
        (3, "User: a User: b Assistant: c"),
        (4, "no markers at all"),
        (5, "Human: x AI: y"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in chat_turn_stats(df).collect()}
    assert (out[1].n_turns, out[1].n_user, out[1].n_assistant) == (2, 1, 1)
    assert out[1].alternation_ok is True and out[1].first_role == "user"
    assert (out[2].n_system, out[2].first_role) == (1, "system")
    assert out[3].alternation_ok is False  # User speaks twice in a row
    assert (out[4].n_turns, out[4].first_role, out[4].alternation_ok) == (
        0, "none", True)
    # Human/AI canonicalize to user/assistant
    assert (out[5].n_user, out[5].n_assistant) == (1, 1)
    assert (out[1].user_chars, out[1].assistant_chars) == (8, 6)


# -------------------------------------------------------- k_anonymity_audit --


def test_k_anonymity_flags_small_classes(spark):
    from hfsa_spark.operators.features import k_anonymity_audit

    rows = [("en", "a"), ("en", "a"), ("en", "a"), ("en", "b"), ("de", "a")]
    df = spark.createDataFrame(rows, ["lang", "source"])
    out = {(r.lang, r.source): (r.class_size, r.violates)
           for r in k_anonymity_audit(df, ["lang", "source"], k=3).collect()}
    assert out[("en", "a")] == (3, False)
    assert out[("en", "b")] == (1, True)
    assert out[("de", "a")] == (1, True)


# -------------------------------------------------------- vocabulary_growth --


def test_vocabulary_growth_monotone_and_final_totals(spark):
    from hfsa_spark.operators.text import vocabulary_growth

    rows = [(i, f"common w{i % 3} only{i}") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = sorted(vocabulary_growth(df, buckets=5).collect(), key=lambda r: r.bucket)
    # cumulative columns are monotone non-decreasing
    for a, b in zip(out, out[1:]):
        assert a.n_docs <= b.n_docs and a.vocab <= b.vocab and a.n_tokens <= b.n_tokens
    last = out[-1]
    assert last.n_docs == 10 and last.n_tokens == 30
    # vocabulary: 'common', w0..w2, only0..only9 = 14 distinct terms
    assert last.vocab == 14
    # first bucket (2 docs): common, w0, w1, only0, only1
    assert out[0].vocab == 5


# ------------------------------------------------------- order_mixing_audit --


def test_order_mixing_detects_unshuffled_runs(spark):
    from hfsa_spark.operators.sampling import order_mixing_audit

    # un-shuffled: sources concatenated -> nearly every adjacent pair same
    rows = [(i, "a" if i < 50 else "b") for i in range(100)]
    df = spark.createDataFrame(rows, ["pos", "src"])
    bad = {r.label: r.adj_same for r in order_mixing_audit(df, "pos", "src").collect()}
    assert bad["a"] == 49 and bad["b"] == 49
    # hash-shuffled: adjacency collapses toward the ~50% collision share
    from pyspark.sql import functions as F2

    shuffled = df.withColumn("k", F2.md5(F2.col("pos").cast("string")))
    mixed = {r.label: r.adj_same for r in order_mixing_audit(shuffled, "k", "src").collect()}
    assert mixed["a"] + mixed["b"] < 70  # far below the 98 of the run order
    # conservation: per-label n sums to the corpus
    out = order_mixing_audit(df, "pos", "src").collect()
    assert sum(r.n for r in out) == 100


# ------------------------------------------------ lm_cross_entropy / binning --


def test_lm_cross_entropy_oov_floor_and_counts(spark):
    import math

    from hfsa_spark.operators.text import lm_cross_entropy

    tr = spark.createDataFrame([(1, "a a b")], ["doc_id", "text"])
    ev = spark.createDataFrame([(10, "a zz")], ["doc_id", "text"])
    r = lm_cross_entropy(tr, ev).collect()[0]
    assert (r.n_tokens, r.n_oov) == (2, 1)
    # model: n=3 tokens, v=2 vocab; p(a)=(2+1)/5, p(zz)=1/5
    want = round(math.log(3 / 5) * 1e6) + round(math.log(1 / 5) * 1e6)
    assert r.sum_logp_micro == want


def test_lm_cross_entropy_train_head_scores_higher(spark):
    # eval docs made of train vocabulary must outscore OOV-heavy docs
    from hfsa_spark.operators.text import lm_cross_entropy

    tr = spark.createDataFrame([(i, "common words here") for i in range(5)],
                               ["doc_id", "text"])
    ev = spark.createDataFrame(
        [(100, "common words"), (101, "xx yy")], ["doc_id", "text"])
    out = {r.doc_id: r.sum_logp_micro / r.n_tokens for r in lm_cross_entropy(tr, ev).collect()}
    assert out[100] > out[101]


def test_quantile_bin_equal_values_share_bins_and_sizes_balance(spark):
    from hfsa_spark.operators.features import quantile_bin

    df = spark.createDataFrame([(i, float(i % 6)) for i in range(60)], ["id", "v"])
    out = quantile_bin(df, "v", n_bins=3).collect()
    by_v = {}
    for r in out:
        by_v.setdefault(r.v, set()).add(r.bin)
    # every distinct value maps to exactly one bin
    assert all(len(bins) == 1 for bins in by_v.values())
    from collections import Counter

    sizes = Counter(r.bin for r in out)
    assert sizes == {1: 20, 2: 20, 3: 20}


# -------------------------------------------------- review-fix pins (r5b-2) --


def test_quantile_bin_null_values_survive(spark):
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from hfsa_spark.operators.features import quantile_bin

    schema = StructType([
        StructField("id", LongType()),
        StructField("v", DoubleType()),
    ])
    df = spark.createDataFrame([(1, 1.0), (2, 2.0), (3, None), (4, 2.0)], schema)
    out = quantile_bin(df, "v", n_bins=2)
    assert out.count() == 4
    assert {r.id for r in out.collect()} == {1, 2, 3, 4}


def test_pipeline_funnel_empty_input_reports_zeroes(spark):
    from pyspark.sql.types import BooleanType, LongType, StructField, StructType

    from hfsa_spark.operators.features import pipeline_funnel

    schema = StructType([
        StructField("id", LongType()),
        StructField("p", BooleanType()),
    ])
    df = spark.createDataFrame([], schema)
    out = {r.stage_no: (r.n_out, r.n_dropped)
           for r in pipeline_funnel(df, [("only", "p")]).collect()}
    assert out == {0: (0, 0), 1: (0, 0)}


def test_streaming_index_maintenance_exported(spark):
    from hfsa_spark.streaming import streaming_index_maintenance  # noqa: F401
