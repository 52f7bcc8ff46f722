"""Round-5c curation/privacy/eval operators: domain_cap, l_diversity_audit,
calibration_bins, and their gate-level invariants."""

from __future__ import annotations

from pyspark.sql import functions as F


# ------------------------------------------------------------- domain_cap --
def test_domain_cap_keeps_at_most_cap_per_domain(spark):
    from hfsa_spark.operators.sampling import domain_cap

    rows = [
        (i, f"https://sub{i % 2}.host{i % 3}.example{i % 3}.com/p/{i}")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    out = domain_cap(df, "url", cap=4).collect()
    assert len(out) == 30
    per_dom = {}
    for r in out:
        assert r.domain.startswith("example")
        assert r.domain.endswith(".com")
        if r.keep:
            per_dom[r.domain] = per_dom.get(r.domain, 0) + 1
    assert per_dom and all(v <= 4 for v in per_dom.values())


def test_domain_cap_is_partition_invariant(spark):
    from hfsa_spark.operators.sampling import domain_cap

    rows = [(i, f"https://www.only{i % 2}.org/{i}") for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    a = {(r.doc_id, r.domain_rank) for r in domain_cap(df, cap=3).collect()}
    b = {
        (r.doc_id, r.domain_rank)
        for r in domain_cap(df.repartition(7), cap=3).collect()
    }
    assert a == b


# ----------------------------------------------------- l_diversity_audit --
def test_l_diversity_flags_homogeneous_classes(spark):
    from hfsa_spark.operators.features import l_diversity_audit

    rows = (
        # class A: big and diverse -> no violation
        [("a", f"s{i % 4}") for i in range(8)]
        # class B: big but homogeneous -> violates_l only
        + [("b", "s0") for _ in range(8)]
        # class C: small and diverse-ish -> violates_k (and l at l=3)
        + [("c", "s0"), ("c", "s1")]
    )
    df = spark.createDataFrame(rows, ["qi", "sens"])
    got = {
        r.qi: (r.class_size, r.n_sensitive, r.violates_k, r.violates_l)
        for r in l_diversity_audit(df, ["qi"], "sens", l=3, k=5).collect()
    }
    assert got["a"] == (8, 4, False, False)
    assert got["b"] == (8, 1, False, True)
    assert got["c"] == (2, 2, True, True)


# ------------------------------------------------------- calibration_bins --
def test_calibration_bins_exact_integers(spark):
    from hfsa_spark.operators.features import calibration_bins

    rows = [
        (50_000, 0),  # bin 0
        (150_000, 1),  # bin 1
        (150_000, 0),  # bin 1
        (1_000_000, 1),  # conf == 1e6 clamps into the last bin
    ]
    df = spark.createDataFrame(rows, ["conf_micro", "label"])
    got = {r.bin: r for r in calibration_bins(df, "conf_micro", "label").collect()}
    assert set(got) == {0, 1, 9}
    assert (got[0].n, got[0].n_pos, got[0].gap_micro) == (1, 0, 50_000)
    # bin 1: |1*1e6 - 300000| / 2 = 350000
    assert (got[1].n, got[1].sum_conf_micro, got[1].gap_micro) == (2, 300_000, 350_000)
    assert (got[9].n, got[9].n_pos, got[9].gap_micro) == (1, 1, 0)


def test_calibrated_source_has_small_gaps(spark):
    """Bernoulli(conf) labels from an independent hash: every bin's gap
    should be far below the 500k worst case (same construction as q175)."""
    from hfsa_spark.functions.hashing import portable_hash64
    from hfsa_spark.operators.features import calibration_bins

    df = (
        spark.range(2000)
        .select(
            (portable_hash64(F.col("id").cast("string"), seed=11) % 1000001)
            .alias("conf_micro"),
            F.col("id"),
        )
        .withColumn(
            "label",
            (portable_hash64(F.col("id").cast("string"), seed=12) % 1000000)
            < F.col("conf_micro"),
        )
    )
    out = calibration_bins(df, "conf_micro", "label").collect()
    assert len(out) == 10
    assert all(r.gap_micro < 120_000 for r in out)
    # total mass conserved
    assert sum(r.n for r in out) == 2000


# ------------------------------------------------------------ setsim_join --
def _brute_pairs(rows, num, den, n=3):
    """All-pairs exact Jaccard over distinct word n-gram shingle sets."""
    import itertools

    def sh(t):
        w = [x for x in t.lower().split() if x]
        if len(w) >= n:
            return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}
        return {" ".join(w)}

    sets = {i: sh(t) for i, t in rows}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a]) + len(sets[b]) - inter
        if den * inter >= num * union:
            out[(a, b)] = (len(sets[a]), len(sets[b]), inter)
    return out


def test_setsim_join_matches_bruteforce(spark):
    from hfsa_spark.operators.dedup import setsim_join

    base = "the quick brown fox jumps over the lazy dog near the old barn"
    rows = [
        (1, base),
        (2, base + " today"),                      # near-identical -> pair
        (3, base.replace("quick", "slow")),        # close -> pair at 1/2
        (4, "completely different words here now past every threshold gate"),
        (5, "tiny doc"),                           # < n tokens fallback path
        (6, "tiny doc"),                           # identical tiny -> pair
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): (r.n_a, r.n_b, r.inter)
        for r in setsim_join(df, threshold_num=1, threshold_den=2).collect()
    }
    assert got == _brute_pairs(rows, 1, 2)
    assert (1, 2) in got and (5, 6) in got and all(4 not in p for p in got)


def test_setsim_join_partition_invariant_and_threshold_exact(spark):
    from hfsa_spark.operators.dedup import setsim_join

    rows = [(i, f"w{i % 4} common common2 common3 shared tail x{i % 2}")
            for i in range(12)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = {(r.id_a, r.id_b, r.jaccard_micro)
         for r in setsim_join(df, threshold_num=4, threshold_den=5).collect()}
    b = {(r.id_a, r.id_b, r.jaccard_micro)
         for r in setsim_join(df.repartition(5), threshold_num=4,
                              threshold_den=5).collect()}
    assert a == b
    assert a == {k + (1000000 * v[2] // (v[0] + v[1] - v[2]),)
                 for k, v in _brute_pairs(rows, 4, 5).items()}


# ------------------------------------------------------------- min_k_prob --
def test_min_k_prob_selects_lowest_tokens(spark):
    from hfsa_spark.operators.text import lm_cross_entropy, min_k_prob

    train = spark.createDataFrame(
        [(0, "a a a a b b c d")], ["doc_id", "text"]
    )
    ev = spark.createDataFrame(
        # 10 tokens: frequent 'a' (high logp) + rare/oov tail
        [(1, "a a a a a b c d zz yy")], ["doc_id", "text"]
    )
    full = lm_cross_entropy(train, ev).collect()[0]
    mk = min_k_prob(train, ev, k_num=1, k_den=5).collect()[0]
    assert mk.n_tokens == 10 and mk.m == 2
    # the two lowest must be the two OOV tokens (uniform add-one floor)
    assert full.n_oov == 2
    # OOV logp = ln(1/(N+V)) with N=8, V=4 -> both tokens identical
    import math

    oov = round(math.log(1.0 / 12.0) * 1e6)
    assert mk.sum_mink_micro == 2 * oov
    # and the min-k mass is strictly worse (lower) than the doc average
    assert mk.sum_mink_micro / mk.m < full.sum_logp_micro / full.n_tokens


def test_min_k_prob_member_scores_higher_than_nonmember(spark):
    """A doc drawn from the train distribution has a higher (less
    negative) min-k mass per token than an off-distribution doc."""
    from hfsa_spark.operators.text import min_k_prob

    train = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 5) for i in range(4)],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta alpha beta gamma delta"),
         (101, "qq ww ee rr tt uu ii oo")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in min_k_prob(train, ev).collect()}
    assert (got[100].sum_mink_micro / got[100].m
            > got[101].sum_mink_micro / got[101].m)


# --------------------------------------------------------- doremi_weights --
def test_doremi_upweights_high_excess_domain(spark):
    from pyspark.sql import functions as F
    from hfsa_spark.operators.sampling import doremi_weights

    # ref scores == proxy scores for domain A (excess 0); proxy much
    # worse for domain B -> B must get the larger weight
    ref = spark.createDataFrame(
        [(1, "A", 10, -10_000_000), (2, "A", 10, -12_000_000),
         (3, "B", 10, -10_000_000), (4, "B", 10, -12_000_000)],
        ["doc_id", "domain", "n_tokens", "sum_logp_micro"],
    )
    proxy = spark.createDataFrame(
        [(1, 10, -10_000_000), (2, 10, -12_000_000),
         (3, 10, -30_000_000), (4, 10, -34_000_000)],
        ["doc_id", "n_tokens", "sum_logp_micro"],
    ).select("doc_id", "n_tokens", "sum_logp_micro")
    got = {r.domain: r for r in doremi_weights(ref, proxy).collect()}
    assert got["A"].excess_micro == 0
    assert got["B"].excess_micro == (3_200_000 - 1_100_000)
    assert got["B"].weight_micro > got["A"].weight_micro
    # weights normalize (integer floor loses at most n_domains micro)
    tot = sum(r.weight_micro for r in got.values())
    assert 1_000_000 - 2 <= tot <= 1_000_000
    import math

    expected_ratio = math.exp(2.1)
    assert abs(got["B"].weight_micro / got["A"].weight_micro
               - expected_ratio) < 0.01 * expected_ratio


# ---------------------------------------------------------------- pr_curve --
def test_pr_curve_exact_counts(spark):
    from hfsa_spark.operators.features import pr_curve

    rows = [
        (900_000, 1), (900_000, 1), (900_000, 0),
        (500_000, 1), (500_000, 0),
        (100_000, 0),
    ]
    df = spark.createDataFrame(rows, ["score_micro", "label"])
    got = {r.threshold_micro: r for r in pr_curve(df, "score_micro", "label").collect()}
    assert set(got) == {900_000, 500_000, 100_000}
    # t=900k: pred 3, tp 2 -> P=2/3, R=2/3
    assert (got[900_000].n_pred_pos, got[900_000].tp) == (3, 2)
    assert got[900_000].precision_micro == 2 * 1000000 // 3
    assert got[900_000].recall_micro == 2 * 1000000 // 3
    # t=500k: pred 5, tp 3 -> P=3/5, R=1
    assert (got[500_000].n_pred_pos, got[500_000].tp) == (5, 3)
    assert got[500_000].recall_micro == 1000000
    # t=100k: everything predicted positive
    assert (got[100_000].n_pred_pos, got[100_000].tp) == (6, 3)
    assert got[100_000].precision_micro == 500000


def test_pr_curve_recall_monotone_in_threshold(spark):
    from pyspark.sql import functions as F
    from hfsa_spark.functions.hashing import portable_hash64
    from hfsa_spark.operators.features import pr_curve

    df = spark.range(500).select(
        ((portable_hash64(F.col("id").cast("string"), seed=1) % 50) * 20000)
        .alias("s"),
        (portable_hash64(F.col("id").cast("string"), seed=2) % 2 == 0)
        .alias("y"),
    )
    out = pr_curve(df, "s", "y").orderBy(F.desc("threshold_micro")).collect()
    rec = [r.recall_micro for r in out]
    npred = [r.n_pred_pos for r in out]
    assert rec == sorted(rec) and npred == sorted(npred)
    assert rec[-1] == 1000000


# ---------------------------------------------------------- mojibake_audit --
def test_mojibake_audit_counts_each_artifact(spark):
    from hfsa_spark.operators.text import mojibake_audit

    rows = [
        (1, "clean ascii text only"),
        (2, "caf\u00c3\u00a9 na\u00c3\u00afve"),          # 2 latin-1 pairs
        (3, "it\u00e2\u20ac\u2122s \u00e2\u20ac\u0153q"),  # 2 triples (+1 C1)
        (4, "bad \ufffd\ufffd bytes"),                       # 2 replacements
        (5, "ctrl\u009dchar"),                                # 1 C1 control
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in mojibake_audit(df).collect()}
    assert not got[1].mojibake
    assert (got[2].n_latin1_pairs, got[2].mojibake) == (2, True)
    assert got[3].n_punct_triples == 2
    assert got[4].n_replacement == 2
    assert (got[5].n_c1_controls, got[5].mojibake) == (1, True)


# --------------------------------------------------- incremental_neardup --
def test_incremental_neardup_flags(spark):
    from hfsa_spark.operators.dedup import (
        band_keys,
        incremental_neardup,
        minhash_signature,
    )

    corpus_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    idx_docs = spark.createDataFrame([(0, corpus_text)], ["doc_id", "text"])
    idx = band_keys(minhash_signature(idx_docs, "doc_id", "text"), "doc_id")
    batch = spark.createDataFrame(
        [
            (10, corpus_text),                     # identical -> index_dup
            (11, "totally new words appear here today fresh content stream"),
            (12, "totally new words appear here today fresh content stream"),
            # 12 duplicates 11 within the batch -> batch_dup
            (13, "another unique document with its own tokens entirely"),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in incremental_neardup(batch, idx).collect()}
    assert got[10].index_dup and not got[10].keep
    assert got[11].keep and not got[11].index_dup and not got[11].batch_dup
    assert got[12].batch_dup and not got[12].index_dup and not got[12].keep
    assert got[13].keep


def test_incremental_neardup_empty_index_keeps_first_copy(spark):
    from hfsa_spark.operators.dedup import incremental_neardup

    empty_idx = spark.createDataFrame([], "band int, key string")
    batch = spark.createDataFrame(
        [(1, "same text here ok now"), (2, "same text here ok now")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in incremental_neardup(batch, empty_idx).collect()}
    assert got[1].keep and got[2].batch_dup and not got[2].keep


# ----------------------------------------------------------- fim_transform --
def test_fim_transform_reassembles_exactly(spark):
    from hfsa_spark.operators.packing import fim_transform

    df = spark.createDataFrame(
        [(i, f"document number {i} with some content to split") for i in range(40)],
        ["doc_id", "text"],
    )
    src = {r.doc_id: r.text for r in df.collect()}
    out = fim_transform(df).collect()
    applied = [r for r in out if r.fim_applied]
    passthru = [r for r in out if not r.fim_applied]
    assert applied and passthru  # 50% rate hits both at n=40
    for r in passthru:
        assert r.out_text == src[r.doc_id]
        assert r.cut_lo is None and r.cut_hi is None
    for r in applied:
        t = src[r.doc_id]
        assert 0 <= r.cut_lo <= r.cut_hi <= len(t)
        pre, rest = r.out_text.split("<|fim_suf|>")
        suf, mid = rest.split("<|fim_mid|>")
        assert pre == "<|fim_pre|>" + t[: r.cut_lo]
        assert suf == t[r.cut_hi :]
        assert mid == t[r.cut_lo : r.cut_hi]


def test_fim_transform_deterministic(spark):
    from hfsa_spark.operators.packing import fim_transform

    df = spark.createDataFrame(
        [(i, f"text body {i} repeated run") for i in range(20)],
        ["doc_id", "text"],
    )
    a = sorted((r.doc_id, r.out_text) for r in fim_transform(df).collect())
    b = sorted(
        (r.doc_id, r.out_text)
        for r in fim_transform(df.repartition(6)).collect()
    )
    assert a == b


# ------------------------------------------------ domain_boilerplate_strip --
def test_domain_boilerplate_is_per_domain(spark):
    from hfsa_spark.operators.dedup import domain_boilerplate_strip

    nl = "\n"
    rows = []
    # domain A: footer on all 4 docs (75%+ -> boiler), body unique
    for i in range(4):
        rows.append((i, "A", f"body a{i}{nl}shared footer"))
    # domain B: SAME footer text but only 1 of 4 docs -> NOT boiler in B
    rows.append((10, "B", f"body b0{nl}shared footer"))
    for i in range(11, 14):
        rows.append((i, "B", f"body b{i}"))
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    got = {r.doc_id: r for r in domain_boilerplate_strip(
        df, "source", frac_num=3, frac_den=5).collect()}
    for i in range(4):
        assert got[i].n_removed == 1 and got[i].clean_text == f"body a{i}"
    assert got[10].n_removed == 0 and "shared footer" in got[10].clean_text


def test_domain_boilerplate_fully_stripped_doc_survives(spark):
    from hfsa_spark.operators.dedup import domain_boilerplate_strip

    df = spark.createDataFrame(
        [(1, "X", "only line"), (2, "X", "only line"), (3, "X", "only line")],
        ["doc_id", "source", "text"],
    )
    got = domain_boilerplate_strip(df, "source", frac_num=1, frac_den=2).collect()
    assert len(got) == 3
    assert all(r.clean_text == "" and r.n_kept == 0 for r in got)


# --------------------------------------------------------- containment_join --
def test_containment_join_finds_quotes_not_jaccard_pairs(spark):
    from hfsa_spark.operators.dedup import containment_join, setsim_join

    quoted = "alpha bravo charlie delta echo foxtrot"
    container = (
        quoted
        + " golf hotel india juliet kilo lima mike november oscar papa"
        + " quebec romeo sierra tango uniform victor whiskey xray yankee zulu"
    )
    df = spark.createDataFrame(
        [(1, quoted), (2, container), (3, "different thing entirely here now")],
        ["doc_id", "text"],
    )
    cj = {(r.id_a, r.id_b): r for r in containment_join(
        df, threshold_num=9, threshold_den=10).collect()}
    # 1 is fully contained in 2 (directed), but NOT vice versa
    assert (1, 2) in cj and cj[(1, 2)].containment_micro == 1000000
    assert (2, 1) not in cj
    # symmetric Jaccard at the same bar misses the pair
    sj = setsim_join(df, threshold_num=9, threshold_den=10).collect()
    assert not [r for r in sj if {r.id_a, r.id_b} == {1, 2}]


def test_containment_join_matches_bruteforce(spark):
    import itertools

    from hfsa_spark.operators.dedup import containment_join

    rows = [(i, f"w{i % 3} w{(i + 1) % 3} shared common tail words here x{i % 2}")
            for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def sh(t, n=3):
        w = t.lower().split()
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    sets = {i: sh(t) for i, t in rows}
    want = set()
    for a, b in itertools.permutations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if 4 * inter >= 3 * len(sets[a]):
            want.add((a, b))
    got = {(r.id_a, r.id_b) for r in containment_join(
        df, threshold_num=3, threshold_den=4).collect()}
    assert got == want

    # and at the q184 gate threshold (9/10)
    want_hi = set()
    for a, b in itertools.permutations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if 10 * inter >= 9 * len(sets[a]):
            want_hi.add((a, b))
    got_hi = {(r.id_a, r.id_b) for r in containment_join(
        df, threshold_num=9, threshold_den=10).collect()}
    assert got_hi == want_hi and want_hi


# -------------------------------------------------------------- zipf_slope --
def test_zipf_slope_near_minus_one_on_zipfian_counts(spark):
    from pyspark.sql import functions as F
    from hfsa_spark.operators.text import zipf_slope

    # build a corpus where term tK appears ~N/K times -> slope ~ -1
    words = []
    N = 1200
    for k in range(1, 40):
        words += [f"t{k:02d}"] * (N // k)
    df = spark.createDataFrame([(0, "z", " ".join(words))],
                               ["doc_id", "lang", "text"])
    r = zipf_slope(df, by="lang", top_k=39).collect()[0]
    assert r.n_terms == 39
    assert 0.9 < r.neg_slope_micro / 1e6 < 1.1


def test_zipf_slope_flat_on_uniform_counts(spark):
    from hfsa_spark.operators.text import zipf_slope

    words = (" ".join(f"u{k}" for k in range(50)) + " ") * 4
    df = spark.createDataFrame([(0, "z", words)], ["doc_id", "lang", "text"])
    r = zipf_slope(df, by="lang", top_k=50).collect()[0]
    assert abs(r.neg_slope_micro) < 20_000  # ~0 slope


# ------------------------------------------------------------- rbo_overlap --
def test_rbo_weights_sum_to_truncated_max(spark):
    from hfsa_spark.operators.similarity import rbo_weights_micro

    w = rbo_weights_micro(10, 0.9)
    # W(1) = full truncated mass; monotone decreasing tails
    assert w == sorted(w, reverse=True)
    assert 0 < w[-1] < w[0] < 1_000_000


def test_rbo_identical_vs_inverted_rankings(spark):
    from hfsa_spark.operators.similarity import rbo_overlap, rbo_weights_micro

    w = rbo_weights_micro(10, 0.9)
    ident = [("q1", f"n{r}", r) for r in range(1, 11)]
    a = spark.createDataFrame(ident, ["query_id", "neighbor_id", "rank"])
    same = rbo_overlap(a, a).collect()[0]
    assert same.n_overlap == 10
    assert same.rbo_micro == sum(w)  # the truncated-RBO maximum
    # same SET, fully inverted order -> same recall, strictly lower RBO
    inv = [("q1", f"n{r}", 11 - r) for r in range(1, 11)]
    b = spark.createDataFrame(inv, ["query_id", "neighbor_id", "rank"])
    worse = rbo_overlap(a, b).collect()[0]
    assert worse.n_overlap == 10
    assert worse.rbo_micro < same.rbo_micro
    # inverted contribution: item at (r, 11-r) weighs W(max(r, 11-r))
    assert worse.rbo_micro == sum(w[max(r, 11 - r) - 1] for r in range(1, 11))


def test_rbo_disjoint_rankings_zero(spark):
    from hfsa_spark.operators.similarity import rbo_overlap

    a = spark.createDataFrame(
        [("q1", f"a{r}", r) for r in range(1, 11)],
        ["query_id", "neighbor_id", "rank"],
    )
    b = spark.createDataFrame(
        [("q1", f"b{r}", r) for r in range(1, 11)],
        ["query_id", "neighbor_id", "rank"],
    )
    assert rbo_overlap(a, b).count() == 0  # no overlap -> no row


# ------------------------------------------------------ json_schema_profile --
def test_json_schema_profile_types_and_coverage(spark):
    from hfsa_spark.operators.features import json_schema_profile

    rows = [
        ('{"a": 1, "b": "x"}',),
        ('{"a": "mixed", "c": [1, 2]}',),
        ('{"a": 2.5, "d": {"x": 1}, "e": true, "f": null}',),
        ('{}',),
    ]
    df = spark.createDataFrame(rows, ["props"])
    got = {(r.key, r.vtype): (r.n, r.pct_micro)
           for r in json_schema_profile(df).collect()}
    assert got[("a", "int")] == (1, 250000)
    assert got[("a", "string")] == (1, 250000)
    assert got[("a", "double")] == (1, 250000)
    assert got[("c", "array")][0] == 1
    assert got[("d", "object")][0] == 1
    assert got[("e", "bool")][0] == 1
    assert got[("f", "null")][0] == 1
    # 'a' appears in 3 of 4 rows -> summed coverage 750000
    assert sum(v[1] for k, v in got.items() if k[0] == "a") == 750000


# ------------------------------------------------------- anchor_text_profile --
def test_anchor_text_profile_aggregates_inlink_anchors(spark):
    from hfsa_spark.operators.text import anchor_text_profile

    rows = [
        (1, 'x <a href="t1">great search engine</a> y'),
        (2, '<a href="t1">search engine</a><a href="t2">small blog</a>'),
        (3, '<a href="t1">engine of search</a>'),
        (4, "no links at all here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = anchor_text_profile(df, top_k=2).collect()
    t1 = {r.term: r for r in got if r.target == "t1"}
    assert all(r.n_inlinks == 3 and r.n_srcs == 3 for r in t1.values())
    # 'engine' and 'search' each appear 3x; tie breaks term asc
    assert set(t1) == {"engine", "search"}
    assert t1["engine"].term_rank == 1 and t1["search"].term_rank == 2
    t2 = [r for r in got if r.target == "t2"]
    assert len(t2) == 2 and all(r.n_inlinks == 1 for r in t2)
    assert not [r for r in got if r.target not in ("t1", "t2")]
