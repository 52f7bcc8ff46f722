"""Property-based checks (hypothesis) for the round-5b operators: each
property is the operator's defining invariant, checked on randomized small
inputs through the REAL Spark path (bounded example counts keep the suite
fast)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_FAST = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@_FAST
@given(
    st.lists(
        st.text(alphabet="abc", min_size=0, max_size=10),
        min_size=2,
        max_size=12,
        unique=True,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_edit_distance_banding_lossless(spark, texts, d):
    """The length-band candidate generator must find EVERY pair within the
    radius — recall 1.0 vs the quadratic truth, for any strings and any d."""
    import itertools

    from hfsa_spark.operators.dedup import edit_distance_neardup_pairs

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    want = {
        (ia, ib)
        for (ia, ta), (ib, tb) in itertools.combinations(rows, 2)
        if _lev(ta, tb) <= d
    }
    got = {
        (r.id_a, r.id_b)
        for r in edit_distance_neardup_pairs(df, "doc_id", "text", max_dist=d).collect()
    }
    assert got == want


@_FAST
@given(
    st.lists(
        st.lists(st.sampled_from(["X", "Y", "unique", "pad", ""]), min_size=1, max_size=4),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=2, max_value=3),
)
def test_line_dedup_conservation_and_reference(spark, docs, min_docs):
    """n_kept + n_removed == n_lines, and the cleaned text equals the
    reference filter (drop lines whose trimmed form appears in >= min_docs
    distinct docs, preserve order)."""
    from collections import defaultdict

    from hfsa_spark.operators.dedup import line_dedup

    rows = [(i, "\n".join(lines)) for i, (lines) in enumerate(docs)]
    # make line i's doc membership deterministic for the reference
    seen = defaultdict(set)
    for i, lines in enumerate(docs):
        for ln in lines:
            seen[ln.strip()].add(i)
    boiler = {ln for ln, ds in seen.items() if len(ds) >= min_docs}
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in line_dedup(df, min_docs=min_docs).collect()}
    for i, lines in enumerate(docs):
        r = out[i]
        assert r.n_kept + r.n_removed == r.n_lines == len(lines)
        want = "\n".join(ln for ln in lines if ln.strip() not in boiler)
        assert r.clean_text == want


@_FAST
@given(
    st.lists(
        st.text(alphabet="ab .!", min_size=0, max_size=30),
        min_size=1,
        max_size=6,
    )
)
def test_span_dedup_exactly_one_keeper_per_digest(spark, texts):
    """Every span digest keeps exactly one occurrence, and keep-counts sum
    to the distinct-digest count."""
    from collections import Counter

    from hfsa_spark.operators.dedup import span_dedup

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    rows = span_dedup(df).collect()
    per_digest = Counter(r.span_digest for r in rows)
    keepers = Counter(r.span_digest for r in rows if r.keep)
    assert set(keepers) == set(per_digest)
    assert all(v == 1 for v in keepers.values())
    for r in rows:
        assert r.n_occurrences == per_digest[r.span_digest]


@_FAST
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["en", "de"]),
            st.integers(min_value=1, max_value=5),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_perplexity_buckets_grank_is_per_lang_permutation(spark, docs):
    """grank is a 1..n permutation within each language and bucket sizes
    respect the head/tail cuts."""
    import math

    from hfsa_spark.operators.text import perplexity_buckets

    rows = [
        (i, " ".join(f"t{j % 3}" for j in range(n)), lang)
        for i, (lang, n) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = perplexity_buckets(df, head_frac=0.3, tail_frac=0.3).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        n = len(rs)
        assert sorted(r.grank for r in rs) == list(range(1, n + 1))
        head_k = math.floor(n * 0.3)
        assert sum(1 for r in rs if r.bucket == "head") == head_k
        assert sum(1 for r in rs if r.bucket == "tail") == math.floor(n * 0.3)
