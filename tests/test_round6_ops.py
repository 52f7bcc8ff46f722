"""Round-6 operators: snapshot inode diff, tokenizer fertility,
quality-drift PSI."""

from pyspark.sql import functions as F


def test_snapshot_inode_diff_statuses(spark):
    from hfsa_spark.streaming.snapshots import snapshot_inode_diff

    old = spark.createDataFrame(
        [("/a", 10), ("/b", 20), ("/c", 30)], ["full_path", "file_size"]
    )
    new = spark.createDataFrame(
        [("/a", 10), ("/b", 25), ("/d", 40)], ["full_path", "file_size"]
    )
    got = {r.path: (r.status, r.old_size, r.new_size)
           for r in snapshot_inode_diff(old, new).collect()}
    assert got == {
        "/a": ("unchanged", 10, 10),
        "/b": ("modified", 20, 25),
        "/c": ("deleted", 30, None),
        "/d": ("added", None, 40),
    }


def test_tokenizer_byte_fertility_integer_ratios(spark):
    from hfsa_spark.operators.text import tokenizer_byte_fertility

    # 'aa bb' = 2 tokens, 5 chars; 'ccc' = 1 token 3 chars; one 2-byte char
    df = spark.createDataFrame(
        [(1, "aa bb", "en"), (2, "ccc", "en"), (3, "é", "fr")],
        ["doc_id", "text", "lang"],
    )
    out = {r.lang: r for r in tokenizer_byte_fertility(df).collect()}
    en = out["en"]
    assert (en.n_docs, en.n_tokens, en.n_chars, en.n_bytes) == (2, 3, 8, 8)
    assert en.chars_per_token_micro == 8 * 1000000 // 3
    fr = out["fr"]
    assert (fr.n_tokens, fr.n_chars, fr.n_bytes) == (1, 1, 2)
    assert fr.bytes_per_token_micro == 2_000_000


def test_tokenizer_byte_fertility_empty_group_zero_ratio(spark):
    from hfsa_spark.operators.text import tokenizer_byte_fertility

    df = spark.createDataFrame([(1, "   ", "zz")], ["doc_id", "text", "lang"])
    r = tokenizer_byte_fertility(df).collect()[0]
    assert r.n_tokens == 0 and r.chars_per_token_micro == 0


def test_quality_drift_psi_identical_halves_zero(spark):
    from hfsa_spark.operators.features import quality_drift_psi

    df = spark.createDataFrame(
        [(i, (i * 53) % 1000) for i in range(200)], ["doc_id", "score"]
    )
    out = quality_drift_psi(df, df, n_bins=10, lo=0, hi=1000).collect()
    assert len(out) == 10
    assert all(r.psi_contrib == 0 and r.lr_micro == 0 for r in out)


def test_quality_drift_psi_detects_shift(spark):
    from hfsa_spark.operators.features import quality_drift_psi

    ref = spark.createDataFrame(
        [(i, i % 500) for i in range(500)], ["doc_id", "score"]
    )
    cur = spark.createDataFrame(  # shifted up by 500
        [(i, 500 + (i % 500)) for i in range(500)], ["doc_id", "score"]
    )
    out = quality_drift_psi(ref, cur, n_bins=10, lo=0, hi=1000).collect()
    total = sum(r.psi_contrib for r in out)
    # complete disjoint shift: PSI far above the 0.25 alert (2.5e11 mu^2)
    assert total > 2_500_000_000_00
    # contributions positive where ref mass sits, negative where cur sits
    by_bin = {r.bin: r for r in out}
    assert by_bin[0].psi_contrib > 0 and by_bin[9].psi_contrib > 0


def test_quality_drift_psi_partition_invariant(spark):
    from hfsa_spark.operators.features import quality_drift_psi

    ref = spark.createDataFrame(
        [(i, (i * 31) % 600) for i in range(300)], ["doc_id", "score"]
    )
    cur = spark.createDataFrame(
        [(i, (i * 17) % 600) for i in range(300)], ["doc_id", "score"]
    )
    a = {(r.bin, r.psi_contrib)
         for r in quality_drift_psi(ref, cur, lo=0, hi=600).collect()}
    b = {(r.bin, r.psi_contrib)
         for r in quality_drift_psi(
             ref.repartition(7), cur.repartition(5), lo=0, hi=600).collect()}
    assert a == b


def test_drift_segment_write_is_idempotent(spark, tmp_path):
    """An at-least-once replay of a batch rewrites exactly its own
    segment — the monitor table stays exactly-once."""
    from hfsa_spark.streaming.drift import (
        read_drift_monitor,
        write_drift_segment,
    )

    ref = spark.createDataFrame(
        [(i, (i * 7) % 100) for i in range(100)], "doc_id long, score long"
    )
    batch = spark.createDataFrame(
        [(i, (i * 13) % 100) for i in range(50)], "doc_id long, score long"
    )
    out = str(tmp_path / "monitor")
    write_drift_segment(batch, ref, out, 0, n_bins=5, lo=0, hi=100)
    first = {(r.seg, r.bin): r.psi_contrib
             for r in read_drift_monitor(spark, out).collect()}
    # replay the same batch id — must overwrite, not duplicate
    write_drift_segment(batch, ref, out, 0, n_bins=5, lo=0, hi=100)
    again = {(r.seg, r.bin): r.psi_contrib
             for r in read_drift_monitor(spark, out).collect()}
    assert first == again and len(first) == 5
    # a second batch adds its own segment only
    write_drift_segment(ref, ref, out, 1, n_bins=5, lo=0, hi=100)
    allrows = read_drift_monitor(spark, out).collect()
    assert {r.seg for r in allrows} == {0, 1}
    # self-comparison segment is exactly zero
    assert all(r.psi_contrib == 0 for r in allrows if r.seg == 1)


# ------------------------------------------------ property invariants --
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_FAST = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_FAST
@given(
    st.lists(st.integers(min_value=0, max_value=999), min_size=2, max_size=30),
    st.lists(st.integers(min_value=0, max_value=999), min_size=2, max_size=30),
)
def test_psi_antisymmetry_property(spark, xs, ys):
    """Swapping ref and cur negates every lr_micro exactly and keeps
    |psi_contrib| within one smoothing quantum (p/q floor asymmetry)."""
    from hfsa_spark.operators.features import quality_drift_psi

    ref = spark.createDataFrame(
        [(i, v) for i, v in enumerate(xs)], "doc_id long, score long"
    )
    cur = spark.createDataFrame(
        [(i, v) for i, v in enumerate(ys)], "doc_id long, score long"
    )
    ab = {r.bin: r for r in
          quality_drift_psi(ref, cur, n_bins=5, lo=0, hi=1000).collect()}
    ba = {r.bin: r for r in
          quality_drift_psi(cur, ref, n_bins=5, lo=0, hi=1000).collect()}
    for b in ab:
        assert ab[b].lr_micro == -ba[b].lr_micro
        assert ab[b].ref_n == ba[b].cur_n and ab[b].cur_n == ba[b].ref_n


@_FAST
@given(st.lists(st.text(alphabet="ab é", min_size=0, max_size=20),
                min_size=1, max_size=10))
def test_byte_fertility_count_identities(spark, texts):
    """bytes ≥ chars always (UTF-8), and group totals equal the sum of
    per-document counts."""
    from hfsa_spark.operators.text import tokenizer_byte_fertility

    df = spark.createDataFrame(
        [(i, t, "g") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string",
    )
    r = tokenizer_byte_fertility(df).collect()[0]
    assert r.n_bytes >= r.n_chars
    assert r.n_docs == len(texts)
    assert r.n_chars == sum(len(t) for t in texts)
    assert r.n_bytes == sum(len(t.encode("utf-8")) for t in texts)


@_FAST
@given(st.lists(st.tuples(st.integers(0, 20), st.integers(0, 50)),
                min_size=1, max_size=20))
def test_snapshot_diff_partitions_the_union(spark, rows):
    """Every path in old ∪ new appears exactly once, with the status
    matching a direct dict comparison."""
    from hfsa_spark.streaming.snapshots import snapshot_inode_diff

    old_d = {f"/p{k}": v for k, v in rows[: len(rows) // 2 + 1]}
    new_d = {f"/p{k}": v + (k % 2) for k, v in rows[len(rows) // 3 :]}
    old = spark.createDataFrame(
        list(old_d.items()) or [("/none", 0)], ["full_path", "file_size"]
    )
    new = spark.createDataFrame(
        list(new_d.items()) or [("/none2", 0)], ["full_path", "file_size"]
    )
    od = old_d or {"/none": 0}
    nd = new_d or {"/none2": 0}
    got = {r.path: r.status
           for r in snapshot_inode_diff(old, new).collect()}
    assert set(got) == set(od) | set(nd)
    for p in got:
        if p not in nd:
            assert got[p] == "deleted"
        elif p not in od:
            assert got[p] == "added"
        elif od[p] != nd[p]:
            assert got[p] == "modified"
        else:
            assert got[p] == "unchanged"


def test_nfc_dedup_collapses_nfd_variants(spark):
    from hfsa_spark.operators.dedup import nfc_dedup_groups

    nfc = "café"          # é composed
    nfd = "café"         # e + combining acute
    rows = [(1, nfc), (2, nfd), (3, "other"), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.keep_id: (r.doc_count, r.n_denorm)
           for r in nfc_dedup_groups(df).collect() if r.keep_id is not None
           and r.doc_count}
    groups = nfc_dedup_groups(df).collect()
    by_keep = {r.keep_id: r for r in groups}
    assert by_keep[1].doc_count == 2 and by_keep[1].n_denorm == 1
    assert by_keep[3].doc_count == 1 and by_keep[3].n_denorm == 0
    # NULL text forms its own null-digest group, not a crash
    assert any(r.digest is None for r in groups)


def test_nfkc_dedup_collapses_compat_variants(spark):
    from hfsa_spark.operators.dedup import nfc_dedup_groups

    rows = [(1, "file 6"), (2, "ﬁle ６"), (3, "file 7")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # NFC keeps the ligature/fullwidth doc distinct; NFKC collapses it
    nfc = {r.keep_id: r.doc_count
           for r in nfc_dedup_groups(df).collect()}
    assert nfc == {1: 1, 2: 1, 3: 1}
    nfkc = {r.keep_id: (r.doc_count, r.n_denorm)
            for r in nfc_dedup_groups(df, form="NFKC").collect()}
    assert nfkc == {1: (2, 1), 3: (1, 0)}
