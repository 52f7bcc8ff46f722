"""Deduplication operators for large-scale training-data pipelines.

Beyond-reference surface (SURVEY.md §7 phase 4): exact dedup, MinHash+LSH
near-dup, SimHash, and n-gram Jaccard — all as declarative DataFrame
transformations designed for the 100 TB path:

* **exact**: hash-groupBy on a digest of the normalized text. One shuffle
  keyed on the digest; map-side partial agg collapses duplicates early.
* **MinHash+LSH**: shingle → k minhashes → band buckets → self-join within
  buckets. The self-join is banded so the shuffle key is (band_id, band
  hash) — candidate pairs only ever meet inside a bucket, never a global
  cross join. Skewed buckets (boilerplate docs) are handled by AQE skew
  splitting; a bucket-size cap drops degenerate buckets (standard practice
  at web scale).
* **SimHash**: 16/32-bit signature by bit-voting over token hashes —
  expressed entirely with explode + groupBy (codegen'd, no UDF).
* **n-gram Jaccard**: exact verification on candidate pairs (shingle
  intersection / union via explode + join), used as the precise re-rank
  after LSH recall.

Everything uses the portable md5-based hash (functions/hashing.py) so each
operator has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hfsa_spark.functions.hashing import portable_hash64, portable_hash_hex

# ---------------------------------------------------------------- exact --


def normalize_text(c: Column | str) -> Column:
    """Canonical form for exact dedup: lowercase, collapse whitespace, trim."""
    col = F.col(c) if isinstance(c, str) else c
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per distinct normalized text: (digest, doc_count, keep_id).

    keep_id = min(id) — the canonical representative. Scale: single shuffle
    on the 32-hex digest; cardinality = distinct docs.
    """
    return (
        df.select(F.col(id_col), F.md5(normalize_text(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.min(id_col).alias("keep_id"),
        )
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Return the deduplicated rows (keep the min-id representative of each
    exact-duplicate group). Implemented as a window-free groupBy + semi join
    so the heavy payload column is only shuffled once."""
    keep = exact_dedup_groups(df, id_col, text_col).select(F.col("keep_id").alias(id_col))
    return df.join(keep, id_col, "left_semi")


def incremental_dedup(
    new_df: DataFrame,
    index_df: DataFrame,
    id_col: str,
    text_col: str,
    index_digest_col: str = "digest",
) -> DataFrame:
    """Dedupe a NEW document batch against an existing corpus digest index
    (the incremental-ingestion step: each crawl drop is cleaned against
    everything already accepted), then exact-dedupe within the batch.

    ``index_df`` carries one ``index_digest_col`` (md5 of normalized text)
    per already-ingested document — the persisted output of
    :func:`exact_dedup_groups` from prior batches.

    Scale: the index side is projected to the single digest column before
    the anti join (column pruning keeps a billions-row index cheap to
    shuffle), and the join key is the digest itself, so both sides
    hash-partition on it — at 100 TB this is one co-partitioned shuffle,
    no broadcast needed. The in-batch dedup reuses the batch digest, so
    the batch text is hashed exactly once.
    """
    hashed = new_df.withColumn("__digest", F.md5(normalize_text(text_col)))
    fresh = hashed.join(
        index_df.select(F.col(index_digest_col).alias("__digest")),
        "__digest",
        "left_anti",
    )
    keep = (
        fresh.groupBy("__digest")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return fresh.join(keep, id_col, "left_semi").drop("__digest")


# -------------------------------------------------------------- shingles --


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column — a higher-order
    expression (split / sequence / transform), fully codegen'd."""
    col = F.col(text) if isinstance(text, str) else text
    words = F.split(F.trim(F.lower(col)), r"\s+")
    return F.array_distinct(
        F.when(
            F.size(words) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(words) - (n - 1)),
                lambda i: F.array_join(F.slice(words, i, n), " "),
            ),
        ).otherwise(F.array(F.array_join(words, " ")))
    )


# -------------------------------------------------------------- minhash --


def minhash_signature(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, mh_0..mh_{k-1}) — k independent minhashes, each the min over
    shingles of a seeded portable hash. Hex strings of fixed width, so
    ``min`` is portable to the SQL oracle.

    Scale: explode(shingles) multiplies rows by shingle count, but the k
    mins aggregate map-side; the shuffle carries one row per doc.
    """
    from hfsa_spark.plans import parallelize_compute

    exploded = parallelize_compute(df.select(id_col, text_col)).select(
        F.col(id_col), F.explode(word_shingles(text_col, shingle_n)).alias("shingle")
    )
    aggs = [
        F.min(portable_hash_hex("shingle", seed=i)).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return exploded.groupBy(id_col).agg(*aggs)


def minhash_lsh_candidates(
    signatures: DataFrame,
    id_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) from banded LSH.

    rows_per_band = num_hashes // bands; docs sharing ALL minhashes inside
    any band collide. The pair join happens per (band, bucket) — a shuffle
    keyed on the band hash, never a global cross join. Buckets larger than
    ``max_bucket`` are dropped (degenerate boilerplate; at web scale these
    would otherwise produce O(n²) pairs).
    """
    rows_per_band = num_hashes // bands
    assert rows_per_band * bands == num_hashes, "bands must divide num_hashes"

    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "|", *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
                ).alias("key"),
            )
            for b in range(bands)
        ]
    )
    banded = signatures.select(F.col(id_col), F.explode(band_structs).alias("bk")).select(
        F.col(id_col), F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )

    return _bucket_pairs(banded, id_col, max_bucket)


def _bucket_pairs(banded: DataFrame, id_col: str, max_bucket: int) -> DataFrame:
    """(band, key, id) rows → distinct candidate pairs (id_a < id_b) formed
    within each bucket. The pair explosion happens after a groupBy keyed on
    (band, key), so candidates only ever meet inside a bucket — never a
    global cross join. Buckets larger than ``max_bucket`` are dropped
    (degenerate boilerplate; at web scale these would be O(n²))."""
    sized = banded.groupBy("band", "key").agg(F.collect_list(id_col).alias("ids"))
    return (
        sized.filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
        .select(
            F.explode(
                F.filter(
                    F.flatten(
                        F.transform(
                            F.col("ids"),
                            lambda a: F.transform(F.col("ids"), lambda b: F.struct(a.alias("a"), b.alias("b"))),
                        )
                    ),
                    lambda p: p["a"] < p["b"],
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"))
        .distinct()
    )


# -------------------------------------------------------------- simhash --


def simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 16,
) -> DataFrame:
    """(id, simhash) — bit-voting simhash over whitespace tokens.

    Pure explode + conditional sums: for each bit j, vote +1/-1 per token
    depending on bit j of the token hash; sign of the vote sets bit j.
    Scale: the per-doc aggregation is map-side combinable; shuffle carries
    one row per doc. ``bits`` ≤ 32 keeps the signature in an int.
    """
    from hfsa_spark.plans import parallelize_compute

    tokens = parallelize_compute(df.select(id_col, text_col)).select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(text_col)), r"\s+")).alias("tok"),
    ).filter(F.length("tok") > 0)
    h = portable_hash64("tok")
    votes = tokens.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v_{j}")
            for j in range(bits)
        ]
    )
    sig = None
    for j in range(bits):
        bit = F.when(F.col(f"v_{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return votes.select(F.col(id_col), sig.cast("long").alias("simhash"))


def hamming_distance(a: Column | str, b: Column | str) -> Column:
    """Popcount of XOR — bit_count is a built-in in Spark ≥ 3.3."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.bit_count(ca.bitwiseXOR(cb))


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 16,
    max_hamming: int = 3,
    bands: int | None = None,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Near-duplicate pairs by SimHash: (id_a, id_b, hamming) for every pair
    whose ``bits``-bit signatures differ in ≤ ``max_hamming`` bit positions.

    Exact recall via the pigeonhole banding trick: the signature is split
    into ``bands`` contiguous chunks with bands > max_hamming, so any pair
    within the Hamming radius agrees EXACTLY on at least one chunk.
    Candidate generation is therefore an equi self-join keyed on
    (band, chunk value) — one shuffle, never a cross join — followed by an
    exact popcount verify on the joined signatures. At 100 TB use bits=64
    with bands = max_hamming + 1 (the classic 64-bit/4-band layout); the
    signature column is a single long either way.
    """
    if bands is None:
        bands = max_hamming + 1
    if bands <= max_hamming:
        raise ValueError(
            f"bands ({bands}) must exceed max_hamming ({max_hamming}) for full recall"
        )

    sigs = simhash(df, id_col, text_col, bits=bits)

    # contiguous chunk boundaries covering all `bits` (widths differ by ≤1)
    edges = [round(b * bits / bands) for b in range(bands + 1)]
    chunks = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright("simhash", edges[b])
                .bitwiseAND(F.lit((1 << (edges[b + 1] - edges[b])) - 1))
                .cast("string")
                .alias("key"),
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select(F.col(id_col), F.explode(chunks).alias("bk")).select(
        F.col(id_col), F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    cand = _bucket_pairs(banded, id_col, max_bucket)

    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("_sig_a"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("_sig_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("hamming", hamming_distance("_sig_a", "_sig_b"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ------------------------------------------------- duplicate components --


def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    max_iter: int = 50,
) -> DataFrame:
    """Group duplicate-pair edges into components: returns (id, group_id)
    where group_id = the minimum node id reachable through the pair graph.
    This is the step that turns pairwise near-dup evidence (LSH/Jaccard
    output) into dedup groups with one canonical representative each.

    Iterative min-label propagation: each round every node takes the min
    of its own label and its neighbors' labels; converges in O(component
    diameter) rounds (near-dup components are shallow — dozens of rounds
    cover pathological chains). Each round is one shuffle keyed on node id;
    ``localCheckpoint`` truncates lineage so plans stay flat. The
    convergence check is an aggregate, not a collect of the data.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = nodes.select(F.col(id_col).alias("node"), F.col(id_col).alias("label"))

    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))).alias(
                    "label"
                ),
                (F.col("nbr_label") < F.col("label")).alias("__changed"),
            )
            .localCheckpoint(eager=False)
        )
        # the full count both materializes the (lazy) checkpoint and is the
        # convergence check — one job per round instead of two
        changed = new_labels.filter(F.col("__changed")).count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            break
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("group_id"))


def connected_components_star(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    max_iter: int = 30,
) -> tuple[DataFrame, int]:
    """Connected components by alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14 — public algorithm): same (id, group_id) contract as
    ``connected_components`` but O(log n) rounds instead of O(diameter) —
    the upgrade path for adversarial near-dup CHAINS (contaminated
    boilerplate threading thousands of docs), where min-label propagation
    needs one shuffle round per hop.

    Per round: large-star points every node's larger neighbors at its
    neighborhood min (2 shuffles: groupBy + join), small-star re-points the
    smaller neighbors; the fixed point is stars rooted at each component's
    min id. Convergence is checked with a (count, hash-sum) signature — one
    tiny aggregate, no driver-side edge collection. Returns
    (labels, rounds_used).
    """
    fwd = pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    sym = (
        fwd.union(fwd.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    edges = sym
    prev_sig = None
    rounds = 0
    star = None
    for rounds in range(1, max_iter + 1):
        # large-star: u's neighborhood min m = least(u, min neighbors);
        # every neighbor v > u re-points to m (m < v always, so the
        # output is high→low directed)
        mins = edges.groupBy("u").agg(
            F.least(F.col("u"), F.min("v")).alias("m")
        )
        ls = (
            edges.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star on the directed (u → v<u) edges: all of u's smaller
        # neighbors (and u itself) point at u's min
        mins2 = ls.groupBy("u").agg(F.min("v").alias("m"))
        star = (
            ls.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins2.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        # hash bounded to 2^40 so the ANSI-mode sum can't overflow long
        # before ~2^23 edges per partition of the sum
        sig = tuple(
            star.agg(
                F.count(F.lit(1)),
                F.coalesce(
                    F.sum(F.pmod(F.xxhash64("u", "v"), F.lit(1 << 40))), F.lit(0)
                ),
            ).collect()[0]
        )
        if sig == prev_sig:
            break
        prev_sig = sig
        edges = star.union(
            star.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )

    labels = nodes.select(F.col(id_col).alias("u")).join(star, "u", "left")
    out = labels.select(
        F.col("u").alias(id_col),
        F.coalesce(F.col("v"), F.col("u")).alias("group_id"),
    )
    return out, rounds


# -------------------------------------------------------------- jaccard --


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs (id_a < id_b).

    Without ``candidates``, pairs are generated by joining on shared
    shingles (docs with no common shingle can't exceed 0 similarity, so
    this is exact while avoiding the cross join). With ``candidates``
    (e.g. LSH output) it verifies only those pairs — the scale path.
    """
    from hfsa_spark.plans import parallelize_compute

    shingled = parallelize_compute(df.select(id_col, text_col)).select(
        F.col(id_col).alias("id"), F.explode(word_shingles(text_col, shingle_n)).alias("sh")
    )
    sizes = shingled.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))

    a = shingled.alias("a")
    b = shingled.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    if candidates is not None:
        common = common.join(candidates, ["id_a", "id_b"], "left_semi")

    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    )
