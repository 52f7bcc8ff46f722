"""Dedup scale probe: MinHash → LSH → connected components at millions
of documents — the regime the gate's 5k-doc fixtures can't exercise —
printing one JSON line of wall times, CC rounds-to-converge, shuffle
volume, and LSH pair quality against planted ground truth.

The corpus is synthesized DISTRIBUTED (one codegen'd expression over
spark.range — no driver materialization) with three planted strata per
100-id block:

* offsets 0-2   — a 3-CLIQUE of near-dups (one word mutated per variant;
                  shingle-Jaccard ≈ 0.85 pairwise),
* offsets 3-66  — a DRIFT CHAIN of 64 docs: each step slides a word
                  stream by 3, so Jaccard decays with chain distance d
                  (≈0.85 at d=1, crossing 0.5 at d≈4) — the adversarial
                  long-component shape that separates O(diameter)
                  min-label CC from O(log n) large-star/small-star,
* offsets 67-99 — unique docs (disjoint token space; any candidate pair
                  touching them is an unambiguous false positive).

Ground truth is exact and enumerable: true pairs (real Jaccard ≥ 0.5)
only occur inside a block at chain distance ≤ ~4, so the probe computes
the REAL shingle-Jaccard of every candidate AND every planted pair and
reports precision/recall of the LSH candidate set at the 0.5 threshold —
the honest quality number, not just throughput.

Usage:
    python scripts/dedup_scale_probe.py [n_docs]      # default 2,000,000
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from hfsa_spark.operators.dedup import (
    connected_components,
    connected_components_star,
    minhash_lsh_candidates,
    minhash_signature,
    word_shingles,
)

BLOCK = 100          # ids per block
CLIQUE = 3           # offsets 0..2: 3-clique
CHAIN = 64           # offsets 3..66: drift chain
W = 40               # words per doc
DRIFT = 3            # words the chain slides per step
VOCAB = 30011


def synthesize_corpus(spark: SparkSession, n: int) -> DataFrame:
    """(doc_id, text) with planted cliques, drift chains, unique docs."""
    word = (
        # clique members share the block stream; variant v mutates word v*7+1
        f"CASE WHEN off < {CLIQUE} THEN"
        f"  CASE WHEN j = off * 7 + 1 THEN concat('m', off, '_', blk)"
        f"       ELSE concat('w', pmod(hash(blk * 1000 + j), {VOCAB})) END"
        # chain member p reads the block stream at offset p*DRIFT (+200 so
        # clique and chain streams never overlap)
        f" WHEN off < {CLIQUE + CHAIN} THEN"
        f"  concat('w', pmod(hash(blk * 1000 + 200 + (off - {CLIQUE}) * {DRIFT} + j),"
        f"         {VOCAB}))"
        # unique docs: tokens private to the doc
        f" ELSE concat('u', id, '_', j) END"
    )
    return (
        spark.range(n)
        .select(
            F.col("id"),
            (F.col("id") % BLOCK).alias("off"),
            (F.col("id") - F.col("id") % BLOCK).alias("blk"),
        )
        .select(
            F.col("id").alias("doc_id"),
            F.expr(
                f"array_join(transform(sequence(0, {W - 1}), j -> {word}), ' ')"
            ).alias("text"),
        )
    )


def planted_pairs(spark: SparkSession, n: int) -> DataFrame:
    """Every within-block pair that could plausibly be a true dup:
    the 3 clique pairs + chain pairs at distance 1..6 (Jaccard at d=7+
    is < 0.35 by construction — provably below the 0.5 truth cut)."""
    n_blocks = n // BLOCK
    pair_arr = (
        "array_union("
        "  flatten(transform(sequence(0, 1), a ->"
        "    transform(sequence(a + 1, 2), b -> struct(a AS a, b AS b)))),"
        f" flatten(transform(sequence({CLIQUE}, {CLIQUE + CHAIN - 1}), p ->"
        f"   transform(sequence(p + 1, least(p + 6, {CLIQUE + CHAIN - 1})),"
        "      q -> struct(p AS a, q AS b)))))"
    )
    return (
        spark.range(n_blocks)
        .select((F.col("id") * BLOCK).alias("blk"))
        .select(F.col("blk"), F.explode(F.expr(pair_arr)).alias("p"))
        .select(
            (F.col("blk") + F.col("p.a")).alias("id_a"),
            (F.col("blk") + F.col("p.b")).alias("id_b"),
        )
        .filter(F.col("id_b") < n)
    )


def with_jaccard(pairs: DataFrame, shingled: DataFrame) -> DataFrame:
    """Attach the REAL shingle-Jaccard to (id_a, id_b) pairs."""
    a = shingled.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = shingled.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", (inter / union).alias("jaccard"))
    )


def shuffle_stats(spark: SparkSession) -> dict:
    url = spark.sparkContext.uiWebUrl
    if not url:
        return {}
    app = spark.sparkContext.applicationId
    try:
        data = json.load(
            urllib.request.urlopen(f"{url}/api/v1/applications/{app}/stages")
        )
        return {
            "total_shuffle_write_mb": round(
                sum(s.get("shuffleWriteBytes", 0) for s in data) / 1e6, 1
            ),
            "peak_stage_shuffle_write_mb": round(
                max((s.get("shuffleWriteBytes", 0) for s in data), default=0) / 1e6, 1
            ),
            "n_stages": len(data),
        }
    except Exception:
        return {}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 4
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dedup_scale_probe")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "true")        # REST API = shuffle metrics
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    out: dict = {"metric": "dedup_scale_probe", "n_docs": n, "unit": "sec"}
    timings: dict[str, float] = {}

    def run(name: str, thunk):
        t0 = time.perf_counter()
        r = thunk()
        timings[name] = round(time.perf_counter() - t0, 2)
        print(f"  {name}: {timings[name]} s", file=sys.stderr)
        return r

    corpus = synthesize_corpus(spark, n).persist()
    run("synthesize", lambda: corpus.count())

    # --- MinHash signatures (8 hashes over 3-word shingles) -------------
    sigs = minhash_signature(corpus, "doc_id", "text", num_hashes=8).persist()
    n_sigs = run("minhash", lambda: sigs.count())
    out["minhash_docs_per_sec"] = round(n_sigs / timings["minhash"])

    # --- banded LSH candidate pairs --------------------------------------
    pairs = minhash_lsh_candidates(sigs, "doc_id", num_hashes=8, bands=4,
                                   max_bucket=1000).persist()
    n_pairs = run("lsh_pairs", lambda: pairs.count())
    out["n_candidate_pairs"] = n_pairs

    # --- pair quality vs planted ground truth (real Jaccard, cut 0.5) ---
    shingled = corpus.select(
        "doc_id", word_shingles("text", 3).alias("sh")
    ).persist()
    shingled.count()
    cand_j = with_jaccard(pairs, shingled).persist()
    truth_j = with_jaccard(planted_pairs(spark, n), shingled).persist()

    def quality():
        n_cand = cand_j.count()
        n_cand_true = cand_j.filter(F.col("jaccard") >= 0.5).count()
        n_truth = truth_j.filter(F.col("jaccard") >= 0.5).count()
        hit = (
            cand_j.filter(F.col("jaccard") >= 0.5)
            .join(truth_j.filter(F.col("jaccard") >= 0.5).select("id_a", "id_b"),
                  ["id_a", "id_b"], "left_semi")
            .count()
        )
        return n_cand, n_cand_true, n_truth, hit

    n_cand, n_cand_true, n_truth, hit = run("pair_quality", quality)
    out["pairs_precision_at_j05"] = round(n_cand_true / max(n_cand, 1), 4)
    out["pairs_recall_at_j05"] = round(hit / max(n_truth, 1), 4)
    out["n_true_pairs_j05"] = n_truth

    # --- connected components: large-star/small-star (the scale path) ---
    # both CC variants iterate EAGERLY (per-round convergence aggregates),
    # so construction belongs inside the timed thunk
    nodes = corpus.select("doc_id")

    def run_star():
        labels, rounds = connected_components_star(nodes, pairs, id_col="doc_id")
        labels = labels.persist()
        labels.count()
        return labels, rounds

    labels_star, rounds_star = run("cc_star", run_star)
    out["cc_star_rounds"] = rounds_star

    comp = labels_star.groupBy("group_id").count()
    sizes = {
        r["count"]: r["n"]
        for r in comp.groupBy("count").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    out["n_components_nontrivial"] = int(sum(v for k, v in sizes.items() if k > 1))
    out["largest_component"] = int(max(sizes))
    # planted: n/BLOCK cliques of 3 + n/BLOCK chains of 64
    out["planted_components"] = 2 * (n // BLOCK)

    # --- min-label CC on the same pairs: the O(diameter) twin ------------
    def run_minlabel():
        labels = connected_components(nodes, pairs, id_col="doc_id").persist()
        labels.count()
        return labels

    labels_min = run("cc_minlabel", run_minlabel)
    agree = (
        labels_star.alias("s")
        .join(labels_min.alias("m"), "doc_id")
        .filter(F.col("s.group_id") != F.col("m.group_id"))
        .count()
    )
    out["cc_variants_disagree_rows"] = int(agree)

    out.update(shuffle_stats(spark))
    out["timings"] = timings
    out["total_sec"] = round(sum(timings.values()), 2)
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
