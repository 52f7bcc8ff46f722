"""CC-shape scale probe (VERDICT r12 stretch #8): the r12 endpoints loop's
claimed win — rounds x CORPUS shuffle (old shape) vs rounds x PAIR
ENDPOINTS (new shape) — is invisible at sf0.1 (per-round tables tiny).
One pairs-heavy synthetic corpus pins it empirically: N nodes (default
1M), ~PAIRS pairs (default 100k) arranged as chains of length 8 within
id-blocks (multi-round convergence, like real near-dup clusters), nodes
outside chains isolated — the exact regime where the old shape carries
N rows per round for labels that can never change.

Both arms produce IDENTICAL output by construction (asserted: row count
+ XOR-ish checksum of (id, group_id) compared between arms).

Arm "corpus" replicates the pre-r12 loop verbatim (labels = all nodes,
per-round corpus-size join + localCheckpoint + count); arm "endpoints"
calls the shipped dedup.connected_components.

Usage: python scripts/cc_scale_probe.py [n_nodes] [n_pairs]
Prints one JSON line per arm: wall seconds, rounds, and the checksum.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hfsa_spark import get_spark  # noqa: E402


def corpus_arm(nodes, pairs, id_col="id", max_iter=50):
    """The pre-r12 shape: labels table = the full corpus every round."""
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = nodes.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("label")
    )
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("nbr_label"), F.col("label")),
                ).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("__changed"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter(F.col("__changed")).count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            break
    return (
        labels.select(F.col("node").alias(id_col), F.col("label").alias("group_id")),
        rounds,
    )


def checksum(df, id_col="id"):
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(id_col) * F.lit(31) + F.col("group_id")).alias("s"),
    ).first()
    return int(row["n"]), int(row["s"])


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    spark = get_spark("cc_scale_probe")

    # chains of length 8 (7 edges each) in the low offsets of 100-id
    # blocks: pair (k, k+1) for k%100 in [0,7) within the first
    # ceil(n_pairs/7) blocks — deterministic, multi-round (min-label over
    # a chain of 8 takes ~4 doubling-free rounds to converge)
    n_chains = -(-n_pairs // 7)
    spacing = max(8, n_nodes // n_chains)  # chain ids stay inside [0, n_nodes)
    pairs = (
        spark.range(n_chains * 7)
        .select(
            ((F.col("id") / 7).cast("long") * spacing + (F.col("id") % 7)).alias("id_a"),
            ((F.col("id") / 7).cast("long") * spacing + (F.col("id") % 7) + 1).alias("id_b"),
        )
        .localCheckpoint()
    )
    nodes = spark.range(n_nodes).select(F.col("id")).localCheckpoint()

    from hfsa_spark.operators.dedup import connected_components

    # two interleaved rounds per arm: round 0 pays session/codegen
    # warm-up for whichever arm goes first — compare the round-1 walls
    results = {}
    for rnd in (0, 1):
        for arm in ("endpoints", "corpus"):
            t0 = time.perf_counter()
            if arm == "endpoints":
                out = connected_components(nodes, pairs, id_col="id")
                rounds = None  # internal; convergence identical by construction
            else:
                out, rounds = corpus_arm(nodes, pairs, id_col="id")
                out = out.localCheckpoint(eager=True)
            n, s = checksum(out)
            wall = round(time.perf_counter() - t0, 3)
            results[arm] = (n, s)
            print(json.dumps({
                "arm": arm, "run": rnd, "wall_sec": wall, "rounds": rounds,
                "n_rows": n, "checksum": s,
                "n_nodes": n_nodes, "n_pairs": n_chains * 7,
            }))
    assert results["endpoints"] == results["corpus"], results
    print(json.dumps({"identical_output": True}))


if __name__ == "__main__":
    main()
