"""Exact-join τ scale probe: candidate volume and wall time of
setsim_join / containment_join (operators/dedup.py) across thresholds —
the evidence behind the docstrings' claim that the PPJoin prefix filter
only pays at production thresholds (τ≥0.8) and degrades toward the
naive element join as τ → 0.5.

The corpus reuses the planted clique/drift-chain synthesis from
dedup_scale_probe.py (3-cliques of near-dups at J≈0.85, 64-doc drift
chains whose Jaccard decays with distance, unique tails) so every τ has
real matching pairs AND a realistic sub-threshold candidate shelf.

Candidate counts come from the OPERATOR's own candidate stage
(_setsim_candidates / _containment_candidates) — not a re-derivation —
so the probe measures exactly what the join executes.

Usage:
    python scripts/setsim_tau_probe.py [n_docs]     # default 100,000

Prints one JSON line:
    {"probe": "setsim_tau", "n_docs": N, "rows": [
        {"op": "setsim", "tau": "4/5", "candidates": C,
         "pairs": P, "sec": S}, ...]}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from dedup_scale_probe import synthesize_corpus  # noqa: E402

from hfsa_spark import get_spark  # noqa: E402
from hfsa_spark.operators.dedup import (  # noqa: E402
    _containment_candidates,
    _setsim_candidates,
    containment_join,
    setsim_join,
)

TAUS = [(1, 2), (4, 5), (9, 10)]
SHINGLE_N = 3


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark("setsim_tau_probe")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = synthesize_corpus(spark, n).persist()
    corpus.count()

    rows = []
    for op, cand_fn, join_fn in [
        ("setsim", _setsim_candidates, setsim_join),
        ("containment", _containment_candidates, containment_join),
    ]:
        for num, den in TAUS:
            t0 = time.time()
            _, cand = cand_fn(corpus, "doc_id", "text", num, den, SHINGLE_N)
            n_cand = cand.count()
            t_cand = time.time() - t0
            t0 = time.time()
            n_pairs = join_fn(
                corpus, threshold_num=num, threshold_den=den,
                shingle_n=SHINGLE_N,
            ).count()
            t_join = time.time() - t0
            row = {
                "op": op,
                "tau": f"{num}/{den}",
                "candidates": n_cand,
                "pairs": n_pairs,
                "cand_sec": round(t_cand, 2),
                "join_sec": round(t_join, 2),
            }
            rows.append(row)
            print(f"# {row}", file=sys.stderr)

    corpus.unpersist()
    print(json.dumps({"probe": "setsim_tau", "n_docs": n, "rows": rows}))


if __name__ == "__main__":
    main()
