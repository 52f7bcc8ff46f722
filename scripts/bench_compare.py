"""Per-query bench comparison across rounds (VERDICT r2 drift-watch item).

Usage: python scripts/bench_compare.py BENCH_LOCAL.json BENCH_r02.json

Reads per-query timings from a bench JSON (either the full-name
BENCH_LOCAL.json this repo writes, or a driver BENCH_r{N}.json whose
`parsed` may be null — in that case timings are recovered from the `tail`
stdout fragment) and prints a markdown ratio table plus the paired
geo-mean.
"""

from __future__ import annotations

import json
import math
import re
import sys


def load_timings(path: str) -> dict[str, float]:
    with open(path) as fh:
        d = json.load(fh)
    if "queries" in d:
        return d["queries"]
    if d.get("parsed"):
        return d["parsed"].get("queries", {})
    # driver artifact with parsed:null — recover from the tail fragment
    tail = d.get("tail", "")
    return {
        m.group(1): float(m.group(2))
        for m in re.finditer(r'"(q\d+[a-z_0-9]*|report_\w+|extract_\w+)":\s*([0-9.]+)', tail)
    }


def norm_key(k: str) -> str:
    """q01_pricing_summary and q01 compare as the same query."""
    m = re.match(r"^(q\d+)", k)
    return m.group(1) if m else k


def main() -> None:
    cur_path, prev_path = sys.argv[1], sys.argv[2]
    cur = {norm_key(k): v for k, v in load_timings(cur_path).items()}
    prev = {norm_key(k): v for k, v in load_timings(prev_path).items()}
    shared = sorted(set(cur) & set(prev))
    if not shared:
        print("no shared queries")
        return
    print(f"| query | {prev_path} | {cur_path} | ratio |")
    print("|---|---|---|---|")
    logs = []
    for k in shared:
        r = cur[k] / prev[k] if prev[k] > 0 else float("nan")
        if r == r:
            logs.append(math.log(r))
        print(f"| {k} | {prev[k]:.3f} | {cur[k]:.3f} | {r:.2f}x |")
    gm = math.exp(sum(logs) / len(logs))
    print(f"\npaired queries: {len(shared)}  geo-mean ratio: {gm:.3f}x")

    # r8+: host canaries, when both records carry them — a geo-mean
    # drift that tracks the canary ratio is host speed, not code
    # (BASELINE.md "Host-speed canaries")
    def canaries(path):
        with open(path) as fh:
            d = json.load(fh)
        d = d.get("parsed") or d
        return d.get("canary_sha256_256mb_sec"), d.get("canary_membw_gbps")

    (c_cpu, c_bw), (p_cpu, p_bw) = canaries(cur_path), canaries(prev_path)
    if c_cpu and p_cpu:
        print(f"canary cpu ratio: {c_cpu / p_cpu:.3f}x"
              f" (sha256 {p_cpu:.3f}s -> {c_cpu:.3f}s)")
    if c_bw and p_bw:
        print(f"canary membw ratio: {p_bw / c_bw:.3f}x"
              f" ({p_bw:.2f} -> {c_bw:.2f} GB/s; >1 = host got slower)")


if __name__ == "__main__":
    main()
