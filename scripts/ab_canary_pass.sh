#!/bin/bash
# One alpha_cpu evidence WINDOW (r10 VERDICT next-round #2): run the
# pinned r8-recorded tree (9d8cb99, worktree at /tmp/r8tree) over the
# same 22-query batch subset as scripts/data/bisect_r10.jsonl, TWICE
# back-to-back (each bench invocation is already min-of-3 per query;
# two make the window's merge depth 6 — the r10 fit showed shallow
# merges bias the time ratio, and therefore alpha, upward), min-merge
# the two, and append one window record to scripts/data/bisect_r11.jsonl.
# Each window in a different host state is one (cpu-canary, time-ratio)
# point for the alpha_cpu refit (scripts/fit_alpha.py).
#
# Usage: ab_canary_pass.sh [JSONL_OUT] [ROUND]
set -u
OUT="${1:-/root/repo/scripts/data/bisect_r11.jsonl}"
ROUND="${2:-${AB_ROUND:-11}}"
SUBSET="q15_path_rollup q18_summary_by_user q216_pagerank_dangling q131_pagerank q137_link_pagerank q148_neardup_safe_split q154_nb_classifier q155_bm25 q160_blocklist_filter q161_bm25_indexed q163_neardup_keeper q176_setsim_join q181_incremental_neardup q184_containment_join q09_topk_per_group q30_embedding_stats q52_salted_agg q80_kmeans_refine q99_jpeg_progressive q101_dup_char_ratio q107_bpe_merges q109_embedding_moments"

if [ ! -d /tmp/r8tree ]; then
    # fresh container: recreate the pinned tree (the r8-recorded commit)
    git -C /root/repo worktree add --detach /tmp/r8tree 9d8cb99 || exit 1
fi
cd /tmp/r8tree || exit 1
l1=$(python3 bench.py $SUBSET 2>/dev/null | tail -1)
l2=$(python3 bench.py $SUBSET 2>/dev/null | tail -1)
if [ -z "$l1" ] || [ -z "$l2" ]; then
    echo "r8tree bench produced no output" >&2
    exit 1
fi
python3 - "$OUT" "$l1" "$l2" "$ROUND" <<'EOF'
import json, sys, time
out = sys.argv[1]
# ADVICE r11: validate both lines parse and intersect the query sets —
# a query erroring in one pass must not abort the whole window append.
try:
    a, b = json.loads(sys.argv[2]), json.loads(sys.argv[3])
except (json.JSONDecodeError, IndexError) as e:
    sys.exit(f"ab_canary_pass: bench stdout line is not JSON ({e}); "
             f"window discarded")
common = set(a["queries"]) & set(b["queries"])
if not common:
    sys.exit("ab_canary_pass: no common queries between the two passes; "
             "window discarded")
dropped = (set(a["queries"]) | set(b["queries"])) - common
if dropped:
    print(f"ab_canary_pass: dropped from window (missing in one pass): "
          f"{sorted(dropped)}", file=sys.stderr)
qs = {k: min(a["queries"][k], b["queries"][k]) for k in sorted(common)}
d = {
    "metric": "ab_window",
    "queries": qs,
    "canary_sha256_256mb_sec": min(
        a["canary_sha256_256mb_sec"], b["canary_sha256_256mb_sec"]),
    "canary_membw_gbps": max(a["canary_membw_gbps"], b["canary_membw_gbps"]),
    "steal_pct": min(a["steal_pct"], b["steal_pct"]),
    "steal_per_pass": [a["steal_pct"], b["steal_pct"]],
    "n_queries": len(qs),
    "sf": a["sf"],
    "tree": "/tmp/r8tree",
    "round": int(sys.argv[4]),
    "window": int(time.time()),
    "t": time.time(),
}
with open(out, "a") as fh:
    fh.write(json.dumps(d) + "\n")
print("appended window: cpu", d["canary_sha256_256mb_sec"],
      "membw", d["canary_membw_gbps"], "steal", d["steal_per_pass"])
EOF
