#!/bin/bash
# One alpha_cpu evidence pass (r10 VERDICT next-round #2): run the pinned
# r8-recorded tree (9d8cb99, worktree at /tmp/r8tree) over the same
# 22-query batch subset as scripts/data/bisect_r10.jsonl, capture the
# bench JSON line, and append it (annotated with tree + timestamp) to
# scripts/data/bisect_r11.jsonl. Each pass in a different host window is
# one (cpu-canary ratio, time ratio) point for the alpha_cpu fit: the
# tree is code-identical to its own committed record by construction, so
# any per-query drift is host, quantitatively.
#
# Usage: ab_canary_pass.sh [JSONL_OUT]
set -u
OUT="${1:-/root/repo/scripts/data/bisect_r11.jsonl}"
SUBSET="q15_path_rollup q18_summary_by_user q216_pagerank_dangling q131_pagerank q137_link_pagerank q148_neardup_safe_split q154_nb_classifier q155_bm25 q160_blocklist_filter q161_bm25_indexed q163_neardup_keeper q176_setsim_join q181_incremental_neardup q184_containment_join q09_topk_per_group q30_embedding_stats q52_salted_agg q80_kmeans_refine q99_jpeg_progressive q101_dup_char_ratio q107_bpe_merges q109_embedding_moments"

cd /tmp/r8tree || exit 1
line=$(python3 bench.py $SUBSET 2>/dev/null | tail -1)
if [ -z "$line" ]; then
    echo "r8tree bench produced no output" >&2
    exit 1
fi
python3 - "$OUT" "$line" <<'EOF'
import json, sys, time
out, line = sys.argv[1], sys.argv[2]
d = json.loads(line)
d["tree"] = "/tmp/r8tree"
d["round"] = 11
d["t"] = time.time()
with open(out, "a") as fh:
    fh.write(json.dumps(d) + "\n")
print("appended: batch mean", d["families"]["batch"]["mean"],
      "cpu", d.get("canary_sha256_256mb_sec"),
      "membw", d.get("canary_membw_gbps"), "steal", d.get("steal_pct"))
EOF
