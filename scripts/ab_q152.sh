#!/bin/bash
# q152_dsir_scores anchor settlement (VERDICT r11 next-round #1).
#
# q152's committed r11 min (1.731 s, 0.04%-steal window) is 2.18x its
# pre-canary anchor (0.7934, recorded at commit 7e21227, 2026-08-14)
# while the batch fleet sits at ~1.04x its r8 level — the only per-query
# number moving AGAINST the fleet. Two hypotheses:
#   A) the anchor window was anomalously fast for q152 -> re-anchor (v3)
#   B) a code delta landed in 7e21227..HEAD -> bisect and fix
# Disentangle by running the PINNED 7e21227 tree and HEAD over the same
# 10-query subset (q152 + 9 controls whose anchors come from the SAME
# 7e21227 run), interleaved P,H,P,H in one window so host weather hits
# both sides equally:
#   - pinned q152 elevated like HEAD (ratio ~1)  -> hypothesis A
#   - pinned q152 fast, HEAD elevated (ratio <<1) -> hypothesis B
#
# Usage: ab_q152.sh [JSONL_OUT]
set -u
OUT="${1:-/root/repo/scripts/data/q152_ab_r12.jsonl}"
SUBSET="q152_dsir_scores q154_nb_classifier q155_bm25 q109_embedding_moments q131_pagerank q137_link_pagerank q148_neardup_safe_split q101_dup_char_ratio q107_bpe_merges q30_embedding_stats"
PIN=7e21227

if [ ! -d /tmp/q152tree ]; then
    git -C /root/repo worktree add --detach /tmp/q152tree "$PIN" || exit 1
fi

run_side() { # $1 = dir
    (cd "$1" && python3 bench.py $SUBSET 2>/dev/null | tail -1)
}

p1=$(run_side /tmp/q152tree)
h1=$(run_side /root/repo)
p2=$(run_side /tmp/q152tree)
h2=$(run_side /root/repo)

python3 - "$OUT" "$p1" "$p2" "$h1" "$h2" <<'EOF'
import json, sys, time
out = sys.argv[1]
try:
    p1, p2, h1, h2 = (json.loads(x) for x in sys.argv[2:6])
except (json.JSONDecodeError, IndexError) as e:
    sys.exit(f"ab_q152: a bench stdout line is not JSON ({e}); window discarded")

def merge(a, b):
    common = set(a["queries"]) & set(b["queries"])
    return {k: min(a["queries"][k], b["queries"][k]) for k in sorted(common)}

pin, head = merge(p1, p2), merge(h1, h2)
# the 7e21227 tree predates the r8 canary wiring — fields may be absent
d = {
    "metric": "q152_ab_window",
    "pin_tree": "7e21227",
    "pinned": pin,
    "head": head,
    "head_canary_sha256_256mb_sec": min(
        x["canary_sha256_256mb_sec"] for x in (h1, h2)
        if x.get("canary_sha256_256mb_sec")) if any(
        x.get("canary_sha256_256mb_sec") for x in (h1, h2)) else None,
    "head_canary_membw_gbps": max(
        x["canary_membw_gbps"] for x in (h1, h2)
        if x.get("canary_membw_gbps")) if any(
        x.get("canary_membw_gbps") for x in (h1, h2)) else None,
    "head_steal_per_pass": [h1.get("steal_pct"), h2.get("steal_pct")],
    "sf": h1["sf"],
    "round": 12,
    "t": time.time(),
}
with open(out, "a") as fh:
    fh.write(json.dumps(d) + "\n")
anch = {"q152_dsir_scores": 0.7934, "q154_nb_classifier": 1.9521,
        "q155_bm25": 1.5131, "q109_embedding_moments": 2.0616,
        "q131_pagerank": 2.7671, "q137_link_pagerank": 1.9683,
        "q148_neardup_safe_split": 2.2974, "q101_dup_char_ratio": 1.6765,
        "q107_bpe_merges": 2.0166, "q30_embedding_stats": 0.1732}
print(f"{'query':30s} {'anchor':>7s} {'pinned':>7s} {'head':>7s} "
      f"{'pin/anch':>8s} {'head/pin':>8s}")
for k in sorted(pin):
    a = anch.get(k)
    print(f"{k:30s} {a:7.3f} {pin[k]:7.3f} {head.get(k, float('nan')):7.3f} "
          f"{pin[k]/a:8.2f} {head.get(k, float('nan'))/pin[k]:8.2f}")
EOF
