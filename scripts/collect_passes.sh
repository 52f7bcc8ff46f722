#!/bin/bash
# Opportunistic clean-window bench collector (VERDICT r10 item 1).
#
# Runs full `python bench.py` passes back-to-back for the whole round,
# gating each launch on a 20-second steal probe: a pass only starts when
# instantaneous steal is below the protocol's 0.5% recording rule
# (BASELINE.md:133). Output passes land in $OUTDIR/pass_NN.json; the
# round-close min-merge (scripts/merge_bench.py) consumes them all and
# each pass's own recorded steal_pct decides whether it qualifies.
#
# Usage: collect_passes.sh [OUTDIR] [MAX_PASSES]
set -u
OUTDIR="${1:-/tmp/r11_passes}"
MAX="${2:-12}"
mkdir -p "$OUTDIR"
cd /root/repo

steal_now() {
    # 20s steal sample from /proc/stat field 8 (percent, 2 decimals)
    read -r _ u0 n0 s0 i0 w0 q0 sq0 st0 _ < /proc/stat
    sleep 20
    read -r _ u1 n1 s1 i1 w1 q1 sq1 st1 _ < /proc/stat
    local t0=$((u0+n0+s0+i0+w0+q0+sq0+st0))
    local t1=$((u1+n1+s1+i1+w1+q1+sq1+st1))
    local dt=$((t1-t0)); [ "$dt" -le 0 ] && dt=1
    awk -v a="$((st1-st0))" -v b="$dt" 'BEGIN{printf "%.2f", 100*a/b}'
}

n=0
while [ "$n" -lt "$MAX" ]; do
    s=$(steal_now)
    ok=$(awk -v s="$s" 'BEGIN{print (s < 0.5) ? 1 : 0}')
    ts=$(date +%H:%M:%S)
    if [ "$ok" = "1" ]; then
        n=$((n+1))
        out="$OUTDIR/pass_$(printf '%02d' "$n").json"
        echo "[$ts] steal=$s% < 0.5% -> launching pass $n -> $out"
        python bench.py > "$OUTDIR/pass_$(printf '%02d' "$n").log" 2>&1
        rc=$?
        # bench.py (full run, no --record) writes the repo-root scratch
        # file BENCH_RUN.json; snapshot it as this pass's record.
        [ "$rc" = "0" ] && cp BENCH_RUN.json "$out"
        echo "[$(date +%H:%M:%S)] pass $n done rc=$rc"
    else
        echo "[$ts] steal=$s% >= 0.5% -> waiting 120s"
        sleep 120
    fi
done
echo "collector done: $n passes in $OUTDIR"
