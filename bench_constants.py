"""Single source of truth for the bench gate's canary-normalization
constants and family classification (r10 VERDICT stretch 8: these lived
in both bench.py and scripts/merge_bench.py, where a drifted copy would
silently skew the gate).

Provenance of each value is documented at its definition; the model
itself is derived and evidenced in BASELINE.md ("canary normalization")
and PERFORMANCE.md ("round-10 canary calibration").
"""

from __future__ import annotations

# Reference memory-bandwidth canary (256 MiB numpy copy, GB/s): the r8
# five-pass committed record's conditions, under which the current anchor
# margin was established. The r7->r8 bisect proved code-identical trees
# drift linearly with this axis.
REF_MEMBW_GBPS = 2.98

# Reference single-thread CPU canary (sha256 over 256 MiB, seconds): same
# r8 record. Round 9 proved this axis drifts independently of membw.
REF_CPU_SEC = 0.1373

# Sensitivity of batch time to the CPU-canary ratio. RETIRED to 0.0 in
# r13 (VERDICT r12 #7, closing the carried alpha decision): the final
# refit over ALL committed pinned-tree evidence (25 points across
# bisect_r10/r11/r12.jsonl via scripts/fit_alpha.py; 22 included, 12+
# clean sub-0.5%-steal windows — the evidence bar the r12 plan set) puts
# the LS at 0.863 but with a point band of [0.23, 2.42] under the linear
# membw treatment and [0.07, 1.55] under the banded one — the term is
# real but steal-confounded and cannot be pinned tighter than a factor
# of ~2 by this methodology. Meanwhile the RAW gate passes with margin
# (r12 committed 1.72-1.79x of the r1 anchor band; r13 sits lower), so
# the responsible call is the verdict-sanctioned alternative: retire the
# CPU credit entirely. alpha=0 makes every normalized number MORE
# conservative (a slow-CPU window now gets no credit; the penalty
# direction was never cpu-dependent), cannot hide a regression, and
# removes the one under-evidenced term from the model. Normalization is
# now membw-linear only, still credit-clamped at CANARY2_CREDIT_FLOOR.
# Fit provenance retained: alpha_ls=0.863, n=22, scripts/fit_alpha.py
# over bisect_r10+r11+r12.jsonl, 2026-08-18.
ALPHA_CPU = 0.0

# Bound on the total canary credit (r10 VERDICT "What's wrong" #2 and
# ADVICE: on a slow-canary host the two-axis correction reached 0.67x on
# the driver's noisy single pass — more correction than the two-point
# alpha fit can responsibly support). The combined factor is clamped to
# at most this much CREDIT; the penalty direction (factor > 1, fast host)
# is never clamped — penalizing ourselves needs no evidence bar.
CANARY2_CREDIT_FLOOR = 0.75

# Absolute scheduling-floor grace for the per-query regression flag
# (seconds). Designed for the ~90 sub-second queries where local[32] job
# scheduling dominates; see perq_threshold() for how it is applied.
PERQ_ABS_GRACE_SEC = 0.4

# Family classification (BASELINE.md "family rules"): lifecycle gates run
# real start->drain->stop / write-layout-then-serve cycles dominated by
# fixed per-run commit IO and are compared per-query, never in a mean.
STREAMING_LIFECYCLE = {
    "q93_streaming_dedup", "q94_interval_join", "q164_streaming_index",
    "q199_streaming_drift", "q205_streaming_cdc", "q210_streaming_ivf",
    "q212_streaming_cdc_bucketed", "q215_merge_on_read",
}
MAINTENANCE_LIFECYCLE = {
    "q211_bucketed_merge", "q213_ivf_compaction", "q214_bucketed_pit",
    "q217_bucketed_evolve",
    # r12 (VERDICT r11 #3): q161 writes a fresh inverted index inside the
    # timed query (__spark_entry__.py q161 body) — a write-layout-then-
    # serve gate by BASELINE.md's family rule, misclassified as batch
    # since its introduction. The serve-only latency signal moves to
    # q161b_bm25_serve (prebuilt index), which stays in batch.
    "q161_bm25_indexed",
}


def canary2_factor(cpu_sec: float | None, membw_gbps: float | None) -> float:
    """Combined two-axis normalization factor (multiply a measured time by
    this to express it at reference-host conditions), credit-clamped at
    CANARY2_CREDIT_FLOOR. Either canary may be None/0 = axis unavailable."""
    f = 1.0
    if membw_gbps:
        f *= membw_gbps / REF_MEMBW_GBPS
    if cpu_sec:
        f *= (REF_CPU_SEC / cpu_sec) ** ALPHA_CPU
    return max(f, CANARY2_CREDIT_FLOOR)


def to_ref_time(sec: float, cpu_sec: float | None,
                membw_gbps: float | None) -> float:
    """Express a measured per-query time at reference-host conditions.

    The single shared per-query normalizer (ADVICE r11: bench.py and
    scripts/merge_bench.py each carried an unclamped copy, so a canary
    over-credit beyond the evidence bound could suppress a normalized
    regression flag that the batch-mean metric would have kept). Built on
    canary2_factor, so the CANARY2_CREDIT_FLOOR clamp applies to every
    use of the model: credit is bounded at 0.75x, penalty never clamped.
    Applied to BOTH sides of the flag line (measurement with its window's
    canaries, anchor with its introduction-round canaries)."""
    return sec * canary2_factor(cpu_sec, membw_gbps)


def perq_threshold(anchor_sec: float) -> float:
    """Per-query regression-flag line for a given anchor (raw or
    normalized — pass the matching anchor value).

    r12 (VERDICT r11 #2): max(2x, +grace) instead of the additive
    2x + grace. The old form granted every query the full scheduling-
    floor slack ON TOP of its 2x headroom, which for the 1-2 s queries
    is ~0.4 s of free drift the floor was never meant to cover (q152 was
    the query it shielded). max() keeps the floor where it matters (a
    0.1 s query may honestly double twice over on scheduling noise) and
    reduces to a clean 2x once the anchor clears the grace."""
    return max(2.0 * anchor_sec, anchor_sec + PERQ_ABS_GRACE_SEC)


def classify_family(name: str) -> str:
    if name in STREAMING_LIFECYCLE:
        return "streaming_lifecycle"
    if name in MAINTENANCE_LIFECYCLE:
        return "maintenance_lifecycle"
    if name.startswith("report_"):
        return "reports"
    return "batch"
