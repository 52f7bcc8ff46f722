"""Refit ALPHA_CPU from all committed pinned-tree evidence (r10 VERDICT
next-round #2: the r10 fit had two points with individual fits spanning
0.23-0.60; this script turns every r8-tree pass in the bisect JSONLs
into an evidence point and reports the least-squares fit plus its
spread, so the constant in bench_constants.py carries a stated band).

Model (BASELINE.md "canary normalization"):

    t / t_ref = (REF_MEMBW / membw)  *  (cpu / REF_CPU) ^ alpha

per code-identical pass of the pinned r8 tree against its own committed
record (batch subset geomean vs the record's same-subset geomean).
membw is removed by its established linear rule first; alpha is then
the slope of log(residual time ratio) on log(cpu ratio).

Points with |log cpu ratio| < 0.05 are reported but EXCLUDED from the
fit (a near-reference canary gives no leverage and amplifies noise into
the slope). Steal is carried per point for weighting judgment calls;
the script itself weights all included points equally.

Usage: python scripts/fit_alpha.py scripts/data/bisect_r10.jsonl \
           scripts/data/bisect_r11.jsonl
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_constants import REF_CPU_SEC, REF_MEMBW_GBPS

# the r8 committed record's per-query times for the 22-query A/B subset
# (BENCH_LOCAL.json at 9d8cb99) — the code-identical reference each
# r8-tree pass is compared against
R8_RECORD_PATH = os.path.join(os.path.dirname(__file__), "data",
                              "r8_record_subset.json")


def geomean(xs: list[float]) -> float:
    return math.exp(sum(math.log(x) for x in xs) / len(xs))


def main() -> None:
    ref = json.load(open(R8_RECORD_PATH))
    # One point per WINDOW: r11 records are appended pre-min-merged by
    # ab_canary_pass.sh and carry a unique "window" id; legacy r10 rows
    # (raw single passes) all collapse into one min-merged point per
    # file — reproducing the r10 fit's methodology (min-merge across
    # its 4 passes, best-window canaries), since shallow merges bias
    # the time ratio, and therefore alpha, upward.
    groups: dict = {}
    for path in sys.argv[1:]:
        for line in open(path):
            d = json.loads(line)
            if d.get("tree") != "/tmp/r8tree":
                continue
            key = (os.path.basename(path), d.get("window", "ALL"))
            g = groups.setdefault(key, {"queries": {}, "cpu": [], "membw": [],
                                        "steal": [], "t": d.get("t")})
            for q, v in d["queries"].items():
                g["queries"][q] = min(g["queries"].get(q, v), v)
            g["cpu"].append(d["canary_sha256_256mb_sec"])
            if d.get("canary_membw_gbps"):
                g["membw"].append(d["canary_membw_gbps"])
            if d.get("steal_pct") is not None:
                g["steal"].append(d["steal_pct"])

    points = []
    for (src, window), g in sorted(groups.items(), key=lambda kv: kv[1]["t"] or 0):
        qs = g["queries"]
        ratios = [qs[s] / ref[s] for s in ref if s in qs]
        if len(ratios) < len(ref) * 0.8:
            continue
        cpu = min(g["cpu"])
        membw = max(g["membw"]) if g["membw"] else None
        tr0 = geomean(ratios)
        # remove the membw axis by its established linear rule (the
        # model-consistent treatment; the r10 fit instead used the BANDED
        # rule — no correction — whenever membw sat near reference, which
        # is why its published point was alpha=0.60: report both)
        tr = tr0 * (membw / REF_MEMBW_GBPS) if membw else tr0
        lc = math.log(cpu / REF_CPU_SEC)
        lt = math.log(tr)
        alpha_banded = (
            round(math.log(tr0) / lc, 3) if abs(lc) > 1e-9 else None
        )
        points.append({
            "src": src, "window": window,
            "n_merged": len(g["cpu"]),
            "cpu": cpu, "membw": membw,
            "steal": min(g["steal"]) if g["steal"] else None,
            "time_ratio_membw_norm": round(tr, 4),
            "cpu_ratio": round(cpu / REF_CPU_SEC, 4),
            "point_alpha": round(lt / lc, 3) if abs(lc) > 1e-9 else None,
            "point_alpha_membw_banded": alpha_banded,
            "log_cpu": lc, "log_t": lt,
            "included": abs(lc) >= 0.05,
        })

    # historical committed-record pair (r8->r9), same evidence as the
    # r10 fit: batch mean 0.8253/0.7802 at cpu 0.1751/0.1373, membw
    # in-band both sides (PERFORMANCE.md round-10 calibration)
    lc = math.log(0.1751 / REF_CPU_SEC)
    lt = math.log(0.8253 / 0.7802)
    points.append({
        "src": "r8r9_records", "cpu": 0.1751, "membw": None, "steal": None,
        "time_ratio_membw_norm": round(0.8253 / 0.7802, 4),
        "cpu_ratio": round(0.1751 / REF_CPU_SEC, 4),
        "point_alpha": round(lt / lc, 3),
        "log_cpu": lc, "log_t": lt, "included": True,
    })

    fit_pts = [p for p in points if p["included"]]
    sxx = sum(p["log_cpu"] ** 2 for p in fit_pts)
    sxy = sum(p["log_cpu"] * p["log_t"] for p in fit_pts)
    alpha = sxy / sxx if sxx else float("nan")
    alphas = [p["point_alpha"] for p in fit_pts if p["point_alpha"] is not None]
    for p in points:
        p.pop("log_cpu"), p.pop("log_t")
        print(json.dumps(p))
    print(json.dumps({
        "n_points": len(points),
        "n_included": len(fit_pts),
        "alpha_ls": round(alpha, 3),
        "alpha_min": round(min(alphas), 3) if alphas else None,
        "alpha_max": round(max(alphas), 3) if alphas else None,
    }, indent=1))


if __name__ == "__main__":
    main()
