"""One-shot migration of BASELINE_PERQ.json to the v2 canary-stamped
format (r9 VERDICT next-round #2).

v1: {"q01_...": 0.45, ...}  — bare seconds, host conditions unrecorded.
v2: {"_format": 2,
     "_ref": {"cpu_sec": .., "membw_gbps": .., "alpha_cpu": ..},
     "anchors": {"q01_...": {"sec": .., "cpu_sec": ..|null,
                             "membw_gbps": ..|null}}}

Each anchor is stamped with the canaries of the committed bench record
it was introduced in, reconstructed from git history. Canaries were
only wired in round 8 (commit 5c341f4), so anchors introduced before
that carry null stamps — the flag check then treats them as recorded
at reference conditions, which the r8 bisect showed is conservative
(pre-r8 windows were FASTER than the r8 reference, so a true stamp
would normalize those anchors UP and flag less, never more).
"""

from __future__ import annotations

import json
import subprocess
import sys

PATH = "BASELINE_PERQ.json"

# committed bench records whose --update-anchors batches have known
# canaries (the record and the anchor append are the same commit)
STAMPED_COMMITS = {
    "5c341f4": {"cpu_sec": 0.1765, "membw_gbps": 2.98},  # r8 record pass
    "3fcdfbd": {"cpu_sec": 0.1751, "membw_gbps": 3.27},  # r9 record pass
}


def main() -> None:
    cur = json.load(open(PATH))
    if isinstance(cur, dict) and cur.get("_format") == 2:
        print("already v2")
        return
    log = subprocess.run(
        ["git", "log", "--follow", "--format=%h", "--", PATH],
        capture_output=True, text=True,
    ).stdout.split()[::-1]
    intro: dict[str, str] = {}
    prev: dict = {}
    for c in log:
        try:
            snap = json.loads(
                subprocess.run(
                    ["git", "show", f"{c}:{PATH}"],
                    capture_output=True, text=True,
                ).stdout
            )
        except ValueError:
            continue
        if isinstance(snap, dict) and "_format" in snap:
            snap = snap.get("anchors", {})
        for k in snap:
            if k not in prev:
                intro[k] = c
        prev = snap
    anchors = {}
    for k, sec in sorted(cur.items()):
        stamp = STAMPED_COMMITS.get(intro.get(k, ""), {})
        anchors[k] = {
            "sec": sec,
            "cpu_sec": stamp.get("cpu_sec"),
            "membw_gbps": stamp.get("membw_gbps"),
        }
    alpha = float(sys.argv[1]) if len(sys.argv) > 1 else None
    out = {
        "_format": 2,
        "_ref": {
            "cpu_sec": 0.1373,
            "membw_gbps": 2.98,
            "alpha_cpu": alpha,
            "note": (
                "reference = r8 five-pass committed record conditions;"
                " alpha_cpu fitted by the r10 pinned-tree bisect"
                " (PERFORMANCE.md)"
            ),
        },
        "anchors": anchors,
    }
    with open(PATH, "w") as fh:
        json.dump(out, fh, indent=1)
    stamped = sum(1 for a in anchors.values() if a["cpu_sec"])
    print(f"migrated {len(anchors)} anchors, {stamped} with canary stamps")


if __name__ == "__main__":
    main()
