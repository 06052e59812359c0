"""Per-query steady-state bands from the CLEAN bench series (VERDICT
r11 item 7): collect every bench record with ``series_point_state ==
"ok"`` — driver artifacts (BENCH_r*.json) and the committed per-run
series log (BENCH_SERIES.jsonl) — and print a markdown band table
(min / median / max per headline query, 10x tier) so the solo-warm
adjudication protocol judges against a DISTRIBUTION, not one recorded
number. Points that tripped the load gate or a regression gate are
excluded by construction.

Usage: python tools/bench_bands.py [repo_root]
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import sys


def clean_points(root: str) -> list[dict]:
    pts: list[dict] = []
    for path in sorted(glob.glob(os.path.join(root, "BENCH_r[0-9]*.json"))):
        d = json.load(open(path))
        p = d.get("parsed") or (d if isinstance(d, dict) else None)
        if isinstance(p, dict) and p.get("series_point_state") == "ok":
            pts.append({"src": os.path.basename(path), **p})
    series = os.path.join(root, "BENCH_SERIES.jsonl")
    if os.path.exists(series):
        for i, line in enumerate(open(series)):
            line = line.strip()
            if not line:
                continue
            p = json.loads(line)
            if p.get("series_point_state") == "ok":
                pts.append({"src": f"BENCH_SERIES.jsonl#{i + 1}", **p})
    return pts


def main() -> int:
    root = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    pts = clean_points(root)
    if not pts:
        print("no clean (state=ok) series points found", file=sys.stderr)
        return 1
    print(f"# {len(pts)} clean points: {[p['src'] for p in pts]}")
    names: list[str] = []
    for p in pts:
        for n in p.get("queries", {}):
            if n not in names:
                names.append(n)
    print("| Query (10x tier) | n | min | median | max |")
    print("|---|---|---|---|---|")
    for n in names:
        vals = [p["queries"][n] for p in pts if n in p.get("queries", {})]
        print(
            f"| {n} | {len(vals)} | {min(vals):.2f}s "
            f"| {statistics.median(vals):.2f}s | {max(vals):.2f}s |"
        )
    totals = [p["value"] for p in pts]
    print(
        f"| **total** | {len(totals)} | {min(totals):.1f}s "
        f"| {statistics.median(totals):.1f}s | {max(totals):.1f}s |"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
