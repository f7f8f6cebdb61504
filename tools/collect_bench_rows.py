"""Collect round-N bench logs into a markdown table for BASELINE.md.

Scans log/roundN/*.log for the bench JSON line and the stderr breakdown
comments; prints one markdown row per log plus the raw-log path so every
BASELINE row stays traceable to committed evidence (VERDICT r3 weak #3).

Usage: python tools/collect_bench_rows.py [--round 4]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", default="4")
    args = ap.parse_args()
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "log", f"round{args.round}")
    rows = []
    for path in sorted(glob.glob(os.path.join(root, "*.log"))):
        metric = value = unit = vsb = None
        notes = []
        for line in open(path, errors="replace"):
            line = line.strip()
            if line.startswith("{") and '"metric"' in line:
                try:
                    d = json.loads(line)
                    metric, value = d.get("metric"), d.get("value")
                    unit, vsb = d.get("unit"), d.get("vs_baseline")
                except json.JSONDecodeError:
                    pass
            elif line.startswith("#"):
                notes.append(line.lstrip("# "))
            elif re.match(r"^\[(canonical|p64|simota|dropout)", line):
                notes.append(line)
        name = os.path.basename(path)
        if metric is not None:
            rows.append(f"| {metric} | **{value}** {unit} | {vsb}× | "
                        f"`log/round{args.round}/{name}` |")
            for n in notes[-2:]:
                print(f"  <!-- {name}: {n} -->")
        elif notes:
            print(f"<!-- {name} (no JSON line): -->")
            for n in notes:
                print(f"  <!-- {n} -->")
    print()
    print("| metric | value | vs baseline | raw log |")
    print("|---|---|---|---|")
    for r in rows:
        print(r)


if __name__ == "__main__":
    main()
