#!/usr/bin/env python
"""Regenerate the common-core bench trend from BENCH_r*.json using MIN
times (round-6 VERDICT item 7: the min is the stable estimator under
the ±2x machine-load noise measured in round 5; medians ride along in
`queries_stats` from r6 on).

Prints a markdown table: per-round subtotal over the query set common
to ALL rounds, plus per-round totals over each round's own set, and
flags any common-set query that regressed >1.3x AND >0.15 s absolute
vs the previous round (the builder trip-wire from PERFORMANCE.md).

Usage: python tools/perf_trend.py
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    rounds: list[tuple[int, dict[str, float]]] = []
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        m = re.search(r"BENCH_r(\d+)", path)
        with open(path) as f:
            data = json.load(f)
        # the driver wraps bench stdout: payload sits under "parsed"
        # (None for r1, whose bench crashed — skip rounds with no data)
        data = data.get("parsed", data) or {}
        q = data.get("queries", {})
        if not q:
            continue
        # r6+: values may be {"min": x, "median": y}; earlier: plain sec
        flat = {
            k: (v["min"] if isinstance(v, dict) else float(v)) for k, v in q.items()
        }
        rounds.append((int(m.group(1)), flat))

    common = set(rounds[0][1])
    for _, q in rounds[1:]:
        common &= set(q)
    common_sorted = sorted(common)
    print(f"common set: {len(common)} queries (in every round's bench)\n")
    print("| round | common subtotal (min) | own-set total | n queries |")
    print("|---|---|---|---|")
    for rnd, q in rounds:
        sub = sum(q[k] for k in common_sorted)
        print(f"| r{rnd} | {sub:.2f} s | {sum(q.values()):.2f} s | {len(q)} |")

    print("\nregressions vs previous round (>1.3x and >0.15 s):")
    any_reg = False
    for (r0, q0), (r1, q1) in zip(rounds, rounds[1:]):
        for k in common_sorted:
            if q1[k] > 1.3 * q0[k] and q1[k] - q0[k] > 0.15:
                print(f"  r{r0}->r{r1} {k}: {q0[k]:.2f} -> {q1[k]:.2f}")
                any_reg = True
    if not any_reg:
        print("  none")


if __name__ == "__main__":
    main()
