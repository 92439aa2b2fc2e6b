#!/usr/bin/env python3
"""Compare two Bench full-sweep artifacts per query.

Usage: compare_bench.py A.json B.json [ratio_threshold]

Prints every query whose A/B ratio exceeds the threshold (default 1.3)
with its per-run spread (sample max/min within each run, when present),
then a summary. Exit code 1 if any query exceeds the threshold — the
reproducibility gate VERDICT r8 asked for: two consecutive same-code
sweeps must agree within ~1.3x, and when they don't the spread column
says which run's samples were already internally unstable (host
interference) versus stable-but-different (a real state effect).
"""
import json
import sys


def load(p):
    with open(p) as f:
        return json.load(f)


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    qa, qb = a["queries"], b["queries"]
    sa, sb = a.get("spread", {}), b.get("spread", {})
    common = sorted(set(qa) & set(qb))
    bad = []
    for q in common:
        x, y = qa[q], qb[q]
        if x <= 0 or y <= 0:
            continue
        r = max(x, y) / min(x, y)
        if r > thr:
            bad.append((r, q, x, y, sa.get(q), sb.get(q)))
    bad.sort(reverse=True)
    for r, q, x, y, spx, spy in bad:
        print(f"{q}: {x:.3f}s vs {y:.3f}s (ratio {r:.2f}) "
              f"spreadA={spx} spreadB={spy}")
    ratios = [max(qa[q], qb[q]) / min(qa[q], qb[q])
              for q in common if qa[q] > 0 and qb[q] > 0]
    print(f"\n{len(common)} common queries; worst ratio "
          f"{max(ratios):.2f}; median {sorted(ratios)[len(ratios)//2]:.2f}; "
          f"{len(bad)} exceed {thr}x")
    print(f"totals: {a['value']:.1f}s vs {b['value']:.1f}s")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
