#!/usr/bin/env python3
"""Render a BENCH_scale*.json artifact as the BASELINE.md markdown table.

Usage: scale_table.py BENCH_scale_f30.json

Rows sorted by exponent descending (the reading order BASELINE.md §C/§D
use); invariants printed after the table.
"""
import json
import sys


def main():
    d = json.load(open(sys.argv[1]))
    f = d["factor"]
    print(f"| query | t @sf0.1 (s) | t @~sf{f/10:g} (s) | exponent |")
    print("|---|---|---|---|")
    rows = sorted(d["queries"].items(), key=lambda kv: -kv[1]["exponent"])
    for q, v in rows:
        print(f"| {q} | {v['t_base']:.2f} | {v['t_scaled']:.2f} "
              f"| {v['exponent']:.2f} |")
    print()
    for name, ok in d.get("invariants", {}).items():
        print(f"- `{name}`: {'OK' if ok else 'FAILED'}")
    if d.get("errors"):
        print(f"errors: {d['errors']}")


if __name__ == "__main__":
    main()
