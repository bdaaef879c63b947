#!/usr/bin/env python
"""Compare two bench JSON lines (files containing one {"metric": ...} object,
or raw driver BENCH_r{N}.json wrappers with a "parsed" field): per-query
ratios, sorted by regression, plus totals.

Usage:
    python tools/bench_compare.py BENCH_SF0.1.json BENCH_SF1.json
    python tools/bench_compare.py BENCH_r03.json BENCH_r04.json
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        text = fh.read()
    obj = json.loads(text)
    if "parsed" in obj:  # driver wrapper
        obj = obj["parsed"]
    return obj


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    a, b = load(sys.argv[1]), load(sys.argv[2])
    qa, qb = a["queries"], b["queries"]
    shared = sorted(set(qa) & set(qb), key=lambda k: -(qb[k] / max(qa[k], 1e-9)))
    print(f"{'query':<28} {sys.argv[1][:16]:>12} {sys.argv[2][:16]:>12} {'ratio':>8}")
    for k in shared:
        print(f"{k:<28} {qa[k]:>12.3f} {qb[k]:>12.3f} {qb[k]/max(qa[k],1e-9):>8.2f}x")
    only_a = sorted(set(qa) - set(qb))
    only_b = sorted(set(qb) - set(qa))
    if only_a:
        print("only in A:", ", ".join(only_a))
    if only_b:
        print("only in B:", ", ".join(only_b))
    ta = sum(qa[k] for k in shared)
    tb = sum(qb[k] for k in shared)
    print(f"{'TOTAL (shared)':<28} {ta:>12.3f} {tb:>12.3f} {tb/max(ta,1e-9):>8.2f}x")


if __name__ == "__main__":
    main()
