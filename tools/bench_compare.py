#!/usr/bin/env python3
"""Compare two BENCH_FULL.json records per gate (optimization-round A/B).

Usage: bench_compare.py BEFORE.json AFTER.json [--lane min_sec|queries]

Prints gates sorted by absolute delta (after - before) on the chosen lane,
plus family and total sums, and flags gates past the repo's drift bar
(2x + 0.3 s)."""
import json
import sys


def main() -> None:
    lane = "min_sec"
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    for a in sys.argv[1:]:
        if a.startswith("--lane="):
            lane = a.split("=", 1)[1]
    before = json.load(open(args[0]))
    after = json.load(open(args[1]))
    b, a = before[lane], after[lane]
    common = sorted(set(b) & set(a))
    only_b, only_a = set(b) - set(a), set(a) - set(b)
    rows = [(a[k] - b[k], b[k], a[k], k) for k in common
            if b[k] >= 0 and a[k] >= 0]
    rows.sort()
    print(f"lane={lane} common={len(common)} "
          f"only_before={sorted(only_b)} only_after={sorted(only_a)}")
    print(f"{'delta':>8} {'before':>8} {'after':>8}  gate")
    for d, vb, va, k in rows[:15]:
        print(f"{d:8.3f} {vb:8.3f} {va:8.3f}  {k}")
    print("   ...")
    for d, vb, va, k in rows[-15:]:
        print(f"{d:8.3f} {vb:8.3f} {va:8.3f}  {k}")
    both = [k for k in common if b[k] >= 0 and a[k] >= 0]
    sb = sum(b[k] for k in both)
    sa = sum(a[k] for k in both)
    print(f"sum(common): before={sb:.1f}s after={sa:.1f}s "
          f"ratio={sa / sb:.3f}")
    drift = [(k, b[k], a[k]) for k in common
             if b[k] >= 0 and a[k] > 2 * b[k] + 0.3]
    print(f"gates past the 2x+0.3s drift bar: {len(drift)}")
    for k, vb, va in sorted(drift, key=lambda r: -(r[2] / max(r[1], 1e-9))):
        print(f"  {k}: {vb:.3f} -> {va:.3f} ({va / max(vb, 1e-9):.2f}x)")


if __name__ == "__main__":
    main()
