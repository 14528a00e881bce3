#!/usr/bin/env python3
"""Compare two BENCH_FULL.json records per gate (optimization-round A/B).

Usage: bench_compare.py BEFORE.json AFTER.json [--lane min_sec|queries]

Prints gates sorted by absolute delta (after - before) on the chosen lane,
plus family and total sums, and flags gates past the repo's drift bar
(2x + 0.3 s)."""
import json
import sys


def scaling(args: list, lane: str) -> None:
    """Per-gate core-scaling ratios: args = [MAIN_LANE.json, LOW_LANE.json]
    (e.g. the 32-core and 8-core BENCH_FULL_c{cpus}.json records). Prints
    low/main time ratios and the latency-bound list: gates costing > 1 s on
    the main lane whose ratio is <= 1.15 (they do not speed up with cores —
    driver-latency, micro-batch or input-row-group bound)."""
    main_rec = json.load(open(args[0]))
    low_rec = json.load(open(args[1]))
    m, l = main_rec[lane], low_rec[lane]
    cm = main_rec.get("cpus", "?")
    cl = low_rec.get("cpus", "?")
    common = sorted(k for k in set(m) & set(l) if m[k] >= 0 and l[k] >= 0)
    rows = sorted((l[k] / max(m[k], 1e-9), m[k], l[k], k) for k in common)
    print(f"lane={lane} cpus_main={cm} cpus_low={cl} common={len(common)}")
    print(f"{'c' + str(cl) + '/c' + str(cm):>8} {'c' + str(cm):>8} "
          f"{'c' + str(cl):>8}  gate")
    for r, vm, vl, k in rows:
        print(f"{r:8.2f} {vm:8.3f} {vl:8.3f}  {k}")
    bound = [(vm, r, k) for r, vm, vl, k in rows if vm > 1.0 and r <= 1.15]
    bound.sort(reverse=True)
    print(f"\nlatency-bound (> 1 s at {cm} cores, low/main ratio <= 1.15): "
          f"{len(bound)} gates, {sum(v for v, _, _ in bound):.1f} s")
    for vm, r, k in bound:
        print(f"  {k}: {vm:.3f}s ratio={r:.2f}")
    sm = sum(m[k] for k in common)
    sl = sum(l[k] for k in common)
    print(f"sum(common): c{cm}={sm:.1f}s c{cl}={sl:.1f}s ratio={sl / sm:.3f}")


def main() -> None:
    lane = "min_sec"
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    for a in sys.argv[1:]:
        if a.startswith("--lane="):
            lane = a.split("=", 1)[1]
    if "--scaling" in sys.argv[1:]:
        scaling(args, lane)
        return
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
