#!/usr/bin/env python3
"""Driver-side tooling: diff two BENCH_FULL.json lines and flag per-query
regressions (new/removed queries, slowdowns past a ratio threshold).

Usage: python3 tools/perfdiff.py <old.json> <new.json> [ratio=2.0]
Exit 1 if any query regressed past the threshold.
"""
import json
import sys


def main(old_path, new_path, ratio=2.0):
    old = json.load(open(old_path))["queries"]
    new = json.load(open(new_path))["queries"]
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"added ({len(added)}):", ", ".join(added))
    if removed:
        print(f"REMOVED ({len(removed)}):", ", ".join(removed))
    bad = []
    for q in sorted(set(old) & set(new)):
        o, n = old[q], new[q]
        if n < 0:
            bad.append((q, o, n, "FAILED"))
        elif o > 0.05 and n > ratio * o:  # ignore sub-50ms noise
            bad.append((q, o, n, f"{n / o:.1f}x"))
    for q, o, n, tag in sorted(bad, key=lambda x: -(x[2] / max(x[1], 1e-9))):
        print(f"REGRESSED {q}: {o:.3f}s -> {n:.3f}s ({tag})")
    tot_o = sum(v for v in old.values() if v > 0)
    tot_n = sum(v for v in new.values() if v > 0)
    print(f"total: {tot_o:.1f}s -> {tot_n:.1f}s "
          f"({len(old)} -> {len(new)} queries)")
    return 1 if bad or removed else 0


if __name__ == "__main__":
    r = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    sys.exit(main(sys.argv[1], sys.argv[2], r))
