#!/usr/bin/env python3
"""Driver-side tooling: diff two BENCH_FULL.json lines and flag per-query
regressions (new/removed queries, slowdowns past a ratio threshold).

When both files carry a `calibration` value (the fixed host-speed kernel
graft.Bench emits), new-run times are normalized by the host-speed ratio
new_cal/old_cal before flagging — a uniformly-slower host (the ~1.4x drift
BASELINE.md documents) then produces zero false regressions, while a real
code regression (query-specific) still trips the threshold.

When the new run additionally carries `calibration_series` (per-pass
kernel samples interleaved every `calibration_every` queries) plus the
per-pass raw times (`cold_queries` / `pass2_queries`), normalization is
PER SEGMENT: each pass's raw time divides by the host-speed ratio of the
segment it actually ran in, and the reported time is the min of the two
normalized passes. This catches the r7 failure mode where the host
degraded ~2x mid-run — a global min-of-passes calibration said "fast
host" while half the queries ran on the slow one, manufacturing a
fictitious regression.

Usage: python3 tools/perfdiff.py <old.json> <new.json> [ratio=2.0]
Exit 1 if any query regressed past the threshold (after normalization).
"""
import json
import sys


def seg_normalized(new_doc, cal_o):
    """Per-query min-of-normalized-passes, or None when the new doc lacks
    the series fields. Times are expressed on the OLD doc's host-speed
    scale (divide by seg_cal/cal_o), so they compare directly to old raw
    times."""
    series = new_doc.get("calibration_series")
    p1 = new_doc.get("cold_queries")
    p2 = new_doc.get("pass2_queries")
    every = new_doc.get("calibration_every", 25)
    if not (series and len(series) == 2 and p1 and p2 and cal_o and cal_o > 0):
        return None
    names = sorted(set(p1) | set(p2))
    out = {}
    for i, q in enumerate(names):
        cands = []
        for times, cals in ((p1, series[0]), (p2, series[1])):
            t = times.get(q, -1.0)
            if t <= 0 or not cals:
                continue
            seg = cals[min(i // every, len(cals) - 1)]
            if seg > 0:
                cands.append(t / (seg / cal_o))
        # no usable segment sample (kernel run failed in both passes):
        # leave the query OUT so main() falls back to the global-scale
        # normalization — a -1 here would misreport a query that actually
        # SUCCEEDED as FAILED, contradicting Bench's contract that a
        # calibration failure must never abort the comparison
        if cands:
            out[q] = min(cands)
    return out


def main(old_path, new_path, ratio=2.0):
    old_doc = json.load(open(old_path))
    new_doc = json.load(open(new_path))
    old, new = old_doc["queries"], new_doc["queries"]
    cal_o = old_doc.get("calibration", 0)
    cal_n = new_doc.get("calibration", 0)
    scale = cal_n / cal_o if cal_o and cal_n and cal_o > 0 and cal_n > 0 else 1.0
    seg = seg_normalized(new_doc, cal_o)
    if seg is not None:
        s = new_doc["calibration_series"]
        print(f"calibration: {cal_o:.3f}s -> series "
              f"p1={['%.3f' % v for v in s[0]]} p2={['%.3f' % v for v in s[1]]} "
              "(per-segment normalization)")
    elif scale != 1.0:
        print(f"calibration: {cal_o:.3f}s -> {cal_n:.3f}s "
              f"(host {scale:.2f}x; new times normalized by /{scale:.2f})")
    elif not (cal_o and cal_n):
        print("calibration: absent in one or both files; comparing raw times")
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"added ({len(added)}):", ", ".join(added))
    if removed:
        print(f"REMOVED ({len(removed)}):", ", ".join(removed))
    bad = []
    for q in sorted(set(old) & set(new)):
        o, n = old[q], new[q]
        if seg is not None and q in seg:
            n_norm = seg[q]
        else:
            n_norm = n / scale if n > 0 else n
        if n < 0 or n_norm < 0:
            bad.append((q, o, n_norm, "FAILED"))
        elif o > 0.05 and n_norm > ratio * o:  # ignore sub-50ms noise
            bad.append((q, o, n_norm, f"{n_norm / o:.1f}x"))
    for q, o, n, tag in sorted(bad, key=lambda x: -(x[2] / max(x[1], 1e-9))):
        print(f"REGRESSED {q}: {o:.3f}s -> {n:.3f}s(norm) ({tag})")
    tot_o = sum(v for v in old.values() if v > 0)
    tot_n = sum(v for v in new.values() if v > 0)
    tot_norm = (sum(seg.get(q, n / scale) for q, n in new.items() if n > 0)
                if seg is not None else tot_n / scale)
    print(f"total: {tot_o:.1f}s -> {tot_n:.1f}s raw"
          + (f", {tot_norm:.1f}s normalized" if abs(tot_norm - tot_n) > 1e-9 else "")
          + f" ({len(old)} -> {len(new)} queries)")
    # cold anomaly naming: when the new run's cold is far above its steady,
    # name the pass-1 offenders (the host IO-stall signature is a
    # single-query cold_queries spike with a normal steady — see
    # BASELINE.md "Cold-pass pathology")
    cold = new_doc.get("cold_total", 0)
    cq = new_doc.get("cold_queries", {})
    if cq and cold > 2 * tot_n:
        spikes = [(q, t) for q, t in cq.items()
                  if t > 5 and t > 10 * max(new.get(q, 0), 0.01)]
        if spikes:
            spikes.sort(key=lambda x: -x[1])
            print(f"COLD ANOMALY: cold {cold:.1f}s vs steady {tot_n:.1f}s; "
                  "pass-1 spikes (steady in parens): "
                  + ", ".join(f"{q} {t:.1f}s ({new.get(q, 0):.2f}s)"
                              for q, t in spikes[:5]))
    return 1 if bad or removed else 0


if __name__ == "__main__":
    r = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    sys.exit(main(sys.argv[1], sys.argv[2], r))
