#!/usr/bin/env python3
"""Self-test for tools/perfdiff.py per-segment normalization, by replaying
synthetic BENCH_FULL-shaped JSONs (no Spark run needed):

 1. uniform host drift (both passes 2x slower, series says so)  -> clean
 2. MID-RUN drift (pass 2 only 2x slower — the r7 pathology)    -> clean
 3. a real per-query regression under a clean host              -> flagged
 4. legacy new-doc without series fields                        -> old path

Run: python3 tools/test_perfdiff.py   (exit 0 = all behaviors correct)
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import perfdiff  # noqa: E402

QS = [f"q{i:02d}" for i in range(8)]  # run order = sorted names
EVERY = 4  # 2 segments per pass


def doc(queries, cold_q=None, p2=None, cal=None, series=None):
    d = {"metric": "total", "value": sum(queries.values()), "unit": "sec",
         "n_queries": len(queries), "queries": queries,
         "cold_total": sum((cold_q or queries).values()),
         "sf": "/tmp/sf"}
    if cold_q is not None:
        d["cold_queries"] = cold_q
    if p2 is not None:
        d["pass2_queries"] = p2
    if cal is not None:
        d["calibration"] = cal
    if series is not None:
        d["calibration_series"] = series
        d["calibration_every"] = EVERY
    return d


def run(old, new, ratio=2.0):
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as fo, \
         tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as fn:
        json.dump(old, fo)
        json.dump(new, fn)
    try:
        return perfdiff.main(fo.name, fn.name, ratio)
    finally:
        os.unlink(fo.name)
        os.unlink(fn.name)


def main():
    base = {q: 1.0 for q in QS}
    old = doc(dict(base), cal=0.5)
    failures = []

    # 1. uniform drift: every query 2x slower in both passes; series
    # reports the 2x-slower host in every segment -> nothing flagged
    slow = {q: 2.0 for q in QS}
    new1 = doc(dict(slow), cold_q=dict(slow), p2=dict(slow), cal=1.0,
               series=[[1.0, 1.0], [1.0, 1.0]])
    if run(old, new1) != 0:
        failures.append("uniform drift was flagged")

    # 2. MID-RUN drift: pass 1 clean (1.0s at cal 0.5), pass 2 on a
    # 2x-degraded host (2.0s at cal 1.0). A global min-of-passes
    # calibration would normalize pass-2 times by the FAST sample and
    # flag them; per-segment normalization must stay clean.
    new2 = doc(dict(base), cold_q=dict(base), p2=dict(slow), cal=0.5,
               series=[[0.5, 0.5], [1.0, 1.0]])
    if run(old, new2) != 0:
        failures.append("mid-run drift was flagged")

    # 2b. drift INSIDE a pass (the exact r7 shape: second half of the run
    # degraded): queries in the slow segments take 2x, their segment
    # samples say 2x -> clean
    half = {q: (1.0 if i < 4 else 2.0) for i, q in enumerate(QS)}
    new2b = doc(dict(half), cold_q=dict(half), p2=dict(half), cal=0.5,
                series=[[0.5, 1.0], [0.5, 1.0]])
    if run(old, new2b) != 0:
        failures.append("intra-pass drift was flagged")

    # 3. real regression: q03 is 3x slower in BOTH passes on a clean host
    reg = dict(base, q03=3.0)
    new3 = doc(dict(reg), cold_q=dict(reg), p2=dict(reg), cal=0.5,
               series=[[0.5, 0.5], [0.5, 0.5]])
    if run(old, new3) != 1:
        failures.append("real regression NOT flagged under series")

    # 3b. calibration kernel failed (-1) in a query's segment in BOTH
    # passes: the query still SUCCEEDED — it must fall back to the
    # global-scale normalization, not be reported FAILED (exit 1)
    new3b = doc(dict(base), cold_q=dict(base), p2=dict(base), cal=0.5,
                series=[[0.5, -1.0], [0.5, -1.0]])
    if run(old, new3b) != 0:
        failures.append("failed-calibration segment misreported as FAILED")

    # 4. legacy docs without series: global normalization still applies
    new4 = doc(dict(slow), cal=1.0)
    if run(old, new4) != 0:
        failures.append("legacy uniform drift was flagged")
    new5 = doc(dict(reg), cal=0.5)
    if run(old, new5) != 1:
        failures.append("legacy real regression NOT flagged")

    if failures:
        print("FAIL:", "; ".join(failures))
        return 1
    print("perfdiff self-test: all 7 scenarios behave correctly")
    return 0


if __name__ == "__main__":
    sys.exit(main())
