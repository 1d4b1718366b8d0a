#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (driver-side tooling only;
the Scala library never depends on this). Reads Verify.scala's output dir,
runs each oracle SQL in DuckDB against the same sf parquet tables, and
compares: column set, row count, and exact values (rows and columns sorted).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_type(t):
    t = str(t).upper()
    if "NUMBER" in t or t in ("FLOAT", "REAL"):
        return "FLOAT"
    if t in ("DOUBLE", "FLOAT64", "NUMBER"):
        return "DOUBLE"
    if t in ("INT", "INTEGER", "INT32", "NUMBER(32)"):
        return "INT"
    if t in ("BIGINT", "INT64", "LONG", "HUGEINT"):
        return "BIGINT"
    if t.startswith("VARCHAR") or t in ("STRING", "TEXT"):
        return "STRING"
    return t


def canon(v):
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, (int,)):
        return ("n", float(v)) if float(v) == v else ("i", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("n", v)
    if isinstance(v, bytes):
        return ("bytes", v)
    if isinstance(v, list):
        return ("l", tuple(canon(x) for x in v))
    return ("s", str(v))


def rows_of(cols, batch_rows):
    # sort columns by name, then rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in batch_rows]
    return sorted(out)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_cols = [d[0] for d in con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").description]
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        try:
            res = con.execute(sql)
            exp_cols = [d[0] for d in res.description]
            exp = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns spark={sorted(got_cols)} duck={sorted(exp_cols)}")
            n_fail += 1
            continue
        # type strictness: compare normalized logical types per column, in
        # case the driver's compare is schema-sensitive
        # DESCRIBE both sides FIRST, in its own try: the query itself
        # already executed above, so a DESCRIBE failure is exceptional —
        # and it must be a FAIL (contract unverifiable), never a WARN
        # that silently waves a contract violation through (r10 advice).
        try:
            gd = con.execute(
                f"DESCRIBE SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
            ed = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"FAIL {name}: DESCRIBE failed - contract unverifiable: {e}")
            n_fail += 1
            continue
        try:
            gt = {r[0]: norm_type(r[1]) for r in gd}
            et = {r[0]: norm_type(r[1]) for r in ed}
            tdiff = {c: (gt.get(c), et.get(c)) for c in gt
                     if gt.get(c) != et.get(c)}
            if tdiff:
                print(f"WARN {name}: type mismatch {tdiff}")
        except Exception as e:
            print(f"WARN {name}: type diff failed: {e}")
        # Output contract (r9 lesson, VERDICT r9 §What's wrong): the
        # driver's hasher is RAW-type-strict (norm_type forgives
        # HUGEINT→BIGINT; the driver does not) and its pandas sorter
        # crashes on nested values. So HUGEINT/DECIMAL (DuckDB
        # sum(BIGINT) leaks HUGEINT) and LIST/STRUCT/MAP at top level,
        # on EITHER side, are hard registration errors — FAIL, not WARN.
        # Pure python over the fetched rows — outside any try, so nothing
        # can downgrade it.
        contract = {}
        for side, desc in (("oracle", ed), ("spark", gd)):
            for row in desc:
                t = str(row[1]).upper()
                if (t.startswith(("HUGEINT", "UHUGEINT", "DECIMAL",
                                  "STRUCT", "MAP", "UNION"))
                        or t.endswith("[]")):
                    contract[f"{side}.{row[0]}"] = t
        if contract:
            print(f"FAIL {name}: output-contract violation {contract}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} duck={len(exp)}")
            n_fail += 1
            continue
        g = rows_of(got_cols, got)
        e = rows_of(exp_cols, exp)
        if g != e:
            bad = sum(1 for a, b in zip(g, e) if a != b)
            print(f"FAIL {name}: {bad}/{len(g)} rows differ")
            for a, b in list(zip(g, e))[:2000]:
                if a != b:
                    print(f"  spark: {a}")
                    print(f"  duck : {b}")
                    break
            n_fail += 1
            continue
        print(f"PASS {name} ({len(g)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
