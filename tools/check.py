#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: compare Verify output
parquet against DuckDB running the oracle SQL on the same tables.

Usage: python3 tools/check.py [sf_dir] [verify_out]
"""
import json, math, os, sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-style value canonicalization: round-trip through repr
        return f"{v:.10g}"
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def canonical_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(OUT)):
        d = os.path.join(OUT, name)
        if not os.path.isdir(d):
            continue
        got_desc = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{d}/*.parquet')").fetchall()
        got_cols = [r[0] for r in got_desc]
        got_types = {r[0]: r[1] for r in got_desc}
        got_rows = con.execute(
            f"SELECT * FROM read_parquet('{d}/*.parquet')").fetchall()
        if name not in oracle:
            print(f"  {name}: NO-ORACLE rows={len(got_rows)}")
            continue
        try:
            exp_desc = con.execute(
                f"DESCRIBE {oracle[name]}").fetchall()
            exp_types = {r[0]: r[1] for r in exp_desc}
            res = con.execute(oracle[name])
            exp_cols = [c[0] for c in res.description]
            exp_rows = res.fetchall()
        except Exception as e:
            print(f"✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        gc, gr = canonical_rows(got_cols, got_rows)
        ec, er = canonical_rows(exp_cols, exp_rows)
        type_diffs = [
            f"{c}: spark={got_types.get(c)} duck={exp_types.get(c)}"
            for c in got_types
            if c in exp_types and got_types[c] != exp_types[c]]
        if gc != ec:
            print(f"✗ {name}: COLUMN MISMATCH spark={gc} duck={ec}")
            n_fail += 1
        elif type_diffs:
            print(f"✗ {name}: TYPE MISMATCH {type_diffs}")
            n_fail += 1
        elif gr != er:
            n_fail += 1
            print(f"✗ {name}: ROW MISMATCH spark_rows={len(gr)} duck_rows={len(er)}")
            diff = [(a, b) for a, b in zip(gr, er) if a != b][:3]
            for a, b in diff:
                print(f"    spark={a}\n    duck ={b}")
            only_g = set(gr) - set(er)
            only_e = set(er) - set(gr)
            for r in list(only_g)[:2]:
                print(f"    only-spark={r}")
            for r in list(only_e)[:2]:
                print(f"    only-duck ={r}")
        else:
            n_pass += 1
            print(f"✓ {name}: {len(gr)} rows")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
