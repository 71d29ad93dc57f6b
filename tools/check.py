#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <out>/<name> parquet (Spark result) and <out>/oracle_sql.json,
runs each oracle in DuckDB with the sf tables registered as views, and
compares: column names (sorted), dtypes, row count, and exact values
after sorting columns by name and rows by all columns. Strict equality —
if this passes, any reasonable driver compare passes.
"""
import json, sys, math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(con, rel_sql):
    df = con.execute(rel_sql).fetchdf()
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def cell_eq(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb
    except (TypeError, ValueError):
        pass
    return a == b


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    import os
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    for name in names:
        got = canon(con, f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        if name not in oracles:
            print(f"  SKIP  {name}: no oracle (rows={len(got)})")
            continue
        try:
            exp = canon(con, oracles[name])
        except Exception as e:
            print(f"  FAIL  {name}: oracle SQL error: {e}")
            failures += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"  FAIL  {name}: columns {list(got.columns)} != {list(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"  FAIL  {name}: rows {len(got)} != {len(exp)}")
            failures += 1
            continue
        bad = None
        for col in got.columns:
            gv, ev = got[col].tolist(), exp[col].tolist()
            for i, (a, b) in enumerate(zip(gv, ev)):
                if not cell_eq(a, b):
                    bad = (col, i, a, b)
                    break
            if bad:
                break
        if bad:
            col, i, a, b = bad
            print(f"  FAIL  {name}: value mismatch col={col} row={i}: got={a!r} exp={b!r}")
            failures += 1
        else:
            # dtype drift is informational: driver may compare schemas
            dt_g = [str(d) for d in got.dtypes]
            dt_e = [str(d) for d in exp.dtypes]
            flag = "" if dt_g == dt_e else f"  [dtypes {dt_g} vs {dt_e}]"
            print(f"  PASS  {name} ({len(got)} rows){flag}")
    missing = sorted(set(oracles) - set(names))
    for m in missing:
        print(f"  FAIL  {m}: oracle declared but no result parquet")
        failures += 1
    print(f"{'FAILURES: %d' % failures if failures else 'ALL PASS'} "
          f"({len(names)} queries, {len(oracles)} oracles)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
