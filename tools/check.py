#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (builder tooling only —
NOT part of the Scala library). Usage:

    python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB against the sfDir parquet tables,
and compares: schema (column names, sorted), row count, and a value hash over
rows sorted by all columns (columns sorted by name) — mirroring the driver's
"sorts columns by name before hashing values" contract.
"""
import sys, json, glob, os
import duckdb


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return out


def norm(v):
    import datetime, math
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for tbl in ["region", "nation", "customer", "supplier", "part", "orders",
                "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{tbl}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no parquet written")
            failures += 1
            continue
        got = con.sql(f"SELECT * FROM '{files[0]}'")
        gcols, grows = got.columns, got.fetchall()
        if name not in oracles:
            print(f"rows  {name}: {len(grows)} rows (no oracle)")
            continue
        try:
            exp = con.sql(oracles[name])
            ecols, erows = exp.columns, exp.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            failures += 1
            continue
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL  {name}: schema {sorted(gcols)} != {sorted(ecols)}")
            failures += 1
            continue
        cg, ce = canon(grows, gcols), canon(erows, ecols)
        if len(cg) != len(ce):
            print(f"FAIL  {name}: rowcount {len(cg)} != {len(ce)}")
            failures += 1
        elif cg != ce:
            bad = next(i for i, (a, b) in enumerate(zip(cg, ce)) if a != b)
            print(f"FAIL  {name}: values differ, first at sorted row {bad}:")
            print(f"      spark : {cg[bad]}")
            print(f"      duckdb: {ce[bad]}")
            failures += 1
        else:
            print(f"OK    {name}: {len(cg)} rows hash-match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
