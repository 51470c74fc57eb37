#!/usr/bin/env python3
"""Local reproduction of the driver's t2 DuckDB-oracle compare.

Usage: python3 scripts/preflight.py <sf_dir> <verify_out_dir> [query ...]

For every entry in <verify_out_dir>/oracle_sql.json: run the SQL in
DuckDB over views on the sf parquet tables, load the Spark parquet dump
for the same query, sort columns by name, and compare row-for-row.
Strict by default (exact equality after canonicalization) — mirrors the
driver's hash compare under its strictest interpretation.
"""
import duckdb, json, sys, os, glob, math
from decimal import Decimal

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    """Canonical comparable form for one cell."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        # Normalize trailing zeros: 12.30 == 12.3
        return repr(float(v)) if abs(v) < Decimal("1e15") else str(v.normalize())
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):  # struct columns
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if hasattr(v, "tolist"):  # numpy scalar / array
        return canon(v.tolist())
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output parquet")
            n_fail += 1
            continue
        try:
            srows = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetchall()
            scols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: spark read error {e}")
            n_fail += 1
            continue
        try:
            orows = con.execute(sql).fetchall()
            ocols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        s_ord = sorted(range(len(scols)), key=lambda i: scols[i])
        o_ord = sorted(range(len(ocols)), key=lambda i: ocols[i])
        if [scols[i] for i in s_ord] != [ocols[i] for i in o_ord]:
            print(f"FAIL {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        bad = None
        for ri, (sr, orow) in enumerate(zip(srows, orows)):
            for si, oi in zip(s_ord, o_ord):
                a, b = canon(sr[si]), canon(orow[oi])
                if a != b:
                    bad = (ri, scols[si], sr[si], orow[oi])
                    break
            if bad:
                break
        if bad:
            ri, c, a, b = bad
            print(f"FAIL {name}: row {ri} col {c}: spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
