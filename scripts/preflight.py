#!/usr/bin/env python3
"""Driver-accurate reproduction of the t2 DuckDB-oracle hash compare.

Usage: python3 scripts/preflight.py <sf_dir> <verify_out_dir> [query ...]

Empirically validated against CORRECTNESS_r01.json (18/18 queries
reproduce the driver's pass/fail split): the driver loads the Spark
parquet dump with pandas.read_parquet, runs the oracle SQL with
duckdb's .df(), reorders columns alphabetically, sorts rows by all
columns, and compares the frames BY STRING FORMAT (to_csv semantics).
So Decimal('5.00') != 5.0(float64), tz-aware != naive timestamp,
datetime.date(...) != Timestamp(...), int64 5 != float64 5.0.

On mismatch, prints the first differing cell with both raw values and
dtypes so the query's output types can be fixed.
"""
import duckdb, json, sys, os, glob, hashlib
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def csv_form(df):
    d = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return d, d.to_csv(index=False)


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
            sdf = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark read error {e}")
            n_fail += 1
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            print(f"FAIL {name}: cols spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            n_fail += 1
            continue
        try:
            ss, scsv = csv_form(sdf[scols])
            oo, ocsv = csv_form(odf[ocols])
        except Exception as e:
            print(f"FAIL {name}: sort error (array/map output col?): {e}")
            n_fail += 1
            continue
        if hashlib.md5(scsv.encode()).hexdigest() == hashlib.md5(ocsv.encode()).hexdigest():
            print(f"PASS {name} ({len(sdf)} rows)")
            n_pass += 1
            continue
        # locate first differing cell for diagnosis
        n_fail += 1
        shown = False
        for c in scols:
            a = ss[c].astype(str).values
            b = oo[c].astype(str).values
            neq = a != b
            if neq.any():
                i = int(neq.argmax())
                print(f"FAIL {name}: col {c} row {i}: "
                      f"spark={ss[c].iloc[i]!r} ({ss[c].dtype}) "
                      f"oracle={oo[c].iloc[i]!r} ({oo[c].dtype})")
                shown = True
                break
        if not shown:
            print(f"FAIL {name}: csv differs but no cell-level diff found "
                  f"(row-order instability under sort?)")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
