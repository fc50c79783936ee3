#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <verify_out_dir> [sf_dir] [only_query...]

For each subdir <out>/<name> (Spark result parquet) with an entry in
<out>/oracle_sql.json, runs the oracle SQL in DuckDB over the sf parquet
tables and compares: row count, column names (sorted), and cell values
(columns sorted by name, row order as produced). Reports per-query
match/mismatch with first differing rows.
"""
import sys, json, glob, math, datetime, decimal

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def vals_equal(a, b):
    # driver hash-compares exactly: no float tolerance here
    return a == b


def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_ok = n_bad = n_skip = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"MISSING  {name}: no spark result parquet")
            n_bad += 1
            continue
        spark_rel = con.sql(
            "SELECT * FROM read_parquet([" +
            ",".join(f"'{f}'" for f in files) + "])")
        s_cols = list(spark_rel.columns)
        s_rows = spark_rel.fetchall()
        try:
            duck_rel = con.sql(sql)
            d_cols = list(duck_rel.columns)
            d_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_bad += 1
            continue
        if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in d_cols):
            print(f"SCHEMA   {name}: spark={sorted(s_cols)} duck={sorted(d_cols)}")
            n_bad += 1
            continue
        if len(s_rows) != len(d_rows):
            print(f"ROWCOUNT {name}: spark={len(s_rows)} duck={len(d_rows)}")
            n_bad += 1
            continue
        # sort columns by name (driver behavior)
        s_idx = [i for i, _ in sorted(enumerate(s_cols), key=lambda x: x[1].lower())]
        d_idx = [i for i, _ in sorted(enumerate(d_cols), key=lambda x: x[1].lower())]
        bad = None
        for r, (sr, dr) in enumerate(zip(s_rows, d_rows)):
            sv = [norm(sr[i]) for i in s_idx]
            dv = [norm(dr[i]) for i in d_idx]
            for c in range(len(sv)):
                if not vals_equal(sv[c], dv[c]):
                    bad = (r, sorted(s_cols, key=str.lower)[c], sv[c], dv[c])
                    break
            if bad:
                break
        if bad:
            r, cname, svv, dvv = bad
            print(f"VALUE    {name}: row {r} col {cname}: spark={svv!r} duck={dvv!r}")
            n_bad += 1
        else:
            print(f"OK       {name} ({len(s_rows)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
