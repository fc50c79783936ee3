#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate — TYPE-STRICT.

Usage: python3 tools/check.py <verify_out_dir> [sf_dir] [only_query...]

For each subdir <out>/<name> (Spark result parquet) with an entry in
<out>/oracle_sql.json, runs the oracle SQL in DuckDB over the sf parquet
tables and compares like the driver does:
  - both sides loaded as pandas DataFrames (spark: pyarrow parquet read;
    oracle: duckdb .df()),
  - columns sorted by (lowercased) name,
  - rows sorted by all columns via pandas sort_values — list/array-typed
    columns make this CRASH, exactly like the driver's checker, and are
    reported as ARRAY-COL failures,
  - cell values compared TYPE-STRICTLY: Decimal != float, int != float,
    str != anything else. DuckDB HUGEINT/oversized-DECIMAL outputs surface
    here as float64/object vs int64 mismatches — the round-1 failure mode
    the old lenient norm() masked.

Keys NOT in oracle_sql.json get the driver's weaker rows-only treatment:
loaded and row-sorted (so array columns still crash them), count reported.
"""
import sys, os, json, glob, math, datetime, decimal

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def type_class(v):
    """Strict-but-sane type bucket: all int widths are one class (parquet
    int32 vs int64 is a schema concern, not a value concern — the driver
    compares values after pandas conversion where both are numpy ints),
    but float vs Decimal vs int vs str are DISTINCT."""
    if isinstance(v, (bool, np.bool_)):
        return "bool"
    if isinstance(v, (int, np.integer)):
        return "int"
    if isinstance(v, (float, np.floating)):
        return "float"
    if isinstance(v, decimal.Decimal):
        return "decimal"
    if isinstance(v, (datetime.datetime, pd.Timestamp)):
        # tz-aware vs naive is a DISTINCT class: the driver's schema_match
        # fails a TIMESTAMPTZ-vs-TIMESTAMP pairing (round-13's 11-key break
        # shipped because the old check stripped tz before comparing)
        return "timestamptz" if v.tzinfo is not None else "temporal"
    if isinstance(v, (np.datetime64, datetime.date)):
        # spark DATE loads as datetime.date objects, duckdb DATE as
        # datetime64 — round-1 driver accepted that pairing
        return "temporal"
    if isinstance(v, (str, bytes)):
        return "str"
    return type(v).__name__


def is_null(v):
    if v is None:
        return True
    if isinstance(v, (float, np.floating)) and math.isnan(v):
        return True
    if v is pd.NaT:
        return True
    return False


def cell_equal(a, b):
    """Type-strict equality. No Decimal→float, no list→tuple coercion."""
    if is_null(a) or is_null(b):
        return is_null(a) and is_null(b)
    ta, tb = type_class(a), type_class(b)
    if ta != tb:
        return False
    if ta == "temporal":
        # both naive (type_class routed any tz-aware value to "timestamptz",
        # so a tz mismatch already failed the ta != tb gate above)
        return pd.Timestamp(a) == pd.Timestamp(b)
    if ta == "timestamptz":
        return pd.Timestamp(a).tz_convert("UTC") == pd.Timestamp(b).tz_convert("UTC")
    if ta == "float":
        # exact binary compare — the driver hashes, no tolerance
        return float(a) == float(b)
    if ta == "decimal":
        # driver hashes the decimal value; trailing-zero scale differences
        # at the same numeric value still hash apart at the arrow level —
        # compare value AND exponent (normalize() strips trailing zeros,
        # which would wrongly equate 1.10 and 1.1)
        return a == b and a.as_tuple().exponent == b.as_tuple().exponent
    return a == b


def col_class(series):
    """Type class of a whole column — the local mirror of the driver's
    schema_match. Pandas-level dtype first (catches tz-aware datetime64
    columns even when every cell compares equal after normalization);
    object columns fall back to the first non-null cell's type_class."""
    dt = series.dtype
    if isinstance(dt, pd.DatetimeTZDtype):
        return "timestamptz"
    kind = getattr(dt, "kind", None)
    if kind == "M":
        return "temporal"
    if kind in ("i", "u"):
        return "int"
    if kind == "f":
        return "float"
    if kind == "b":
        return "bool"
    for v in series:
        if not is_null(v):
            return type_class(v)
    return "empty"  # all-null column carries no type evidence


def array_col(df):
    """Name of the first column holding list/array cells, else None.
    Explicit detection: plain Python list cells sort WITHOUT raising
    TypeError, so exception-sniffing under-detects — and the driver's
    hasher rejects them regardless of what pandas sorting does."""
    for c in df.columns:
        for v in df[c]:
            if is_null(v):
                continue
            if isinstance(v, (list, tuple, np.ndarray)):
                return c
            break  # first non-null cell decides the column's shape
    return None


def sort_frame(df):
    """Row-sort by all columns, like the driver."""
    cols = sorted(df.columns, key=str.lower)
    df = df[cols]
    if len(df) and cols:
        df = df.sort_values(by=cols, kind="mergesort")
    return df.reset_index(drop=True)


def load_spark(out_dir, name):
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet"
            + ("/*.parquet" if os.path.isdir(f"{sf_dir}/{t}.parquet") else "")
            + "')")
    n_ok = n_bad = 0
    result_dirs = sorted(
        os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p))
    for name in result_dirs:
        if only and name not in only:
            continue
        s_df = load_spark(out_dir, name)
        if s_df is None:
            print(f"MISSING  {name}: no spark result parquet")
            n_bad += 1
            continue
        if name not in oracle:
            # rows-only: array columns still fail like the driver's hasher
            ac = array_col(s_df)
            if ac is not None:
                print(f"ARRAY-COL {name}: rows-only result has array column {ac!r}")
                n_bad += 1
                continue
            try:
                sort_frame(s_df)
                print(f"ROWSONLY {name} ({len(s_df)} rows)")
                n_ok += 1
            except Exception as e:
                print(f"SORT-ERR {name}: rows-only sort crashed: {e}")
                n_bad += 1
            continue
        try:
            d_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_bad += 1
            continue
        s_cols = sorted(c.lower() for c in s_df.columns)
        d_cols = sorted(c.lower() for c in d_df.columns)
        if s_cols != d_cols:
            print(f"SCHEMA   {name}: spark={s_cols} duck={d_cols}")
            n_bad += 1
            continue
        if len(s_df) != len(d_df):
            print(f"ROWCOUNT {name}: spark={len(s_df)} duck={len(d_df)}")
            n_bad += 1
            continue
        ac = array_col(s_df) or array_col(d_df)
        if ac is not None:
            print(f"ARRAY-COL {name}: result has array column {ac!r}")
            n_bad += 1
            continue
        try:
            s_df = sort_frame(s_df)
            d_df = sort_frame(d_df)
        except Exception as e:
            print(f"SORT-ERR {name}: sort crashed: {e}")
            n_bad += 1
            continue
        dbad = None
        for c in s_df.columns:
            sc, dc = col_class(s_df[c]), col_class(d_df[c])
            if sc != dc and "empty" not in (sc, dc):
                dbad = (c, sc, dc)
                break
        if dbad:
            c, sc, dc = dbad
            print(f"DTYPE    {name}: col {c}: spark={sc} duck={dc}")
            n_bad += 1
            continue
        bad = None
        cols = list(s_df.columns)
        try:
            for ci, c in enumerate(cols):
                # vectorized fast path: identical primitive dtypes compare
                # as arrays (exact binary equality, null masks must match)
                # — the 1.5M-row sf10 keys would take minutes per column
                # in the cell loop; falls through to it only on object
                # columns (str/decimal/date) or a detected mismatch (to
                # locate and report the first bad cell)
                sd, dd = s_df[c], d_df[c]
                if (sd.dtype == dd.dtype and sd.dtype != object
                        and getattr(sd.dtype, "kind", "O") in "Mifub"):
                    sn, dn = sd.isna().values, dd.isna().values
                    if (sn == dn).all():
                        svv, dvv = sd.values[~sn], dd.values[~dn]
                        if len(svv) == 0 or (svv == dvv).all():
                            continue
                sv, dv = sd.tolist(), dd.tolist()
                for r in range(len(sv)):
                    if not cell_equal(sv[r], dv[r]):
                        bad = (r, c, sv[r], type_class(sv[r]), dv[r], type_class(dv[r]))
                        break
                if bad:
                    break
        except Exception as e:
            print(f"CMP-ERR  {name}: cell comparison crashed: {e}")
            n_bad += 1
            continue
        if bad:
            r, cname, svv, st, dvv, dt = bad
            print(f"VALUE    {name}: row {r} col {cname}: "
                  f"spark={svv!r}({st}) duck={dvv!r}({dt})")
            n_bad += 1
        else:
            print(f"OK       {name} ({len(s_df)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
