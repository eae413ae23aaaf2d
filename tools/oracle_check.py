#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/oracle_check.py [--exact] <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views named
after the testdata tables, sorts columns by name and rows by all columns,
and compares cell values.

--exact: the driver's hash is bit- and dtype-sensitive (round-1 lesson:
the default rtol=1e-7 compare said PASS=44 while the driver recorded 13
hash_match:false). Exact mode fails on ANY difference: column dtype
(int64 vs float64 — DuckDB HUGEINT sums surface as float64), float bit
patterns (compared via IEEE-754 hex), and Decimal scale (compared via
str(), so Decimal('5.00') != Decimal('5.0000')).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: float(v) if type(v).__name__ == "Decimal" else v)
            if pd.api.types.is_float_dtype(df[c]):
                df[c] = df[c].round(9)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def norm_exact(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns/rows like the driver, then stringify every cell with its
    Python type name so ANY value/scale/bit difference shows. Floats become
    IEEE-754 hex (bit-exact; nan/inf safe)."""
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

    def cell(v):
        # Per-value dispatch: object-dtype columns (DuckDB HUGEINT/DECIMAL
        # surface that way) can hold floats/Decimals whose str() would mask
        # bit/scale diffs the driver's hash catches.
        t = type(v).__name__
        if isinstance(v, float):
            return "float64|" + v.hex()
        if t == "Decimal":
            return f"Decimal|{v}"  # str keeps scale: 5.00 != 5.0000
        return f"{t}|{v}"

    out = pd.DataFrame(index=df.index)
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_float_dtype(col):
            out[c] = col.map(lambda v: "float64|" + float(v).hex())
        elif pd.api.types.is_datetime64_any_dtype(col):
            # tz-safe: astype('datetime64[ns]') raises on tz-aware columns.
            if getattr(col.dtype, "tz", None) is not None:
                col = col.dt.tz_convert("UTC").dt.tz_localize(None)
            out[c] = col.astype("datetime64[ns]").map(lambda v: f"ts|{v!r}")
        else:
            out[c] = col.map(cell)
    return out

def main():
    argv = [a for a in sys.argv[1:] if a != "--exact"]
    exact = "--exact" in sys.argv[1:]
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"create view {t} as select * from read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noop = 0
    # A query that failed in Verify writes no result dir — that's a FAIL,
    # not a skip.
    for name in sorted(oracle):
        if (not only or name in only) and not os.path.isdir(os.path.join(out_dir, name)):
            print(f"  X {name}: NO SPARK RESULT (query failed in Verify)")
            n_fail += 1
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or (only and name not in only):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            print(f"  ~ {name}: rows={len(got)} (no oracle, rows-only)")
            n_noop += 1
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"  X {name}: ORACLE SQL ERROR: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        g, e = (norm_exact(got), norm_exact(exp)) if exact else (norm(got), norm(exp))
        if list(g.columns) != list(e.columns):
            print(f"  X {name}: COLUMNS spark={list(g.columns)} oracle={list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"  X {name}: ROWS spark={len(g)} oracle={len(e)}")
            n_fail += 1
            continue
        try:
            if exact:
                pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            else:
                pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=False, rtol=1e-7, atol=1e-9)
            print(f"  ✓ {name}: rows={len(g)}")
            n_pass += 1
        except AssertionError as ex:
            print(f"  X {name}: VALUES differ: {str(ex).splitlines()[-1][:200]}")
            diff = g.compare(e) if g.shape == e.shape else None
            if diff is not None and len(diff):
                print(diff.head(5).to_string()[:1500])
            n_fail += 1
    print(f"PASS={n_pass} FAIL={n_fail} ROWS_ONLY={n_noop}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
