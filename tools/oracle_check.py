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

# Sanity BANDS for no-oracle entries (round-9 follow-up #8): a different
# engine's sketch of the same statistic, compared within a relative
# tolerance — an external signal, NOT bit parity (Spark's HLL++ and
# DuckDB's HLL are different sketches; both sit within a few percent of
# truth at these cardinalities, so a 15% mutual band is loose enough to
# be stable and tight enough to catch a broken operator).
# The Spark result itself is registered as view `spark_result`, so a band
# can RE-DERIVE a statistic over the Spark output (round-11: the
# dedup_semantic_pq rerank check reads the exported candidate set).
# name -> (band SQL producing the same sorted shape, join key cols, rel tol)
BAND_SQL = {
    "agg_approx_distinct": (
        "SELECT l_returnflag, approx_count_distinct(l_partkey) AS approx_parts"
        " FROM lineitem GROUP BY 1 ORDER BY 1",
        ["l_returnflag"], 0.15),
    # Round-11 (round-10 follow-up #8): the PQ candidate set's exact-rerank
    # agreement. The ADC shortlist ORDERING is the only part DuckDB cannot
    # express; the exported pairs' exact cosines are plain arithmetic, so
    # DuckDB re-ranks the candidate set from the raw embeddings and every
    # reported cosine must agree within float tolerance (1e-6 absorbs
    # fold-order ulp differences; a broken rerank, a wrong vec_id, or a
    # below-threshold pair all fail loudly — the inner joins also prove
    # every reported id exists). Spark filtered at cosine >= 0.4, so
    # agreement certifies the threshold externally too.
    "dedup_semantic_pq": (
        "SELECT r.vec_a, r.vec_b,"
        " list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),"
        "                        CAST(b.embedding AS DOUBLE[])) AS cosine"
        " FROM spark_result r"
        " JOIN embeddings a ON a.vec_id = r.vec_a"
        " JOIN embeddings b ON b.vec_id = r.vec_b"
        " ORDER BY r.vec_a, r.vec_b",
        ["vec_a", "vec_b"], 1e-6),
}

def band_check(con, name, got):
    """Returns (ok, detail) for a banded no-oracle entry."""
    sql, keys, tol = BAND_SQL[name]
    con.register("spark_result", got)
    exp = con.sql(sql).df()
    g = got.sort_values(by=keys).reset_index(drop=True)
    e = exp.sort_values(by=keys).reset_index(drop=True)
    if len(g) != len(e) or list(g[keys].itertuples(index=False)) != list(e[keys].itertuples(index=False)):
        return False, f"group keys differ: spark={len(g)} rows, duckdb={len(e)}"
    vcols = [c for c in g.columns if c not in keys]
    worst = 0.0
    for c in vcols:
        for a, b in zip(g[c].astype(float), e[c].astype(float)):
            rel = abs(a - b) / max(abs(b), 1.0)
            worst = max(worst, rel)
    return worst <= tol, f"max_rel_diff={worst:.3%} (band {tol:.0%})"

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
            if name in BAND_SQL:
                ok, detail = band_check(con, name, got)
                if ok:
                    print(f"  ~ {name}: rows={len(got)} (no oracle; DuckDB band OK, {detail})")
                    n_noop += 1
                else:
                    print(f"  X {name}: DuckDB BAND FAILED: {detail}")
                    n_fail += 1
            else:
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
