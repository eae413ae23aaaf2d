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
import sys, json, glob, os, time
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
    # KLL quantile estimates vs DuckDB's EXACT quantile_disc per
    # (lang, label): the sketch's rank error at k=200 over these corpus
    # sizes is ~2.5% of ranks, and the length distributions are smooth,
    # so a 10% value band is loose enough to be stable and tight enough
    # to catch a broken compaction (KllSpec pins the rank bound itself).
    "text_quantiles_sketch": (
        "SELECT lang, q, CAST(est AS DOUBLE) AS est FROM ("
        " SELECT lang,"
        "  unnest(['p01','p05','p25','p50','p75','p95','p99']) AS q,"
        "  unnest(quantile_disc(n_chars,"
        "    [0.01,0.05,0.25,0.5,0.75,0.95,0.99])) AS est"
        " FROM documents WHERE text IS NOT NULL GROUP BY lang)"
        " ORDER BY lang, q",
        ["lang", "q"], 0.10),
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

# The three ANN probe entries share the dedup_semantic_pq rerank shape:
# their learned k-means cells are not SQL-reproducible (hence no oracle),
# but each reported (q_id, n_id) pair's exact cosine IS — DuckDB
# recomputes it from the raw embeddings, and re-derives the per-query
# rank by (external cosine desc, n_id) over the reported set, so both
# the scores and the ordering carry an external signal; only the
# CANDIDATE SELECTION (which cells were probed) remains engine-internal.
_ANN_RERANK_SQL = (
    "SELECT r.q_id, r.n_id,"
    " CAST(row_number() OVER (PARTITION BY r.q_id"
    "   ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),"
    "     CAST(n.embedding AS DOUBLE[])) DESC, r.n_id) AS INT) AS rank,"
    " list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),"
    "   CAST(n.embedding AS DOUBLE[])) AS cosine"
    " FROM spark_result r"
    " JOIN embeddings q ON q.vec_id = r.q_id"
    " JOIN embeddings n ON n.vec_id = r.n_id"
    " ORDER BY r.q_id, r.n_id")
# ann_opq probes an OPQ-ROTATED corpus, but rotation is orthogonal so its
# exact-rerank cosines equal the raw-space ones within float ulps — the
# same raw-embedding rerank certifies it.
for _n in ("ann_ivf_kmeans", "ann_ivf_persisted", "ann_ivf_pq", "ann_opq"):
    BAND_SQL[_n] = (_ANN_RERANK_SQL, ["q_id", "n_id"], 1e-6)

# ---- Pure-Python XXH64 (public spec, Cyan4973/xxHash) + the reference's
# whitespace-outside-strings JSON minifier: an INDEPENDENT implementation
# of the el_checksum arithmetic, so the one entry DuckDB cannot express
# (no XXH64-over-bytes) still gets an external signal — every entry in
# the surface now has one.
_P1, _P2, _P3 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9
_P4, _P5 = 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5
_M = (1 << 64) - 1

def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & _M

def xxh64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        a1 = (seed + _P1 + _P2) & _M
        a2 = (seed + _P2) & _M
        a3 = seed & _M
        a4 = (seed - _P1) & _M
        while i + 32 <= n:
            for j, a in enumerate((a1, a2, a3, a4)):
                lane = int.from_bytes(data[i + 8 * j:i + 8 * j + 8], "little")
                a = (_rotl((a + lane * _P2) & _M, 31) * _P1) & _M
                if j == 0: a1 = a
                elif j == 1: a2 = a
                elif j == 2: a3 = a
                else: a4 = a
            i += 32
        h = (_rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12) + _rotl(a4, 18)) & _M
        for a in (a1, a2, a3, a4):
            h = ((h ^ ((_rotl((a * _P2) & _M, 31) * _P1) & _M)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = int.from_bytes(data[i:i + 8], "little")
        h = (_rotl(h ^ ((_rotl((k * _P2) & _M, 31) * _P1) & _M), 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        k = int.from_bytes(data[i:i + 4], "little")
        h = (_rotl(h ^ ((k * _P1) & _M), 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M), 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h

def _minify_json(s: str) -> str:
    out, i, n, instr = [], 0, len(s), False
    while i < n:
        c = s[i]
        if instr:
            out.append(c)
            if c == "\\":
                out.append(s[i + 1]); i += 2; continue
            if c == '"':
                instr = False
            i += 1
        elif c == '"':
            instr = True; out.append(c); i += 1
        elif c in " \t\n\r":
            i += 1
        else:
            out.append(c); i += 1
    return "".join(out)

def _el_checksum_check(con, got):
    """Recompute every el_checksum row from the events table in pure
    Python (LE layout: ts_sec:8 | len(label):2 | len(payload):4 | label |
    payload | version_prev:8, XXH64 seed 0) and require exact equality."""
    ev = con.sql("SELECT event_id, epoch_ns(ts) AS ns, event_type, props"
                 " FROM events ORDER BY event_id").df()
    vmin = int(ev["event_id"].min())
    exp = {}
    for eid, ns, label, props in ev.itertuples(index=False):
        ts = int(ns) // 1_000_000_000
        lb = str(label).encode()
        pb = _minify_json(str(props)).encode()
        buf = (ts & _M).to_bytes(8, "little")
        buf += (len(lb) & 0xFFFF).to_bytes(2, "little")
        buf += (len(pb) & 0xFFFFFFFF).to_bytes(4, "little")
        buf += lb + pb
        vp = 0 if int(eid) == vmin else int(eid) - 1
        buf += (vp & _M).to_bytes(8, "little")
        h = xxh64(buf)
        exp[int(eid)] = h - (1 << 64) if h >= (1 << 63) else h
    if len(got) != len(exp):
        return False, f"rows: spark={len(got)} python={len(exp)}"
    bad = 0
    for v, c in zip(got["version"], got["checksum"]):
        if exp.get(int(v)) != int(c):
            bad += 1
    return bad == 0, (f"{bad} checksum mismatches" if bad
                      else f"all {len(exp)} checksums equal an independent"
                           " pure-Python XXH64 over the LE layout")

# no-oracle entries checked by a PYTHON recomputation rather than SQL
BAND_PY = {"el_checksum": _el_checksum_check}

def band_check(con, name, got):
    """Returns (ok, detail) for a banded no-oracle entry."""
    if name in BAND_PY:
        return BAND_PY[name](con, got)
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
            if name in BAND_SQL or name in BAND_PY:
                ok, detail = band_check(con, name, got)
                if ok:
                    print(f"  ~ {name}: rows={len(got)} (no oracle; external check OK, {detail})")
                    n_noop += 1
                else:
                    print(f"  X {name}: EXTERNAL CHECK FAILED: {detail}")
                    n_fail += 1
            else:
                print(f"  ~ {name}: rows={len(got)} (no oracle, rows-only)")
                n_noop += 1
            continue
        t0 = time.monotonic()
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
            print(f"  ✓ {name}: rows={len(g)} ({time.monotonic() - t0:.1f}s oracle)")
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
