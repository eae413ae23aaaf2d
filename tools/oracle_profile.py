import json, time, sys, os
import duckdb
sf_dir, oracle_json = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"create view {t} as select * from read_parquet('{p}')")
oracle = json.load(open(oracle_json))
times = []
for name in sorted(oracle):
    t0 = time.monotonic()
    try:
        con.sql(oracle[name]).df()
        ok = "ok"
    except Exception as e:
        ok = "ERR " + str(e).splitlines()[0][:100]
    dt = time.monotonic() - t0
    times.append((dt, name, ok))
    print(f"{dt:8.2f}s {name} {ok}", flush=True)
print("== TOP 20 ==")
for dt, name, ok in sorted(times, reverse=True)[:20]:
    print(f"{dt:8.2f}s {name} {ok}")
print(f"TOTAL {sum(t for t,_,_ in times):.1f}s")
