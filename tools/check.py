#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracles in oracle_sql.json over the same
sf-dir tables. Compares sorted rows (columns sorted by name) with a
small float tolerance fallback so we can see whether exact-hash would
pass too."""
import json, math, sys
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
if len(sys.argv) > 3:  # optional subset: check.py SF OUT q1 q2 ...
    keep = set(sys.argv[3:])
    oracle = {k: v for k, v in oracle.items() if k in keep}

def norm(v):
    if v is None: return None
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    return v

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t)), [cols[i] for i in order]

def approx_eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return a == b

fails = exacts = approxs = 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        got = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'")
        grows, gcols = got.fetchall(), [d[0] for d in got.description]
        want = con.sql(sql)
        wrows, wcols = want.fetchall(), [d[0] for d in want.description]
    except Exception as e:
        print(f"FAIL {name}: error {e}")
        fails += 1
        continue
    g, gc = canon(grows, gcols)
    w, wc = canon(wrows, wcols)
    if [c.lower() for c in gc] != [c.lower() for c in wc]:
        print(f"FAIL {name}: columns {gc} vs {wc}")
        fails += 1
    elif len(g) != len(w):
        print(f"FAIL {name}: rowcount {len(g)} vs {len(w)}")
        fails += 1
    elif g == w:
        exacts += 1
    else:
        ok = all(len(x) == len(y) and all(approx_eq(a, b) for a, b in zip(x, y)) for x, y in zip(g, w))
        if ok:
            print(f"APPROX {name}: values match only within 1e-9 (exact hash would differ)")
            approxs += 1
        else:
            bad = next((x, y) for x, y in zip(g, w) if x != y)
            print(f"FAIL {name}: first diff rows:\n  spark={bad[0]}\n  duck ={bad[1]}")
            fails += 1
rows_only = [n for n in json.load(open(f"{OUT}/oracle_sql.json"))]  # oracle names
print(f"\n{exacts} exact, {approxs} approx, {fails} fail, {len(oracle)} total oracles")
