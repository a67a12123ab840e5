#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracles in oracle_sql.json over the same
sf-dir tables. Compares sorted rows (columns sorted by name) with a
small float tolerance fallback so we can see whether exact-hash would
pass too.

Type-sensitive (round 11): the driver's hash covers parquet PHYSICAL
types, not just values — DuckDB HUGEINT vs Spark int64 is a red even
when every value matches (that is exactly how pack_* stayed red for
two rounds while this replica said green). So this replica now (a)
compares the DuckDB-side result column types against the types DuckDB
infers from Spark's parquet dump, and (b) hard-fails any oracle whose
output schema contains HUGEINT/UHUGEINT — no int128 column can reach
the driver, because parquet has no int128 physical type for Spark to
agree with."""
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

def coltypes(rel):
    """column name -> duckdb type string, lower-cased names."""
    return {d[0].lower(): str(t) for d, t in zip(rel.description, rel.types)}

def pdtype(t):
    """Driver-equivalent dtype: the driver hashes results after a
    pandas-style conversion, so compare the dtype each duckdb type
    lands on there. This is what makes HUGEINT (int128 -> float64) a
    red against Spark's int64 while DECIMAL(4,1) vs DOUBLE is green
    (both float64) — matching the r10 driver verdicts exactly."""
    u = t.upper()
    if "HUGEINT" in u: return "float64"
    if u.startswith("DECIMAL"): return "float64"
    m = {"TINYINT": "int8", "SMALLINT": "int16", "INTEGER": "int32",
         "BIGINT": "int64", "UTINYINT": "uint8", "USMALLINT": "uint16",
         "UINTEGER": "uint32", "UBIGINT": "uint64",
         "FLOAT": "float32", "REAL": "float32", "DOUBLE": "float64",
         "VARCHAR": "object", "BLOB": "bytes", "BOOLEAN": "bool",
         "DATE": "date"}
    if u in m: return m[u]
    if u.startswith("TIMESTAMP"): return "datetime64"
    return u  # nested/list/struct: compare the rendered type verbatim

fails = exacts = approxs = 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        got = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'")
        grows, gcols = got.fetchall(), [d[0] for d in got.description]
        gtypes = coltypes(got)
        want = con.sql(sql)
        wrows, wcols = want.fetchall(), [d[0] for d in want.description]
        wtypes = coltypes(want)
    except Exception as e:
        print(f"FAIL {name}: error {e}")
        fails += 1
        continue
    huge = {c: t for c, t in wtypes.items() if "HUGEINT" in t.upper()}
    if huge:
        print(f"FAIL {name}: oracle emits int128 (driver hash can never match): {huge}")
        fails += 1
        continue
    typediff = {c: (gtypes[c], wtypes[c]) for c in gtypes
                if c in wtypes and pdtype(gtypes[c]) != pdtype(wtypes[c])}
    if typediff:
        print(f"FAIL {name}: column type mismatch spark-vs-oracle: {typediff}")
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
