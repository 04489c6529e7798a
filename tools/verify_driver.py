"""Emulate the external driver: vanilla SparkSession + __spark_entry__ contract.

SPARK_GRAFT_VERIFY_SF overrides the comparison fixture (default sf0.01,
the grading SF) — e.g. SPARK_GRAFT_VERIFY_SF=sf0.1 cross-checks the
oracles at 10x the gate, catching SF-dependent fragility (hardcoded
bounds, threshold cliffs) before a fixture change would."""
import os, sys, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import duckdb

# Vanilla session — deliberately NOT the engine's builder: no nanosAsLong,
# no UTC tz. The entry module must make queries work anyway.
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as mod

df = mod.entry(spark)
rows = df.collect()
print("entry(): rows =", len(rows), "schema =", [f.name for f in df.schema.fields])
print("sample:", rows[0])

q = mod.queries(); o = mod.oracle_sql()
print("queries:", sorted(q.keys()))
print("oracled:", sorted(o.keys()))

SF = os.environ.get("SPARK_GRAFT_VERIFY_SF", "sf0.01")
SF_DIR = f"/root/testdata/{SF}"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

# driver-style compare at $SPARK_GRAFT_VERIFY_SF for every oracled key
def norm(cols, rows):
    import math
    from decimal import Decimal
    from datetime import datetime, date
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    def nc(v):
        if isinstance(v, Decimal): return float(v)
        if isinstance(v, datetime): return v.replace(tzinfo=None).isoformat()
        if isinstance(v, date): return v.isoformat()
        if isinstance(v, float) and math.isnan(v): return "NaN"
        return v
    out = sorted([tuple(nc(r[i]) for i in idx) for r in rows],
                 key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in idx], out

# Optional subset: `python tools/verify_driver.py key1 key2 ...` or
# `python tools/verify_driver.py --window N` (first N driver-order keys).
keys = sorted(q.keys())
if len(sys.argv) > 2 and sys.argv[1] == "--window":
    keys = list(q.keys())[: int(sys.argv[2])]
elif len(sys.argv) > 1:
    keys = [k for k in sys.argv[1:] if k in q]

ok = True
for k in keys:
    sdf = q[k](spark, SF_DIR)
    scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
    if k in o:
        cur = con.execute(o[k]); dcols = [d[0] for d in cur.description]; drows = cur.fetchall()
        sc, sn = norm(scols, srows); dc, dn = norm(dcols, drows)
        match = sc == dc and sn == dn
        ok &= match
        print(f"{k}: spark={len(srows)} duck={len(drows)} cols_match={sc==dc} hash_match={match}")
    else:
        print(f"{k}: rows-only, {len(srows)} rows")
print("ALL MATCH" if ok else "MISMATCH FOUND")
