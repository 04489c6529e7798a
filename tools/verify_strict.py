"""Driver-faithful correctness check: pandas-level canonicalization.

The round-2 lesson (``q_cast_types``): the grading driver compares results
through pandas, so a column that is ``object[Decimal]`` on the Spark side but
``float64`` on the DuckDB side hash-mismatches even when every value is
numerically equal.  ``tools/verify_driver.py`` normalizes Decimal→float and so
hid that bug.  This tool does NOT normalize: it converts both sides to pandas
the way the driver does (``DataFrame.toPandas()`` vs ``duckdb .df()``), sorts
columns by name and rows by stringified values, then requires

- identical column names,
- identical *stringified* cell values (no numeric coercion), and
- no unhashable cells (list/dict/ndarray) — those crash the driver outright.

Usage: python tools/verify_strict.py [N_KEYS] [SF_DIR]
       (default: first 50 keys, /root/testdata/sf0.01)
"""
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

_numeric = len(sys.argv) > 1 and sys.argv[1].isdigit()
N = int(sys.argv[1]) if _numeric else 50
SF = sys.argv[2] if _numeric and len(sys.argv) > 2 else "/root/testdata/sf0.01"

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as mod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
    )


def canon(df: pd.DataFrame):
    """Sort columns by name, rows by stringified tuple; return str cells."""
    df = df[sorted(df.columns)]
    cells = []
    bad_types = set()
    for _, row in df.iterrows():
        t = []
        for v in row:
            if isinstance(v, (list, dict, np.ndarray)):
                bad_types.add(type(v).__name__)
                v = str(v)
            if v is None or v is pd.NaT or (
                isinstance(v, (float, np.floating)) and np.isnan(v)
            ):
                t.append("<NULL>")
            elif isinstance(v, (bool, np.bool_)):
                t.append(f"b:{bool(v)}")
            elif isinstance(v, (int, np.integer)):
                # int32 vs int64 width is benign cross-engine; value matters
                t.append(f"i:{int(v)}")
            elif isinstance(v, (float, np.floating)):
                t.append(f"f:{float(v)!r}")
            elif isinstance(v, pd.Timestamp):
                t.append(f"t:{v.isoformat()}")
            else:
                # Decimal, date, str, bytes keep their class name so a
                # Decimal-vs-float64 split (the r2 bug class) is caught
                t.append(f"{type(v).__name__}:{v}")
        cells.append(tuple(t))
    cells.sort()
    return list(df.columns), cells, bad_types


q = mod.queries()
o = mod.oracle_sql()
# args that are key names select that subset; a single integer keeps the
# first-N behavior
if len(sys.argv) > 1 and not sys.argv[1].isdigit():
    keys = [k for k in sys.argv[1:] if k in q]
else:
    keys = list(q.keys())[:N]
fails = []
for k in keys:
    if k not in o:
        n = q[k](spark, SF).count()
        print(f"{k}: rows-only ({n} rows)")
        continue
    try:
        sp = q[k](spark, SF).toPandas()
        du = con.execute(o[k]).df()
        # duckdb dates come back datetime64; spark dates come back object[date]
        # — the driver sees the same split for every green date query, so
        # align that one known-benign case only.
        for c in sp.columns:
            if sp[c].dtype == object and sp[c].map(
                lambda v: v.__class__.__name__ == "date"
            ).all() and len(sp):
                sp[c] = pd.to_datetime(sp[c])
        sc, srows, sbad = canon(sp)
        dc, drows, dbad = canon(du)
        probs = []
        if sc != dc:
            probs.append(f"cols {sc} != {dc}")
        if sbad or dbad:
            probs.append(f"unhashable cells spark={sbad} duck={dbad}")
        if srows != drows:
            diff = next(
                (i, a, b)
                for i, (a, b) in enumerate(zip(srows, drows))
                if a != b
            ) if len(srows) == len(drows) else ("len", len(srows), len(drows))
            probs.append(f"values differ: {diff}")
        if probs:
            fails.append(k)
            print(f"{k}: FAIL — {'; '.join(str(p) for p in probs)[:500]}")
        else:
            print(f"{k}: ok ({len(srows)} rows)")
    except Exception as e:  # noqa: BLE001
        fails.append(k)
        print(f"{k}: ERROR {type(e).__name__}: {e}")

print("STRICT ALL MATCH" if not fails else f"STRICT FAILURES: {fails}")
