"""Simulate the driver's verify: entry() smoke + queries vs oracle_sql via DuckDB.

``--vanilla`` builds a bare SparkSession with ZERO engine configs — the
external driver's exact posture (this caught the round-1 nanosAsLong bug).
"""
import hashlib, importlib.util, os, sys
spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)
import duckdb
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
if "--vanilla" in sys.argv:
    from pyspark.sql import SparkSession
    spark = SparkSession.builder.master("local[8]").getOrCreate()
else:
    from iot_sparkstreaming_spark.session import get_spark
    spark = get_spark("driver-sim")
spark.sparkContext.setLogLevel("ERROR")

df = mod.entry(spark)
rows = df.collect()
print("ENTRY OK rows=", len(rows), "schema=", [f.name for f in df.schema])

qs, oracles = mod.queries(), mod.oracle_sql()
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

def vhash(cols, rows):
    cols = list(cols); order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(repr(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()

import decimal, datetime
def norm(v):
    if isinstance(v, decimal.Decimal): return float(v)
    if isinstance(v, datetime.datetime): return v.isoformat()
    return v

fail = 0
for name, fn in sorted(qs.items()):
    sdf = fn(spark, SF_DIR)
    srows = [tuple(norm(v) for v in r) for r in sdf.collect()]
    if name not in oracles:
        print(f"{name}: NO-ORACLE rows={len(srows)}"); continue
    res = con.execute(oracles[name]); dcols = [d[0] for d in res.description]
    drows = [tuple(norm(v) for v in r) for r in res.fetchall()]
    hs, hd = vhash(sdf.columns, srows), vhash(dcols, drows)
    ok = (len(srows)==len(drows)) and sorted(sdf.columns)==sorted(dcols) and hs==hd
    print(f"{name}: rows {len(srows)}/{len(drows)} cols_match={sorted(sdf.columns)==sorted(dcols)} hash={'MATCH' if hs==hd else 'MISMATCH'}")
    fail += 0 if ok else 1
print("FAILURES:", fail)
spark.stop()
