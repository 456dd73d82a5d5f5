"""Driver-style verification of the full contract at sf0.01."""
import os
import sys, time, duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from collections import Counter
import __spark_entry__ as entry
from graph4code_spark.session import get_spark

spark = get_spark("verify", master="local[8]",
                  extra_conf={"spark.sql.shuffle.partitions": "8"})
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.9g}"
            vals.append(str(v))
        out.append(tuple(vals))
    return Counter(out)


# verify the FULL fine-grained inventory (superset of the curated 50-entry
# driver contract); pass --curated to check exactly what the driver records
if "--curated" in sys.argv:
    sys.argv.remove("--curated")
    qs, os_ = entry.queries(), entry.oracle_sql()
else:
    qs, os_ = entry.queries_full(), entry.oracle_sql_full()
fails = []
for name, fn in qs.items():
    t0 = time.time()
    try:
        sdf = fn(spark, sf)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in os_:
            print(f"{name}: rows-only {len(srows)} rows  ({time.time()-t0:.1f}s)")
            continue
        rel = con.sql(os_[name])
        ocols = rel.columns
        orows = rel.fetchall()
        ok_rows = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        ok_hash = canon(srows, scols) == canon(orows, ocols)
        status = "PASS" if (ok_rows and ok_schema and ok_hash) else \
            f"FAIL rows={ok_rows} schema={ok_schema} hash={ok_hash} ({len(srows)} vs {len(orows)})"
        print(f"{name}: {status}  ({time.time()-t0:.1f}s)")
        if status != "PASS":
            fails.append(name)
    except Exception as e:
        print(f"{name}: ERROR {type(e).__name__}: {e}")
        fails.append(name)

print("\nentry() smoke:", end=" ")
df = entry.entry(spark)
n = df.count()
print(f"{n} rows, {len(df.columns)} cols: {df.columns}")
print("\nFAILURES:", fails if fails else "none")
sys.exit(1 if fails else 0)
