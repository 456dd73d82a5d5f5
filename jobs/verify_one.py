"""Verify named queries vs their DuckDB oracles, driver-style."""
import os
import sys, time, duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from collections import Counter
import __spark_entry__ as entry
from graph4code_spark.session import get_spark

names = sys.argv[1].split(",")
sfs = (sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01").split(",")
spark = get_spark("verify1", master="local[8]",
                  extra_conf={"spark.sql.shuffle.partitions": "8"})


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


qs, os_ = entry.queries_full(), entry.oracle_sql_full()
fails = []
for sf in sfs:
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    for name in names:
        t0 = time.time()
        sdf = qs[name](spark, sf)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in os_:
            print(f"{sf} {name}: rows-only {len(srows)}")
            continue
        rel = con.sql(os_[name])
        ocols, orows = rel.columns, rel.fetchall()
        ok = (len(srows) == len(orows) and sorted(scols) == sorted(ocols)
              and canon(srows, scols) == canon(orows, ocols))
        print(f"{sf} {name}: {'PASS' if ok else 'FAIL'} "
              f"({len(srows)} vs {len(orows)} rows, {time.time()-t0:.1f}s)")
        if not ok:
            fails.append((sf, name))
print("FAILURES:", fails if fails else "none")
sys.exit(1 if fails else 0)
