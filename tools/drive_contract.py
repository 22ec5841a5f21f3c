"""Drive the driver contract surface like the round driver does:
fresh local Spark session, run each query at sf0.01, run its oracle
SQL in DuckDB on the same parquet, compare rows/schema/value-hash."""
import hashlib
import json
import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

import os
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
NAMES = sys.argv[1:] or ["minhash_bands", "events_json", "simhash", "embed_lsh_buckets", "html_main_content"]

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
import __spark_entry__ as em

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = "nan" if math.isnan(v) else repr(round(v, 9))
            else:
                v = repr(v)
            vals.append(v)
        canon.append("|".join(vals))
    canon.sort()
    return hashlib.sha256("\n".join(canon).encode()).hexdigest()[:16]


out = {}
for name in NAMES:
    q = em.queries()[name]
    sdf = q(spark, SF)
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = sdf.columns
    res = con.execute(em.oracle_sql()[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    out[name] = {
        "rows_match": len(s_rows) == len(d_rows),
        "schema_match": sorted(s_cols) == sorted(d_cols),
        "hash_match": value_hash(s_rows, s_cols) == value_hash(d_rows, d_cols),
        "spark_rows": len(s_rows),
        "oracle_rows": len(d_rows),
    }
    print(name, json.dumps(out[name]))

spark.stop()
ok = all(all(v[k] for k in ("rows_match", "schema_match", "hash_match")) for v in out.values())
print("ALL_GREEN" if ok else "MISMATCH")
