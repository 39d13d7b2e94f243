"""Driver-style correctness sweep: run every `queries()` entry against its
`oracle_sql()` DuckDB twin (rows + schema + value-hash, columns sorted by
name) at $SWEEP_SF_DIR (default sf0.01).  Usage:

    python scripts/gate_sweep.py [gate ...]   # default: all gates

Writes per-gate results to $SWEEP_OUT (default /tmp/gate_sweep.json).
This is the full-coverage auditable record behind BASELINE.md's
"N/N local sweep" lines — the driver samples only a subset per round.
"""
import json, os, sys, hashlib
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb
import __spark_entry__ as e
from pyspark.sql import SparkSession

SF = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.01")
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "8g")
         .config("spark.sql.adaptive.enabled", "true")
         .appName("gate-sweep").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def vhash(rows, cols):
    h = hashlib.md5()
    scols = sorted(cols)
    def norm(v):
        if v is None: return "NULL"
        if isinstance(v, float): return f"{v:.6g}"
        return str(v)
    data = sorted(tuple(norm(r[c]) for c in scols) for r in rows)
    for row in data:
        h.update("|".join(row).encode()); h.update(b"\n")
    return h.hexdigest()

qs = e.queries(); os_ = e.oracle_sql()
results = {}
keys = sys.argv[1:] if len(sys.argv) > 1 else sorted(qs)
for k in keys:
    try:
        sdf = qs[k](spark, SF)
        scols = sdf.columns
        srows = [r.asDict() for r in sdf.collect()]
        odf = con.execute(os_[k]).fetch_arrow_table()
        ocols = odf.column_names
        orows = odf.to_pylist()
        rm = len(srows) == len(orows)
        sm = sorted(scols) == sorted(ocols)
        hm = sm and vhash(srows, scols) == vhash(orows, ocols)
        results[k] = {"rows": rm, "schema": sm, "hash": hm,
                      "s": len(srows), "o": len(orows)}
        tag = "OK " if (rm and sm and hm) else "FAIL"
        print(f"{tag} {k} rows={len(srows)}/{len(orows)} schema={sm} hash={hm}", flush=True)
    except Exception as ex:
        results[k] = {"err": str(ex)[:200]}
        print(f"ERR {k}: {str(ex)[:200]}", flush=True)
bad = [k for k,v in results.items() if v.get("err") or not (v["rows"] and v["schema"] and v["hash"])]
print(f"\n{len(results)-len(bad)}/{len(results)} green; bad: {bad}")
json.dump(results, open(os.environ.get("SWEEP_OUT", "/tmp/gate_sweep.json"), "w"), indent=1)
