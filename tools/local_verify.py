#!/usr/bin/env python3
"""Local pre-check of the driver's correctness gate.

Usage: python3 tools/local_verify.py <sfDir> <outDir>
  after: sbt "runMain graft.Verify <sfDir> <outDir>"

Reads each <outDir>/<name> parquet (Spark result) and runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over <sfDir>'s tables,
then compares: row count, column names (sorted), and cell values (columns
sorted by name, exact match; floats compared bit-exactly to be stricter
than the driver could possibly be).
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa
from decimal import Decimal

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm(v):
    # Scale-sensitive, like the driver's hasher: a Decimal('253942.00') must
    # NOT loosely equal the float 253942.0 or the int 253942 — the driver
    # canonicalizes each arrow type differently, so any cross-type pair that
    # only matches after float() conversion would still hash-mismatch there.
    if isinstance(v, float):
        return ("f", repr(v))
    if isinstance(v, Decimal):
        return ("dec", str(v))
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    return (type(v).__name__, v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            results[name] = "MISSING spark output"
            continue
        st = pq.read_table(files[0])
        try:
            dt = con.sql(sql).arrow()
        except Exception as e:
            results[name] = f"ORACLE SQL ERROR: {e}"
            continue
        s_cols, d_cols = sorted(st.column_names), sorted(dt.column_names)
        if s_cols != d_cols:
            results[name] = f"SCHEMA MISMATCH spark={s_cols} duck={d_cols}"
            continue
        if st.num_rows != dt.num_rows:
            results[name] = f"ROWCOUNT spark={st.num_rows} duck={dt.num_rows}"
            continue
        bad = None
        for c in s_cols:
            sv = [norm(x) for x in st.column(c).to_pylist()]
            dv = [norm(x) for x in dt.column(c).to_pylist()]
            if sv != dv:
                i = next(i for i,(a,b) in enumerate(zip(sv,dv)) if a != b)
                bad = f"VALUE MISMATCH col={c} row={i} spark={sv[i]!r} duck={dv[i]!r}"
                break
        results[name] = bad or f"OK ({st.num_rows} rows)"
    width = max(len(n) for n in results) if results else 0
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    for name, res in sorted(results.items()):
        print(f"{name:<{width}}  {res}")
    print(f"\n{n_ok}/{len(results)} oracle-checked queries match")
    # also report no-oracle queries that produced output
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name not in oracle:
            files = glob.glob(f"{d}/*.parquet")
            n = pq.read_table(files[0]).num_rows if files else -1
            print(f"[no-oracle] {name}: {n} rows")
    return 0 if n_ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
