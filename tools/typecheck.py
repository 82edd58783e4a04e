#!/usr/bin/env python3
"""Cross-engine dtype audit: compare the arrow types of Spark's parquet
results against DuckDB's arrow result types for every oracle query.
A value-equal but type-mismatched column (int32 vs int64) could still
fail a strict schema gate.

Usage: python3 tools/typecheck.py <sfDir> <verifyOutDir>
"""
import json, sys
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(t):
    s = str(t)
    # engines legitimately differ on timestamp unit / large_string
    s = s.replace("large_string", "string").replace("timestamp[us]", "ts") \
         .replace("timestamp[ns]", "ts").replace("timestamp[ms]", "ts")
    return s


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = 0
    for name, sql in sorted(oracle.items()):
        import glob
        part = glob.glob(f"{out_dir}/{name}/*.parquet")[0]
        got = pq.read_schema(part)
        exp = con.sql(sql).arrow().schema
        gm = {f.name: norm(f.type) for f in got}
        em = {f.name: norm(f.type) for f in exp}
        for c in sorted(set(gm) | set(em)):
            if gm.get(c) != em.get(c):
                print(f"TYPE {name}.{c}: spark={gm.get(c)} duckdb={em.get(c)}")
                bad += 1
    print(f"\n{bad} type mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
