#!/usr/bin/env python3
"""Same-box DuckDB baseline for the Bench headline set.

Runs each headline query's ORACLE SQL (the exact SQL the correctness
gate validates against) in DuckDB on the same parquet tables, warm
(best of 3 after one warm-up), and prints one JSON line comparable to
Bench's output. The oracle SQL comes from a Verify output dir
(oracle_sql.json) so Spark and DuckDB are guaranteed to run the same
computation.

Usage: python3 tools/bench_baseline.py <sfDir> <verifyOutDir> [threads]
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# keep in sync with graft.Bench.headline
HEADLINE = [
    "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q10", "tpch_q12",
    "tpch_q18", "tpch_q19",
    "q06_theta_join", "q07_groupjoin", "q13_window_rank", "q31_asof_join",
    "q32_range_join", "q48_window_range", "q53_topk_custom",
    "d01_dedup_exact", "d02_dedup_minhash", "d03_dedup_simhash",
    "d04_ngram_jaccard", "d07_dedup_star_clusters", "s01_cosine_topk",
    "s03_ann_ivf", "t02_quality_score", "t04_fingerprint", "st02_sessionize",
    "p05_crossdoc_grams", "p07_contamination",
    "d08_line_dedup", "p08_dsir_select", "p12_ngram_lm",
]


def main(sf_dir, out_dir, threads=32):
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written dataset: directory of parts
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    res, skipped = {}, []
    for name in HEADLINE:
        if name not in oracle:
            skipped.append(name)  # rows-only entry: no oracle SQL to time
            continue
        sql = oracle[name]
        con.sql(sql).fetchall()  # warm (buffer cache, JIT-ish setup)
        best = min(_timed(con, sql) for _ in range(3))
        res[name] = round(best, 4)
    total = round(sum(res.values()), 4)
    # dataset layout fingerprint: the r4->r5 flat-TPC-H baseline moved
    # 2-3x on a regenerated dataset; per-query grading needs a stable,
    # recorded denominator (duckdb version + file counts/bytes)
    layout = {}
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            files = [os.path.join(p, f) for f in os.listdir(p)
                     if f.endswith(".parquet")]
        elif os.path.exists(p):
            files = [p]
        else:
            continue
        layout[t] = {"files": len(files),
                     "bytes": sum(os.path.getsize(f) for f in files)}
    print(json.dumps({
        "metric": "duckdb_baseline_total", "value": total, "unit": "sec",
        "queries": res, "skipped_no_oracle": skipped, "sf": sf_dir,
        "threads": threads, "duckdb_version": duckdb.__version__,
        "dataset_layout": layout,
    }))


def _timed(con, sql):
    t0 = time.perf_counter()
    con.sql(sql).fetchall()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 32)
