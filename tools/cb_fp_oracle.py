#!/usr/bin/env python3
"""DuckDB side of the ClickBench value-fingerprint gate: prints
`qNN <rowcount> <fingerprint>` for each official text over the same
synthesized hits view — diff against graft.tools.CbFpProbe's Spark
output to measure the deterministic/count-only split.

Usage: python3 tools/cb_fp_oracle.py <sfDir> [qnums...]
"""
import sys

import duckdb

QUERIES_DIR = "/root/reference/benchmark/clickbench/queries"


def hits_view_sql():
    # extract the view text from the Scala source so the two sides
    # can never drift
    src = open("src/main/scala/graft/queries/ClickBench43.scala").read()
    start = src.index('"""SELECT')
    end = src.index('FROM events"""', start)
    body = src[start + 3 : end + len("FROM events")]
    return "\n".join(line.split("|", 1)[1] if "|" in line else line
                     for line in body.splitlines())


def masks_from_scala():
    src = open("src/main/scala/graft/queries/ClickBench43.scala").read()
    start = src.index("fracMasks: Seq[String] = Seq(")
    end = src.index(")", start)
    body = src[start:end]
    return [m for m in body.split('"')[1::2]]


def main():
    sf = sys.argv[1]
    only = {int(a) for a in sys.argv[2:]}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    con.execute(f"CREATE VIEW hits AS {hits_view_sql()}")
    masks = masks_from_scala()
    for i in range(43):
        if only and (i + 1) not in only:
            continue
        q = open(f"{QUERIES_DIR}/q{i + 1:02d}.sql").read().strip().rstrip(";")
        mask = masks[i]
        cols = [f"c{k}" for k in range(len(mask))]
        norms = [
            (f"COALESCE(CAST(CAST(floor(CAST(CAST(c{k} AS VARCHAR) AS DOUBLE)*100 + 0.5) AS BIGINT) AS VARCHAR), '<null>')"
             if ch == "f" else f"COALESCE(CAST(c{k} AS VARCHAR), '<null>')")
            for k, ch in enumerate(mask)
        ]
        # concat_ws, not chained || — wide rows (q30: 90 cols) blow
        # DuckDB's 128-deep binder recursion on the chained form
        row = f"concat_ws('|', {', '.join(norms)})" if len(norms) > 1 else norms[0]
        fp_sql = (
            f"SELECT CAST(COUNT(*) AS BIGINT) AS n, "
            f"COALESCE(md5(string_agg(__r, chr(10) ORDER BY __r)), '<empty>') AS fp FROM "
            f"(SELECT {row} AS __r FROM (\n{q}\n) __t({', '.join(cols)})) __rows"
        )
        try:
            n, fp = con.sql(fp_sql).fetchall()[0]
            print(f"q{i + 1:02d} {n} {fp}")
        except Exception as e:
            print(f"q{i + 1:02d} ERR {str(e)[:200]}")


if __name__ == "__main__":
    main()
