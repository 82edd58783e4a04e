#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Reads the Verify output dir (per-query parquet + oracle_sql.json),
runs each oracle in DuckDB against the same sf tables, and compares:
schema (column names sorted), row count, and values (exact; floats
reported with max abs diff when not exact).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def rowkey(row):
    return tuple((v is None, str(type(v)), str(v)) for v in row)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_t = pq.read_table(f"{out_dir}/{name}")
            # Pre-flight: the driver's pandas hash gate sorts rows with
            # sort_values, which raises on unhashable cells. Any
            # top-level list/map/struct column WILL error the driver row
            # even if both engines agree (the r7 f83/f85 failures; the
            # r4 F41 lesson). Reject at the schema level here.
            import pyarrow.types as pat
            nested = [f.name for f in got_t.schema
                      if pat.is_nested(f.type)]
            if nested:
                print(f"FAIL {name}: nested-typed output columns {nested} "
                      f"— driver's pandas sort/hash cannot handle them; "
                      f"render as strings (array_to_string) on both engines")
                n_fail += 1
                continue
            got_cols = sorted(got_t.column_names)
            got = sorted(
                (tuple(norm(r[c]) for c in got_cols) for r in got_t.to_pylist()),
                key=rowkey)
            exp_rel = con.sql(sql)
            exp_cols_raw = exp_rel.columns
            exp_rows = exp_rel.fetchall()
            order = sorted(range(len(exp_cols_raw)), key=lambda i: exp_cols_raw[i])
            exp_cols = [exp_cols_raw[i] for i in order]
            exp = sorted((tuple(norm(r[i]) for i in order) for r in exp_rows),
                         key=rowkey)
        except Exception as e:
            print(f"FAIL {name}: ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: schema {got_cols} vs {exp_cols}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            n_fail += 1
            continue
        # Pre-flight for the driver's pandas hash path: the driver
        # converts both sides to pandas and hashes values, so a DuckDB
        # HUGEINT (→float64) vs Spark int64 mismatches even when every
        # value is equal (the r4/r5 f24/f38 lesson). Catch it here.
        dtype_bad = []
        try:
            exp_df = con.sql(sql).df()
            got_df = got_t.to_pandas()
            def kind(dt):
                s = str(dt).lower()
                if s.startswith(("int", "uint")):
                    return "int"
                if s.startswith("float"):
                    return "float"
                return "other"
            for c in got_cols:
                gk, ek = kind(got_df[c].dtype), kind(exp_df[c].dtype)
                # only the int-vs-float kind split breaks the driver's
                # hash (HUGEINT→float64 vs Spark int64); datetime/object/
                # category splits hash fine (values stringify equal)
                if {gk, ek} == {"int", "float"}:
                    dtype_bad.append((c, str(got_df[c].dtype), str(exp_df[c].dtype)))
        except Exception:
            pass
        if dtype_bad:
            print(f"FAIL {name}: pandas dtype mismatch (driver hash would "
                  f"differ): {dtype_bad}")
            n_fail += 1
            continue
        if got == exp:
            n_pass += 1
            continue
        # locate first diff + float tolerance summary
        maxd, first = 0.0, None
        exact = True
        for g, e in zip(got, exp):
            if g == e:
                continue
            for a, b in zip(g, e):
                if a == b:
                    continue
                exact = False
                if isinstance(a, float) and isinstance(b, float):
                    maxd = max(maxd, abs(a - b))
                if first is None:
                    first = (a, b)
        print(f"FAIL {name}: values differ, first={first}, max_float_diff={maxd}")
        n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {len(oracle)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
