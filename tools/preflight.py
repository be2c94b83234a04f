#!/usr/bin/env python3
"""Local pre-flight of the driver's correctness gate (SURVEY §5.1).

Usage: python3 tools/preflight.py <sfDir> <verifyOutDir> [keys...]

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views
over <sfDir>/*.parquet, sorts columns by name (the driver does this before
hashing), and compares row-by-row with exact equality. Dev-only tool — the
shipped Scala library never depends on this.
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        return ("f", v)          # exact float compare (bit-identical IEEE)
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no Spark result dir"); n_fail += 1; continue
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in spark_cols) +
                f" FROM read_parquet('{res_dir}/*.parquet')").fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}"); n_fail += 1; continue
        try:
            duck_rel = con.sql(sql)
            duck_cols = sorted(duck_rel.columns)
            duck_rows = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in duck_cols) +
                f" FROM ({sql}) _q").fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        if spark_cols != duck_cols:
            print(f"FAIL {name}: columns differ\n  spark: {spark_cols}\n  duck:  {duck_cols}")
            n_fail += 1; continue
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: row count spark={len(spark_rows)} duck={len(duck_rows)}")
            n_fail += 1; continue
        bad = None
        for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
            ca, cb = tuple(map(canon, a)), tuple(map(canon, b))
            if ca != cb:
                bad = (i, a, b); break
        if bad:
            i, a, b = bad
            print(f"FAIL {name}: first diff at row {i} (cols {spark_cols})\n  spark: {a}\n  duck:  {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
