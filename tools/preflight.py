#!/usr/bin/env python3
"""Local pre-flight of the driver's correctness gate (SURVEY §5.1).

Usage: python3 tools/preflight.py <sfDir> <verifyOutDir> [keys...]

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views
over <sfDir>/*.parquet, sorts columns by name (the driver does this before
hashing), and compares row-by-row.

DTYPE-STRICT (round-2 fix): the driver hashes the Spark result loaded via
pyarrow->pandas against the oracle loaded via duckdb .df()->pandas, so
VALUE equality is not enough — the materialized representation must match.
Python equality hid exactly this in round 1 (Decimal('1.000000') == 1.0 and
5 == 5.0 are True → 13 false-passes). We therefore:
  1. map each column's DuckDB type to its driver-side pandas representation
     per side (Spark parquet DECIMAL -> Decimal objects; oracle DECIMAL and
     HUGEINT -> float64; LIST/STRUCT/MAP on the Spark side -> checker crash)
     and fail on any mismatch;
  2. compare values with a (type-name, value) tag so Decimal/int/float
     cross-type equality can never pass.
Dev-only tool — the shipped Scala library never depends on this.
"""
import sys, os, json, re
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def driver_repr(duck_type: str, side: str) -> str:
    """Pandas dtype the DRIVER would materialize for this column.
    side='spark': parquet via pyarrow->pandas. side='duck': rel.df()."""
    t = str(duck_type).upper()
    if t.startswith("DECIMAL"):
        # pyarrow keeps Decimal objects; duckdb .df() gives float64
        return "object:Decimal" if side == "spark" else "float64"
    if t == "HUGEINT":
        return "float64"  # duckdb .df() materializes int128 as float64
    if any(t.startswith(p) for p in ("STRUCT", "MAP")) or "[]" in t or t.startswith("LIST"):
        return "CRASH:nested"  # driver's pandas row-sort raises on ndarray cells
    return {
        "TINYINT": "int8", "SMALLINT": "int16", "INTEGER": "int32",
        "BIGINT": "int64", "UTINYINT": "uint8", "USMALLINT": "uint16",
        "UINTEGER": "uint32", "UBIGINT": "uint64",
        "FLOAT": "float32", "DOUBLE": "float64",
        "VARCHAR": "object:str", "BOOLEAN": "bool",
        "DATE": "date", "BLOB": "object:bytes",
    }.get(t, "ts" if t.startswith("TIMESTAMP") else f"other:{t}")


def canon(v):
    # tag with the concrete python type so 5 == 5.0 == Decimal('5') can
    # never compare equal across representations
    return (type(v).__name__, v)


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
            spark_types = dict(zip(spark_rel.columns, [str(t) for t in spark_rel.types]))
            spark_cols = sorted(spark_rel.columns)
            spark_rows = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in spark_cols) +
                f" FROM read_parquet('{res_dir}/*.parquet')").fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}"); n_fail += 1; continue
        try:
            duck_rel = con.sql(sql)
            duck_types = dict(zip(duck_rel.columns, [str(t) for t in duck_rel.types]))
            duck_cols = sorted(duck_rel.columns)
            duck_rows = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in duck_cols) +
                f" FROM ({sql}) _q").fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        if spark_cols != duck_cols:
            print(f"FAIL {name}: columns differ\n  spark: {spark_cols}\n  duck:  {duck_cols}")
            n_fail += 1; continue
        # --- dtype strictness: the driver-side pandas repr must agree ---
        bad_types = []
        for c in spark_cols:
            sr = driver_repr(spark_types[c], "spark")
            dr = driver_repr(duck_types[c], "duck")
            if sr.startswith("CRASH") or dr.startswith("CRASH"):
                bad_types.append(f"{c}: nested type crashes driver checker "
                                 f"(spark={spark_types[c]}, duck={duck_types[c]})")
            elif sr != dr:
                bad_types.append(f"{c}: driver repr mismatch spark={spark_types[c]}->{sr} "
                                 f"duck={duck_types[c]}->{dr}")
        if bad_types:
            print(f"FAIL {name}: dtype drift\n  " + "\n  ".join(bad_types))
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
