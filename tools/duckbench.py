#!/usr/bin/env python3
"""Time the DuckDB oracle suite — the measured single-node baseline for
BASELINE.md's *measure-at-impl* rows (SURVEY §6 / r3 VERDICT item 5).

Usage: python3 tools/duckbench.py <sfDir> <verifyOutDir> [passes]
Env: DUCKBENCH_SKIP — comma-separated query keys to leave out (e.g. the
sf0.1 recursive-CTE reach oracles, which run for 45+ minutes there; the
driver's correctness gate only ever runs them at sf0.01).

Runs every oracle SQL from <verifyOutDir>/oracle_sql.json (written by
graft.Verify) over DuckDB views of <sfDir>/*.parquet, forcing full
materialization (fetchall), and prints per-query and total seconds as the
min over `passes` passes (default 2 — same noise policy as graft.Bench).
Dev-only tool — the shipped Scala library never depends on this.
"""
import sys, os, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    skip = set(filter(None, os.environ.get("DUCKBENCH_SKIP", "").split(",")))
    oracle = {k: v for k, v in oracle.items() if k not in skip}
    best = {}
    for p in range(passes):
        for name in sorted(oracle):
            t0 = time.time()
            try:
                con.sql(oracle[name]).fetchall()
                dt = time.time() - t0
            except Exception as e:
                print(f"ERROR {name}: {e}", flush=True)
                dt = float("inf")
            print(f"pass{p} {dt:8.3f}  {name}", flush=True)
            best[name] = min(best.get(name, float("inf")), dt)
    total = sum(v for v in best.values() if v != float("inf"))
    for name, v in sorted(best.items(), key=lambda kv: -kv[1]):
        print(f"{v:8.3f}  {name}")
    print(json.dumps({"metric": "duckdb_oracle_total", "value": round(total, 2),
                      "unit": "sec", "n_queries": len(best), "sf": sf_dir,
                      "passes": passes}))


if __name__ == "__main__":
    main()
