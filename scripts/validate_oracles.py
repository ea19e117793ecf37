#!/usr/bin/env python3
"""Fast oracle-SQL validation (NOT product code): EXPLAIN every registry
oracle in DuckDB against views over the smallest fixture, so a typo'd
oracle fails in seconds instead of at full-gate time (~12 min).

Usage:
  sbt-free:  scripts/run.sh graft.tools.RegistryReport /tmp/reg
             python3 scripts/validate_oracles.py /root/testdata/sf0.001 /tmp/reg/oracle_sql_all.json
"""
import sys, json, os, time
import duckdb

sf_dir, oracle_json = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracles = json.load(open(oracle_json))
t0 = time.time()
bad = []
for name, sql in sorted(oracles.items()):
    try:
        # EXPLAIN parses, binds and plans (catches typos, bad columns,
        # reserved words, malformed CTEs) without executing the ladder
        con.execute(f"EXPLAIN {sql}")
    except Exception as e:
        bad.append((name, str(e).splitlines()[0]))
for name, err in bad:
    print(f"FAIL {name}: {err}")
print(f"== {len(oracles) - len(bad)} ok, {len(bad)} fail, {time.time() - t0:.1f}s ==")
sys.exit(1 if bad else 0)
