#!/usr/bin/env python3
"""DuckDB side of the engine race (see graft.tools.RaceBench): identical
query shapes on the same replicated parquet. Dev/measurement tool only.

Each query reduces to a SMALL digest over real output columns — a bare
count(*) is not honest race work, since both optimizers prune everything a
count doesn't reference (round-2 finding: Catalyst deletes an unreferenced
max_by wholesale, so count-based timings compared gutted plans).

Usage: python3 tools/race_duck.py /tmp/sfbig [threads]
"""
import sys, time
import duckdb

base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfbig"
threads = int(sys.argv[2]) if len(sys.argv) > 2 else 32
con = duckdb.connect()
con.execute(f"SET threads TO {threads}")
for t in ["lineitem", "orders", "customer", "nation"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{base}/{t}.parquet/*.parquet')")

QUERIES = {
    "DUCK_Q01_AGG": """SELECT l_returnflag, l_linestatus,
        round(sum(l_quantity), 2), round(sum(l_extendedprice * (1 - l_discount)), 2),
        round(avg(l_quantity), 4), count(*)
        FROM lineitem GROUP BY 1, 2""",
    "DUCK_Q07_WINDOW": """SELECT count(*), round(sum(l_extendedprice), 2),
        min(l_shipdate) FROM (
        SELECT *, row_number() OVER (PARTITION BY l_orderkey
          ORDER BY l_shipdate DESC, l_linenumber ASC, l_extendedprice DESC) rn
        FROM lineitem) WHERE rn = 1""",
    "DUCK_Q11_JOIN": """SELECT count(*), round(sum(o_totalprice), 2), min(c_name)
        FROM (
        SELECT l_orderkey, l_extendedprice, o_totalprice, c_name, n_name
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        LEFT JOIN customer ON o_custkey = c_custkey
        LEFT JOIN nation ON c_nationkey = n_nationkey
        WHERE o_totalprice IS NOT NULL)""",
    "DUCK_Q01_AGG_2nd": None,  # rerun of Q01
}
QUERIES["DUCK_Q01_AGG_2nd"] = QUERIES["DUCK_Q01_AGG"]

for name, sql in QUERIES.items():
    t0 = time.time()
    r = con.execute(sql).fetchall()
    print(f"{name} out={r[:1]}... t={time.time()-t0:.2f}s")
