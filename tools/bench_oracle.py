"""Time the DuckDB oracles of the headline queries at a given sf — the
single-node analytical-engine comparison for BENCH numbers.

Usage: python tools/bench_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduce_folds_spark.sources import TABLES


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = sys.argv[2:]

    from bench import BENCH_QUERIES
    from map_reduce_folds_spark.queries import ORACLES

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    names = only or [q for q in BENCH_QUERIES if q in ORACLES]
    timings = {}
    for name in names:
        sql = ORACLES.get(name)
        if not sql:
            continue
        con.sql(sql).fetchall()  # warm (buffer cache, plan)
        t0 = time.time()
        n = len(con.sql(sql).fetchall())
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]:.2f}s rows={n}", file=sys.stderr)

    print(json.dumps({"engine": "duckdb-oracle", "sf_dir": sf_dir,
                      "total": round(sum(timings.values()), 3),
                      "queries": timings}))


if __name__ == "__main__":
    main()
