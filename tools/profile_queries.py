"""Time a list of registered queries end-to-end (toPandas, the gate's
action) — best-of-N on a quiet machine.  Pure measurement.

Usage: python tools/profile_queries.py <sf_dir> <repeats> <query ...>
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1]
    repeats = int(sys.argv[2])
    names = sys.argv[3:]

    from map_reduce_folds_spark.queries import QUERIES
    from map_reduce_folds_spark.session import get_spark

    spark = get_spark(app_name="profile-queries")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"{name}: NOT REGISTERED")
            continue
        best = None
        rows = None
        for _ in range(repeats):
            spark.catalog.clearCache()
            t0 = time.time()
            df = fn(spark, sf_dir)
            rows = len(df.toPandas())
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"{best:8.3f}s  {name} (rows={rows})")
    spark.stop()


if __name__ == "__main__":
    main()
