"""Dump ``explain("formatted")`` for registered queries to files.

Usage: python tools/dump_plans.py <out_dir> <suffix> [query ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` for each named query (default:
the bench headline set).  Driver-side planning only — no jobs run, so
this is safe to use while a measurement runs elsewhere.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "plans/r14"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]

    from map_reduce_folds_spark.queries import QUERIES
    from map_reduce_folds_spark.session import get_spark

    if not names:
        import bench

        names = list(bench.BENCH_QUERIES)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"# {name}: NOT REGISTERED", file=sys.stderr)
            continue
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {len(plan.splitlines())} lines, "
              f"{n_ex} Exchange refs -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
