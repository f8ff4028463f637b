"""Measure named queries at sf0.1 and the 10x synthetic (scale_data/sf1.0)
with bench.py's methodology (force-all-columns, per-plan warm-up at the
smaller SF, best-of-2 with clearCache) and print a SCALE_BENCH-shaped JSON.

Usage: python tools/scale_bench.py query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from map_reduce_folds_spark.queries import QUERIES  # noqa: E402
from map_reduce_folds_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("MRF_SCALE_BASE", "/root/testdata/sf0.1")
# MRF_SCALE_DIR overrides the big side (e.g. the 100x rehearsal slice);
# MRF_SCALE_LABEL names it in the output JSON
TENX = os.environ.get("MRF_SCALE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scale_data", "sf1.0"))
LABEL = os.environ.get("MRF_SCALE_LABEL", "sf1.0_10x")
BASE_LABEL = os.environ.get("MRF_SCALE_BASE_LABEL", "sf0.1")


def run_to_completion(df):
    df.agg(F.count(F.lit(1)),
           F.sum(F.xxhash64(*df.columns).cast("double"))).collect()


def best_of_2(spark, fn, sf_dir):
    best = None
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        run_to_completion(fn(spark, sf_dir))
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return round(best, 3)


def main():
    names = sys.argv[1:]
    missing = [n for n in names if n not in QUERIES]
    assert not missing, f"unregistered: {missing}"
    spark = get_spark(app_name="mrf-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # codegen warm-up at sf0.01
    for n in names:
        try:
            run_to_completion(QUERIES[n](spark, "/root/testdata/sf0.01"))
        except Exception as exc:  # noqa: BLE001
            print(f"# {n}: WARMUP ERROR {exc}", file=sys.stderr)
    out = {BASE_LABEL: {}, LABEL: {}, "ratios": {}}
    for n in names:
        out[BASE_LABEL][n] = best_of_2(spark, QUERIES[n], BASE)
        out[LABEL][n] = best_of_2(spark, QUERIES[n], TENX)
        out["ratios"][n] = round(out[LABEL][n] / out[BASE_LABEL][n], 2)
        print(f"# {n}: {out[BASE_LABEL][n]}s -> {out[LABEL][n]}s "
              f"({out['ratios'][n]}x)", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
