"""Stage-level decomposition of the headline bench queries (guide §1).

Times isolated sub-pipelines with the noop sink so the computation is
measured, not the sink, and prints a breakdown.  Pure measurement —
no state is written anywhere.

Usage: python tools/profile_bench.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def t(label, df, repeats=3, noop=True):
    best = None
    for _ in range(repeats):
        df.sparkSession.catalog.clearCache()
        t0 = time.time()
        if noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.collect()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{best:8.3f}s  {label}")
    return best


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from map_reduce_folds_spark.session import get_spark
    from map_reduce_folds_spark.sources import load_table
    from map_reduce_folds_spark.operators import dedup as D
    from map_reduce_folds_spark.operators import similarity as S
    from map_reduce_folds_spark.queries import QUERIES

    spark = get_spark(app_name="profile-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm engine
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for tb in ("lineitem", "orders", "customer", "documents", "embeddings"):
        load_table(spark, sf_dir, tb).selectExpr("count(1)").collect()

    li = load_table(spark, sf_dir, "lineitem")
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")

    print("== floors ==")
    t("range(1) agg collect", spark.range(1).agg(F.count(F.lit(1))), noop=False)
    t("range(1) noop", spark.range(1))
    print("== scans (single-file fixtures -> 1 task) ==")
    t("lineitem count", li.agg(F.count(F.lit(1))), noop=False)
    t("lineitem full-col hash agg", li.agg(
        F.count(F.lit(1)), F.sum(F.xxhash64(*li.columns).cast("double"))),
      noop=False)
    t("lineitem repartition(32) then hash agg",
      li.repartition(32).agg(
          F.count(F.lit(1)), F.sum(F.xxhash64(*li.columns).cast("double"))),
      noop=False)

    print("== q1 variants ==")
    q1 = QUERIES["q1_pricing_summary"]
    t("q1 as-is", q1(spark, sf_dir))
    fil = li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
    t("q1 scan+filter only", fil.agg(F.count(F.lit(1))), noop=False)

    print("== dedup_minhash decomposition ==")
    base = D.minhash_band_rows(d, "doc_id", "text", n=3, k=16, bands=8)
    t("minhash_band_rows (1-task arrow stage)", base)
    base32 = D.minhash_band_rows(
        d.repartition(32, "doc_id"), "doc_id", "text", n=3, k=16, bands=8)
    t("minhash_band_rows repartition(32) first", base32)
    t("dedup_minhash full", QUERIES["dedup_minhash"](spark, sf_dir))

    print("== dedup_embedding decomposition ==")
    srp = S.srp_bucket_rows(e, "vec_id", "embedding", 64, 6, 8)
    t("srp_bucket_rows (1-task arrow stage)", srp)
    srp32 = S.srp_bucket_rows(
        e.repartition(32, "vec_id"), "vec_id", "embedding", 64, 6, 8)
    t("srp_bucket_rows repartition(32) first", srp32)
    t("dedup_embedding full", QUERIES["dedup_embedding"](spark, sf_dir))

    print("== other headline fulls (noop) ==")
    for name in ("mr_readme_sum", "mr_fold_vocab", "q3_shipping_priority",
                 "q5_local_supplier", "text_stats", "sim_topk_bruteforce",
                 "dedup_exact", "window_topk_per_group"):
        t(name, QUERIES[name](spark, sf_dir))

    spark.stop()


if __name__ == "__main__":
    main()
