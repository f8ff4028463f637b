"""Parameterized embedding near-dup rehearsal: one scale point per run.

Measures, for a given corpus (optionally an id-prefix slice of a bigger
one), threshold, scheme (srp|cp), verify and rescore strategy:

  * the resolved auto geometry (planes/tables or k/r/tables),
  * GROUND-TRUTH raw candidate volume from the bucket-size histogram
    (sum over buckets of occ·(occ-1)/2 — no join needed: groupBy with
    map-side combine over the skinny (tbl, bucket) rows), untimed,
  * the timed end-to-end run (count + value-hash of the pair output),
    with the index-table write timed SEPARATELY when --bucketed-table
    is used (write-once, amortized — the q9 recipe),

and prints ONE JSON line for SCALE_BENCH.

--phase write|query splits the bucketed-table runs across two processes
so the write shuffle's files die with the first session before the
query session starts (local-disk headroom at the 20M point); the query
phase re-registers the surviving warehouse directory as an EXTERNAL
bucketed table when the in-memory catalog forgot it.

Usage:
  python tools/rehearse_embedding.py --dir scale_data/sf100_emb \
      --threshold 0.9 --scheme srp --verify inline_q8 --rescore broadcast
  python tools/rehearse_embedding.py --dir scale_data/sf1000_emb \
      --limit 6320316 --threshold 0.95 --scheme cp --label cp_6.3M
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from map_reduce_folds_spark.operators import similarity as S  # noqa: E402
from map_reduce_folds_spark.session import get_spark  # noqa: E402

Q8_SCHEMA = ("__id BIGINT, tbl INT, bucket BIGINT, __q8 ARRAY<TINYINT>, "
             "__s DOUBLE, __a1 INT, __n DOUBLE")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True)
    ap.add_argument("--limit", type=int, default=None,
                    help="vec_id upper bound (prefix slice)")
    ap.add_argument("--threshold", type=float, default=0.9)
    ap.add_argument("--scheme", default="srp", choices=["srp", "cp"])
    ap.add_argument("--verify", default="inline_q8")
    ap.add_argument("--rescore", default="partitioned")
    ap.add_argument("--bucketed-table", default=None)
    ap.add_argument("--bucket-files", type=int, default=64)
    ap.add_argument("--phase", default="all",
                    choices=["all", "write", "query"])
    ap.add_argument("--skip-histogram", action="store_true")
    ap.add_argument("--histogram-only", action="store_true")
    ap.add_argument("--label", default=None)
    args = ap.parse_args()

    extra = {}
    if args.bucketed_table:
        # trust the per-bucket sort of the index table (we wrote it
        # sorted, one file per bucket): without this legacy flag Spark 3
        # re-sorts both SMJ sides — 380M rows × 2 of pure spill at the
        # 20M point, the difference between a streaming co-located join
        # and filling the disk
        extra["spark.sql.legacy.bucketedTableScan.outputOrdering"] = "true"
    spark = get_spark(app_name=f"mrf-rehearse-{args.label or 'emb'}",
                      extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(f"{args.dir}/embeddings.parquet")
    if args.limit:
        e = e.filter(F.col("vec_id") < args.limit)
    n = e.count()
    dim = e.select(F.size("embedding")).first()[0]
    out: dict = {"label": args.label, "dir": args.dir, "n_vecs": n,
                 "threshold": args.threshold, "scheme": args.scheme,
                 "verify": args.verify, "rescore": args.rescore,
                 "driver_memory": os.environ.get("SPARK_DRIVER_MEMORY", "8g")}
    if args.scheme == "cp":
        k, r, t = S.auto_cp_params(n, args.threshold, dim)
        out["geometry"] = {"cp_hashes": k, "fine_bits": r, "tables": t}
        cp_kw = dict(cp_hashes=k, n_planes=r, n_tables=t)
    else:
        p, t = S.auto_srp_params(n, args.threshold)
        out["geometry"] = {"planes": p, "tables": t}
        cp_kw = dict(cp_hashes=0, n_planes=p, n_tables=t)

    if not args.skip_histogram:
        t0 = time.time()
        hist = S.srp_bucket_rows(e, "vec_id", "embedding", dim,
                                 cp_kw["n_planes"], cp_kw["n_tables"],
                                 cp_hashes=cp_kw["cp_hashes"]) \
            .groupBy("tbl", "bucket") \
            .agg(F.count(F.lit(1)).alias("c")) \
            .agg(F.sum("c").alias("rows"),
                 F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("cand"),
                 F.max("c").alias("max_bucket")).first()
        out["bucket_rows"] = int(hist.rows)
        out["raw_candidates"] = int(hist.cand)
        out["max_bucket"] = int(hist.max_bucket)
        out["histogram_s"] = round(time.time() - t0, 1)
        if args.histogram_only:
            print(json.dumps(out), flush=True)
            return

    if args.bucketed_table and args.phase == "query" and \
            not spark.catalog.tableExists(args.bucketed_table):
        wh = spark.conf.get("spark.sql.warehouse.dir")
        loc = f"{wh}/{args.bucketed_table}"
        spark.sql(f"""
            CREATE TABLE {args.bucketed_table} ({Q8_SCHEMA})
            USING PARQUET
            CLUSTERED BY (tbl, bucket) SORTED BY (tbl, bucket)
            INTO {args.bucket_files} BUCKETS
            LOCATION '{loc}'
        """)
        print(f"# re-registered external bucketed table at {loc}",
              flush=True)

    op_kw = dict(
        id_col="vec_id", vec_col="embedding", dim=dim,
        threshold=args.threshold, corpus_count=n,
        verify=args.verify, rescore=args.rescore,
        scheme=args.scheme,
        materialize_bucketed=args.bucketed_table,
        bucket_files=args.bucket_files,
    )
    if args.scheme == "cp":
        op_kw.update(cp_hashes=cp_kw["cp_hashes"],
                     n_planes=cp_kw["n_planes"],
                     n_tables=cp_kw["n_tables"])
    t0 = time.time()
    dfq = S.embedding_near_dup_pairs_lsh(e, **op_kw)
    out["index_write_s"] = round(time.time() - t0, 1)  # ~0 unless bucketed
    if args.phase == "write":
        print(json.dumps(out), flush=True)
        return
    t0 = time.time()
    row = dfq.agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.xxhash64("id_a", "id_b").cast("double"))
                  .alias("h")).first()
    out["query_s"] = round(time.time() - t0, 1)
    out["pairs"] = int(row.n)
    out["pairs_hash"] = row.h
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
