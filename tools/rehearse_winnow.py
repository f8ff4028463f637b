"""Winnowing-family scale rehearsal over the chunked documents slice
(tools/gen_scale_docs.py): time winnow_fingerprints and
winnow_overlap_pairs on a doc_id-prefix of the corpus and report row
counts alongside walls (counts are the ground truth that the index and
the capped pair join grow with the data).

Usage: python tools/rehearse_winnow.py <slice_dir> <copies> [k w max_df shuffle_partitions]
       (e.g. scale_data/sf1000_docs 1000)

``shuffle_partitions`` is the cluster-shaped lever: the winnow window
sorts ~n_grams rows hash-partitioned by doc, so partitions must be
sized to the corpus (n_grams/partitions rows each), exactly the
"size spark.sql.shuffle.partitions to the SF" rule — prefer raising it
over raising the heap.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from map_reduce_folds_spark.operators import text as T  # noqa: E402
from map_reduce_folds_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1/documents.parquet"


def main() -> None:
    slice_dir = sys.argv[1]
    copies = int(sys.argv[2])
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    w = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    max_df = int(sys.argv[5]) if len(sys.argv) > 5 else 10
    parts = int(sys.argv[6]) if len(sys.argv) > 6 else None
    kwargs = {"shuffle_partitions": parts} if parts else {}
    spark = get_spark(app_name="mrf-rehearse-winnow", **kwargs)
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(BASE)
    d_off = base.agg(F.max("doc_id")).first()[0] + 1
    docs = (spark.read.parquet(f"{slice_dir}/documents.parquet")
            .where(F.col("doc_id") < copies * d_off))

    # the documented scale path: materialize the fingerprint index ONCE
    # (parquet — a disk-backed stage boundary) and feed it to the pair
    # join via fps=; the index write is timed as part of the fp phase
    idx_path = os.path.join(slice_dir, f"_winnow_idx_{copies}")
    t0 = time.time()
    fp = T.winnow_fingerprints(docs, k=k, w=w, materialize_path=idx_path)
    n_fp = fp.count()
    t_fp = round(time.time() - t0, 1)
    print(json.dumps({"phase": "fingerprints_materialized",
                      "copies": copies,
                      "n_fp": n_fp, "fp_wall_s": t_fp}), flush=True)

    t0 = time.time()
    pairs = T.winnow_overlap_pairs(docs, k=k, w=w, min_shared=2,
                                   max_df=max_df, fps=fp)
    agg = pairs.agg(F.count(F.lit(1)), F.sum("shared")).first()
    t_pairs = round(time.time() - t0, 1)

    print(json.dumps({
        "copies": copies, "k": k, "w": w, "max_df": max_df,
        "n_docs": docs.count(), "n_fp": n_fp, "fp_wall_s": t_fp,
        "n_pairs": agg[0], "sum_shared": agg[1],
        "pairs_wall_s": t_pairs,
    }), flush=True)


if __name__ == "__main__":
    main()
