"""Distributed-kmeans scale rehearsal over the chunked embeddings slice
(tools/gen_scale_emb.py): time kmeans_fit_distributed on a vec_id-prefix
of the corpus and report the final cluster-size distribution (ground
truth that the model saw every vector).

Usage: python tools/rehearse_kmeans.py <slice_dir> <copies> [k iters shuffle_partitions]
       (e.g. scale_data/sf1000_emb 1000 8 3 256)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from map_reduce_folds_spark.operators import similarity as S  # noqa: E402
from map_reduce_folds_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1/embeddings.parquet"


def main() -> None:
    slice_dir = sys.argv[1]
    copies = int(sys.argv[2])
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    parts = int(sys.argv[5]) if len(sys.argv) > 5 else None
    kwargs = {"shuffle_partitions": parts} if parts else {}
    spark = get_spark(app_name="mrf-rehearse-kmeans", **kwargs)
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(BASE)
    v_off = base.agg(F.max("vec_id")).first()[0] + 1
    emb = (spark.read.parquet(f"{slice_dir}/embeddings.parquet")
           .where(F.col("vec_id") < copies * v_off))
    n = emb.count()
    t0 = time.time()
    km = S.kmeans_fit_distributed(emb, dim=64, k=k, iters=iters)
    sizes = sorted(r.n for r in km.where("j = 0").collect())
    wall = round(time.time() - t0, 1)
    print(json.dumps({"copies": copies, "n_vectors": n, "k": k,
                      "iters": iters, "wall_s": wall,
                      "cluster_sizes": sizes,
                      "sum_sizes": sum(sizes)}))


if __name__ == "__main__":
    main()
