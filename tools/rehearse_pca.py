"""Distributed-PCA scale rehearsal over the chunked embeddings slice
(tools/gen_scale_emb.py): time the exact moment pass + power fit and
the residual-scoring scan on a vec_id-prefix of the corpus — the
spectral family's scale story (corpus work = ONE Arrow moment scan +
one scoring scan; the iteration runs on the bounded dim^2 model).

Usage: python tools/rehearse_pca.py <slice_dir> <copies> [shuffle_partitions]
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
    parts = int(sys.argv[3]) if len(sys.argv) > 3 else None
    kwargs = {"shuffle_partitions": parts} if parts else {}
    spark = get_spark(app_name="mrf-rehearse-pca", **kwargs)
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(BASE)
    v_off = base.agg(F.max("vec_id")).first()[0] + 1
    emb = (spark.read.parquet(f"{slice_dir}/embeddings.parquet")
           .where(F.col("vec_id") < copies * v_off))
    n = emb.count()
    t0 = time.time()
    moments = S._pca_moments(emb, dim=64)
    t_mom = round(time.time() - t0, 1)
    t1 = time.time()
    comps, lams, tr, n_fit = S.pca_power_fit(
        emb, dim=64, n_components=2, iters=8, moments=moments)
    t_fit = round(time.time() - t1, 3)   # model-side only: bounded dim^2
    means = S.pca_means(moments)
    t2 = time.time()
    scored = S.pca_residual_scores(emb, comps, means)
    agg = scored.agg(F.count(F.lit(1)).alias("n"),
                     F.sum(F.xxhash64("vec_id", "resid").cast("double"))
                     .alias("h"), F.max("resid").alias("mx")).collect()[0]
    t_score = round(time.time() - t2, 1)
    print(json.dumps({
        "copies": copies, "n_vectors": n, "wall_moments_s": t_mom,
        "wall_fit_model_s": t_fit, "wall_residual_scan_s": t_score,
        "scored_rows": agg["n"], "max_resid": agg["mx"],
        "var_share_top2": round((lams[0] + lams[1]) / tr, 4),
        "n_fit": n_fit}))


if __name__ == "__main__":
    main()
