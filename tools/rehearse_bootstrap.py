"""Poisson-bootstrap scale rehearsal over the chunked documents slice
(tools/gen_scale_docs.py): verifies the family's 100 TB claim — work is
STRICTLY LINEAR in rows (one md5 + one integer-threshold CASE per
(row, replicate)), map-side combinable down to |keys| x n_boot tiny
aggregate rows — at corpus scales where superlinear smells would show
(5M docs x 200 replicates = 1e9 weighted rows at the 1000x point).

Measures the registered bootstrap_doclen_ci shape (mean n_chars CI per
source) at a geometric series of copy counts from ONE slice (the
contiguous-id-prefix property), printing wall seconds, row mass, and
the per-decade wall ratio.  The CI itself is also sanity-checked:
ci_lo <= mean <= ci_hi for every source at every scale.

Usage: python tools/rehearse_bootstrap.py <slice_dir> [copies ...]
       (e.g. scale_data/sf1000_docs 10 100 1000)
The base slice whose max doc_id sets the copy stride defaults to
$SPARK_GRAFT_SF_DIR/documents.parquet (or /root/testdata/sf0.1).
"""

from __future__ import annotations

import json
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from map_reduce_folds_spark.operators import sampling as SM  # noqa: E402
from map_reduce_folds_spark.session import get_spark  # noqa: E402

BASE = os.path.join(
    os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    "documents.parquet")
N_BOOT = 200


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(f"usage: {sys.argv[0]} <slice_dir> [copies ...]   "
                 "(slice_dir from tools/gen_scale_docs.py; base slice "
                 f"= $SPARK_GRAFT_SF_DIR/documents.parquet, now {BASE})")
    slice_dir = sys.argv[1]
    points = [int(x) for x in sys.argv[2:]] or [10, 100, 1000]
    spark = get_spark(app_name="mrf-rehearse-bootstrap")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(BASE)
    d_off = base.agg(F.max("doc_id")).first()[0] + 1

    out = {"n_boot": N_BOOT, "points": {}}
    prev = None
    for copies in points:
        # compute the length on the fly: older slices carry a mixed
        # int32/int64 physical type for n_chars across chunk files
        # (gen_scale_docs cast fixed 2026-08-16); length(text) also
        # proves the scan cost honestly instead of a pruned column
        docs = (spark.read.parquet(f"{slice_dir}/documents.parquet")
                .where(F.col("doc_id") < copies * d_off)
                .select("doc_id", "source",
                        F.length("text").cast("bigint").alias("n_chars")))
        spark.catalog.clearCache()
        t0 = time.time()
        rows = SM.poisson_bootstrap_mean_ci(
            docs, "n_chars", "doc_id", keys=["source"],
            n_boot=N_BOOT).collect()
        wall = round(time.time() - t0, 1)
        n = sum(r["n"] for r in rows)
        assert all(r["ci_lo"] <= r["mean"] <= r["ci_hi"] for r in rows), \
            "CI failed to bracket the mean"
        rec = {"wall_s": wall, "rows": n, "weighted_rows": n * N_BOOT,
               "sources": len(rows)}
        if prev is not None:
            rec["wall_ratio_vs_prev_point"] = round(wall / prev, 2)
        prev = wall
        out["points"][f"{copies}x"] = rec
        print(f"# {copies}x: {wall}s, {n} rows, "
              f"{n * N_BOOT / 1e6:.0f}M weighted rows", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
