"""Generate an N-copy documents-only scale slice (the winnowing /
text-family 1000×-class rehearsal corpus) with gen_scale10.py's
transform, written in CHUNKS.

Copy c of the sf0.1 base (5k docs) suffixes every token with ``_c{c}``
(c > 0) — gram spaces stay DISJOINT across copies, so fingerprint /
shingle pair work grows with the data, never cross-copy-quadratically
(the gen_scale10 documents rule).  doc_id offsets by ``c · (max_id+1)``,
so copy boundaries are contiguous id ranges: a rehearsal at a smaller
scale point filters ``doc_id < copies · d_off`` and reads EXACTLY the
first-copies prefix — one file serves a whole 10×/100×/1000× series
with parquet-pruned scans.  A single union of 1000 branches analyzes
for minutes (the gen_scale_emb lesson), so this writer appends
CHUNK-copy batches.

Usage: python tools/gen_scale_docs.py [out_dir] [copies]
       (defaults: scale_data/sf1000_docs, 1000)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from map_reduce_folds_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1/documents.parquet"
CHUNK = 50


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, "scale_data", "sf1000_docs")
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    spark = get_spark(app_name="mrf-gen-scale-docs")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(SRC)
    d_off = docs.agg(F.max("doc_id")).first()[0] + 1
    dest = f"{out}/documents.parquet"
    mode = "overwrite"
    for lo in range(0, copies, CHUNK):
        hi = min(lo + CHUNK, copies)
        parts = []
        for c in range(lo, hi):
            if c == 0:
                parts.append(docs)
                continue
            suffixed = F.array_join(
                F.transform(F.split("text", " "),
                            lambda tok, c=c: F.concat(tok, F.lit(f"_c{c}"))),
                " ")
            parts.append(
                docs.withColumn("doc_id", F.col("doc_id") + F.lit(c * d_off))
                    .withColumn("text", suffixed)
                    .withColumn("n_chars",
                                F.length(suffixed).cast("bigint")))
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode(mode).parquet(dest)
        mode = "append"
        print(f"# copies [{lo}, {hi}) appended", flush=True)
    print(f"# done -> {dest} (d_off={d_off}, copies={copies})")


if __name__ == "__main__":
    main()
