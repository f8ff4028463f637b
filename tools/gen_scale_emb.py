"""Generate an N-copy embeddings-only scale slice (the 10,000×-class
rehearsal corpus) with gen_scale10.py's transform, written in CHUNKS.

Copy c of the sf0.1 base (20k vectors) = roll by ``c % dim`` composed
with the md5-parity ±1 sign block ``c // dim`` — norm-preserving,
deterministic, decorrelated for ANY copy count (same derivation as
gen_scale10._write_embeddings; a 1000-branch union plan analyzes for
minutes, so this writer appends 50-copy chunks instead).  vec_id offsets
by ``c · (max_id + 1)``, so copy boundaries are contiguous id ranges:
a rehearsal at a smaller scale point filters ``vec_id < copies · v_off``
and reads EXACTLY the first-copies prefix — one 20M file serves the
whole 2M/6.3M/20M series with parquet-pruned scans.

Usage: python tools/gen_scale_emb.py [out_dir] [copies]
       (defaults: scale_data/sf1000_emb, 1000)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from map_reduce_folds_spark.session import get_spark  # noqa: E402
from tools.gen_scale10 import _sign_pattern  # noqa: E402

SRC = "/root/testdata/sf0.1/embeddings.parquet"
CHUNK = 50


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, "scale_data", "sf1000_emb")
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    spark = get_spark(app_name="mrf-gen-scale-emb")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(SRC)
    v_off = emb.agg(F.max("vec_id")).first()[0] + 1
    dim = emb.select(F.size("embedding")).first()[0]
    dest = f"{out}/embeddings.parquet"
    mode = "overwrite"
    for lo in range(0, copies, CHUNK):
        hi = min(lo + CHUNK, copies)
        parts = []
        for c in range(lo, hi):
            r = c % dim
            rolled = F.expr(
                f"concat(slice(embedding, {r + 1}, {dim - r}), "
                f"slice(embedding, 1, {r}))") if r else F.col("embedding")
            sgn = _sign_pattern(c // dim, dim)
            if any(s < 0 for s in sgn):
                lit = F.array(*[F.lit(s) for s in sgn])
                rolled = F.zip_with(rolled, lit,
                                    lambda x, s: (x * s).cast("float"))
            parts.append(
                emb.withColumn("vec_id", F.col("vec_id") + F.lit(c * v_off))
                   .withColumn("embedding", rolled))
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode(mode).parquet(dest)
        mode = "append"
        print(f"# copies {lo}..{hi - 1} written", flush=True)
    n = spark.read.parquet(dest).count()
    print(f"# done: {n} vectors at {dest} (v_off={v_off}, dim={dim})")


if __name__ == "__main__":
    main()
