"""Generate an N-copy embeddings scale slice with PLANTED near-duplicate
pairs at known density — the survivor-mass rehearsal corpus.

The r13 20M-vector rehearsal proved "no survivor broadcast" only as a
PLAN property: its decorrelated corpus produced ZERO output pairs, so
the partitioned rescore join never carried volume (caveat recorded in
SCALE.md).  This corpus fixes that: copies use gen_scale_emb's
norm-preserving roll+sign decorrelation, EXCEPT that every odd copy c
re-uses copy (c-1)'s transform for even vec_ids — planting one EXACT
duplicate pair (cos = 1.0) per even base id per copy-pair:

    planted pairs = (copies / 2) x |{base ids: id % 2 == 0}|

Every planted pair shares every LSH bucket in every table (identical
vectors), so candidate recall is 1.0 by construction and the verified
pair count must equal the planted count exactly (the decorrelated
remainder contributes ~0 pairs at thresholds >= 0.9 — measured at r13).
2500 copies of the 2k-vector sf0.1 base = 5M vectors / 1.25M planted
pairs: enough survivor mass to stress the partitioned rescore for real.

Usage: python tools/gen_scale_emb_planted.py [out_dir] [copies]
       (defaults: scale_data/sf2500_emb_planted, 2500)
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


def _transform(c: int, dim: int):
    """Copy c's roll+sign column expression (gen_scale_emb's derivation)."""
    r = c % dim
    rolled = F.expr(
        f"concat(slice(embedding, {r + 1}, {dim - r}), "
        f"slice(embedding, 1, {r}))") if r else F.col("embedding")
    sgn = _sign_pattern(c // dim, dim)
    if any(s < 0 for s in sgn):
        lit = F.array(*[F.lit(s) for s in sgn])
        rolled = F.zip_with(rolled, lit,
                            lambda x, s: (x * s).cast("float"))
    return rolled


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, "scale_data", "sf2500_emb_planted")
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 2500
    spark = get_spark(app_name="mrf-gen-scale-emb-planted")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(SRC)
    v_off = emb.agg(F.max("vec_id")).first()[0] + 1
    dim = emb.select(F.size("embedding")).first()[0]
    n_even = emb.where(F.col("vec_id") % 2 == 0).count()
    dest = f"{out}/embeddings.parquet"
    mode = "overwrite"
    for lo in range(0, copies, CHUNK):
        hi = min(lo + CHUNK, copies)
        parts = []
        for c in range(lo, hi):
            col = _transform(c, dim)
            if c % 2 == 1:
                # plant: even base ids repeat the partner copy's vector
                col = F.when(F.col("vec_id") % 2 == 0,
                             _transform(c - 1, dim)).otherwise(col)
            parts.append(
                emb.withColumn("vec_id", F.col("vec_id") + F.lit(c * v_off))
                   .withColumn("embedding", col))
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode(mode).parquet(dest)
        mode = "append"
        print(f"# copies {lo}..{hi - 1} written", flush=True)
    n = spark.read.parquet(dest).count()
    planted = (copies // 2) * n_even
    print(f"# done: {n} vectors at {dest} (v_off={v_off}, dim={dim}, "
          f"planted_pairs={planted} [= copies/2 x {n_even} even ids])")


if __name__ == "__main__":
    main()
