"""SimHash component-honesty rehearsal at the measured saturation scale.

Round-13 session-6 measured the cliff: 32-bit signatures birthday-
saturate at ~1M docs (C(1M,2)/2^32 ~ 116 expected spurious hamming-0
collisions chain 99% of the corpus into ONE component at 6x the wall).
Round 14 made ``bits="auto"`` (= simhash_auto_bits, 2*log2(n)+8 clamped
to [32, 60]) the family default; this rehearsal PROVES the default
produces honest components at the threshold scale: runs
``simhash_components`` on an n-doc slice of the gen_scale_docs corpus at
the auto width (48 bits at 1M) and, optionally, the legacy fixed 32 as a
same-moment control, reporting wall, component count, and the largest
component's corpus share.

Honesty criterion: the slice is `copies` decorrelated transforms of the
50k-doc sf0.1 base, so TRUE near-dup mass is bounded by the base's own
cluster structure times copies — the largest component must stay a tiny
corpus share; a >50% share is the saturation signature.

Usage: python tools/rehearse_simhash.py <slice_dir> [n_docs] [widths...]
       (e.g. scale_data/sf1000_docs 1000000 auto 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from map_reduce_folds_spark.operators import dedup as D  # noqa: E402
from map_reduce_folds_spark.session import get_spark  # noqa: E402


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(f"usage: {sys.argv[0]} <slice_dir> [n_docs] [widths...]")
    slice_dir = sys.argv[1]
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    widths = sys.argv[3:] or ["auto"]
    spark = get_spark(app_name="mrf-rehearse-simhash")
    spark.sparkContext.setLogLevel("ERROR")
    docs = (spark.read.parquet(f"{slice_dir}/documents.parquet")
            .where(F.col("doc_id") < n_docs)
            .select("doc_id", "text"))
    out = {"n_docs": n_docs, "points": {}}
    for w in widths:
        bits = "auto" if w == "auto" else int(w)
        resolved = (D.simhash_auto_bits(n_docs) if bits == "auto"
                    else bits)
        spark.catalog.clearCache()
        t0 = time.time()
        comp = D.simhash_components(docs, "doc_id", "text", bits=bits,
                                    n_docs=n_docs)
        stats = comp.groupBy("component").agg(
            F.count(F.lit(1)).alias("sz"))
        agg = stats.agg(
            F.count(F.lit(1)).alias("n_components"),
            F.max("sz").alias("largest"),
            F.sum("sz").alias("nodes")).first()
        wall = round(time.time() - t0, 1)
        rec = {
            "bits": resolved,
            "wall_s": wall,
            "n_components": agg["n_components"],
            "nodes_in_components": agg["nodes"],
            "largest_component": agg["largest"],
            "largest_share_of_corpus": round(
                (agg["largest"] or 0) / n_docs, 4),
        }
        out["points"][str(w)] = rec
        print(f"# bits={w} ({resolved}): {wall}s, "
              f"largest={rec['largest_component']} "
              f"({rec['largest_share_of_corpus']:.1%} of corpus)",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
