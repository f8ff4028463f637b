"""Trigram-search scale rehearsal over the chunked documents slice
(tools/gen_scale_docs.py): separates the two costs the operator has —

1. INDEX BUILD (write-once): trigram_postings materialized to parquet,
   timed with its row count (the inverted-index mass — must grow
   linearly with corpus characters);
2. INDEXED SEARCH (per query): trigram_search fed the materialized
   postings, timed with its hit count (must grow with posting mass of
   the pattern's grams, NOT with the corpus);
plus the AD-HOC search (index built inline) at the smaller points for
the honest single-shot cost.

The slice's per-copy token suffixing (``_c{c}``) keeps vocabulary
growing with scale; the pattern "stream" is a substring of every
copy's variant ("stream_c7"), so true hits grow linearly too.

Usage: python tools/rehearse_trigram.py <slice_dir> <copies> [pattern]
       (e.g. scale_data/sf1000_docs 1000 stream)
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
    pattern = sys.argv[3] if len(sys.argv) > 3 else "stream"
    spark = get_spark(app_name="mrf-rehearse-trigram")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(BASE)
    d_off = base.agg(F.max("doc_id")).first()[0] + 1
    docs = (spark.read.parquet(f"{slice_dir}/documents.parquet")
            .where(F.col("doc_id") < copies * d_off))

    idx_path = os.path.join(slice_dir, f"_trgm_idx_{copies}")
    t0 = time.time()
    T.trigram_postings(docs, "doc_id", "text").write.mode(
        "overwrite").parquet(idx_path)
    t_idx = round(time.time() - t0, 1)
    post = spark.read.parquet(idx_path)
    n_post = post.count()
    print(json.dumps({"phase": "index_materialized", "copies": copies,
                      "n_postings": n_post, "index_wall_s": t_idx}),
          flush=True)

    t0 = time.time()
    hits = T.trigram_search(docs, "doc_id", "text", pattern,
                            postings=post).count()
    t_search = round(time.time() - t0, 1)

    out = {"copies": copies, "pattern": pattern,
           "n_docs": docs.count(), "n_postings": n_post,
           "index_wall_s": t_idx, "n_hits": hits,
           "indexed_search_wall_s": t_search}
    if copies <= 100:
        t0 = time.time()
        h2 = T.trigram_search(docs, "doc_id", "text", pattern).count()
        out["adhoc_search_wall_s"] = round(time.time() - t0, 1)
        assert h2 == hits
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
