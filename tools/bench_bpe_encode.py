"""BPE ENCODE at a real vocabulary (~8k merges), measured across three
corpus decades — the round-13 scale row for bpe_encode_token_counts.

The fixture documents' word pool saturates at ~90 learnable merges, so
this harness builds a deterministic SYNTHETIC corpus with a rich
vocabulary instead (hash-derived pseudo-words, quadratically-skewed
draw from a 100k-word pool — Heaps-law-shaped: distinct words saturate
while occurrences grow).  That is exactly the 100 TB encode shape the
word-level cache exists for: replay cost rides the DISTINCT-WORD
vocabulary (sub-linear), corpus cost rides the one wc scan + join
(linear).

The tokenizer trains ONCE on the 1x corpus (the realistic pipeline:
a fixed vocabulary applied to growing data) via the incremental local
replay, then each scale point measures the full encode: wc scan →
distinct-word arrow replay (substring-precheck fast path) → join back.

Usage: python tools/bench_bpe_encode.py [n_merges] [base_docs]
       (defaults: 8000 merges, 2000 docs at 1x; scales 1x/10x/100x)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from map_reduce_folds_spark.operators import bpe as BP  # noqa: E402
from map_reduce_folds_spark.session import get_spark  # noqa: E402

VOCAB = 100_000
WORDS_PER_DOC = 200


def synth_docs(spark, n_docs: int):
    """Deterministic corpus: word(rank) = md5-hex prefix of length
    6 + rank % 7; rank drawn with quadratic skew (u² — low ranks hot,
    the Zipf-ish head) from xxhash64(doc, pos)."""
    u = (F.abs(F.xxhash64(F.col("doc_id"), F.col("pos")))
         % 1_000_000) / 1_000_000.0
    rank = F.floor(F.lit(float(VOCAB)) * u * u).cast("bigint")
    word = F.substring(
        F.md5(F.concat(F.lit("w"), rank.cast("string"))),
        1, (6 + rank % 7).cast("int"))
    return (
        spark.range(n_docs).withColumnRenamed("id", "doc_id")
        .select("doc_id", F.explode(
            F.sequence(F.lit(0), F.lit(WORDS_PER_DOC - 1))).alias("pos"))
        .select("doc_id", word.alias("w"))
        .groupBy("doc_id")
        .agg(F.concat_ws(" ", F.collect_list("w")).alias("text"))
    )


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    spark = get_spark(app_name="mrf-bpe-encode-scale")
    spark.sparkContext.setLogLevel("ERROR")

    d1 = synth_docs(spark, base).localCheckpoint()
    t0 = time.time()
    merges = BP.bpe_learn_merges(d1, "text", n_merges)
    t_train = round(time.time() - t0, 1)
    out = {"n_merges": len(merges), "train_s": t_train,
           "vocab_pool": VOCAB, "words_per_doc": WORDS_PER_DOC}

    prev = None
    for label, mult in (("1x", 1), ("10x", 10), ("100x", 100)):
        docs = (d1 if mult == 1
                else synth_docs(spark, base * mult).localCheckpoint())
        nd = docs.count()
        distinct_words = docs.select(
            F.explode(F.split("text", " ")).alias("w")) \
            .where(F.length("w") > 0).select("w").distinct().count()
        best = None
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            enc = BP.bpe_encode_token_counts(
                docs, "doc_id", "text", len(merges), merges=merges,
                engine="arrow")
            row = enc.agg(F.sum("n_tokens").alias("t"),
                          F.sum("n_words").alias("w")).first()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        entry = {"docs": nd, "distinct_words": distinct_words,
                 "encode_s": round(best, 1),
                 "n_tokens": int(row.t), "n_words": int(row.w)}
        if prev is not None:
            entry["ratio_vs_prev"] = round(best / prev, 2)
        prev = best
        out[label] = entry
        print(f"# {label}: {entry}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
