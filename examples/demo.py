"""Runnable tour of the engine — the reference's readme/ListStats examples
re-expressed on the driver fixtures, plus one of each operator family.

    python examples/demo.py [sf_dir]     # default /root/testdata/sf0.001
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from map_reduce_folds_spark import (
    Assign, Filter, FoldReduce, MapReduce, Melt, folds, get_spark,
)
from map_reduce_folds_spark.operators import dedup, relational, similarity
from map_reduce_folds_spark.sources import load_table


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="mrf-demo")
    spark.sparkContext.setLogLevel("ERROR")
    li = load_table(spark, sf_dir, "lineitem")

    print("\n-- readme query: filter even, key by %3==0, sum --")
    MapReduce(
        unpack=Filter(F.col("l_quantity").cast("bigint") % 2 == 0),
        assign=Assign(keys={"k": F.col("l_partkey") % 3 == 0},
                      values={"v": "l_extendedprice"}),
        reduce=FoldReduce({"total": folds.sum_("v")}),
    ).run(li).show()

    print("-- applicative reduce: four folds, ONE shuffle --")
    MapReduce(
        assign=Assign(keys={"flag": "l_returnflag"}, values={"v": "l_quantity"}),
        reduce=FoldReduce({
            "n": folds.count_(),
            "total": folds.sum_("v"),
            "lo": folds.min_("v"),
            "hi": folds.max_("v"),
        }),
    ).run(li).show()

    print("-- melt: row -> [x, 2x] --")
    MapReduce(
        unpack=Melt(F.array(F.col("l_quantity"), F.col("l_quantity") * 2),
                    alias="y", keep=("l_returnflag",)),
        assign=Assign(keys={"flag": "l_returnflag"}, values={"v": "y"}),
        reduce=FoldReduce({"total": folds.sum_("v")}),
    ).run(li).show()

    print("-- broadcast star join --")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    relational.join(o, c, o.o_custkey == c.c_custkey, broadcast_right=True) \
        .groupBy("c_mktsegment").agg(F.count("*").alias("orders")).show()

    print("-- MinHash-LSH near-dup pairs (jaccard >= 0.5) --")
    docs = load_table(spark, sf_dir, "documents")
    dedup.minhash_near_dup_pairs(docs, threshold=0.5).show(5)

    print("-- cosine top-3 neighbors for 2 query vectors --")
    emb = load_table(spark, sf_dir, "embeddings")
    similarity.brute_force_topk(emb.filter("vec_id < 2"), emb, k=3).show()

    print("-- SRP-LSH embedding near-dup pairs (bucketed, no cross join) --")
    similarity.embedding_near_dup_pairs_lsh(emb, threshold=0.4).show(5)

    print("-- corpus cleaning: quality filter -> PII scrub -> chunk counts --")
    from map_reduce_folds_spark.operators import text as T
    cleaned = (
        docs.filter(T.quality_score("text") >= 0.5)
        .select("doc_id", T.scrub_pii("text").alias("text"))
        .select("doc_id",
                F.size(T.chunk_starts(T.tokenize("text"), 50, 40)).alias("n_chunks"))
    )
    cleaned.groupBy().agg(F.count("*").alias("docs_kept"),
                          F.sum("n_chunks").alias("chunks")).show()

    print("-- deterministic train/val/test split + weighted source mix --")
    from map_reduce_folds_spark.operators import sampling as SM
    SM.hash_split(docs, "doc_id").groupBy("split").count().show()
    SM.mix_sources(docs, "source", {"src0": 1.0, "src1": 0.5}, "doc_id") \
        .groupBy("source").count().show()

    print("-- reproducible corpus shuffle (first 5 positions) --")
    SM.deterministic_shuffle(docs.select("doc_id"), "doc_id") \
        .orderBy("pos").show(5)

    print("-- cluster dedup: SimHash pairs -> connected components -> "
          "canonical doc per cluster --")
    from map_reduce_folds_spark.operators import graph as G
    pairs = dedup.simhash_near_dup_pairs(docs, "doc_id", "text")
    kept = G.dedup_by_components(docs, pairs.select("id_a", "id_b"), "doc_id")
    print(f"   corpus {docs.count()} docs -> {kept.count()} after "
          "cluster dedup (transitive closure, min-id canonical)")

    print("-- int8 quantized index: 4x smaller, top-3 on integer dot --")
    similarity.int8_topk(emb.filter("vec_id < 2"), emb, k=3).show()

    print("-- stratified sample: exactly 2 docs per language --")
    SM.stratified_sample_exact(docs, ["lang"], 2, "doc_id") \
        .select("doc_id", "lang").orderBy("lang", "doc_id").show()

    print("-- interval join: clicks inside purchase follow-up windows --")
    from map_reduce_folds_spark.timeutil import to_utc_timestamp
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        to_utc_timestamp("ts").alias("w_s"),
        (to_utc_timestamp("ts") + F.expr("INTERVAL 30 MINUTES")).alias("w_e"))
    clicks = ev.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"), "user_id",
        F.col("ts").alias("c_ts"))
    relational.interval_join(clicks, purchases, "c_ts", "w_s", "w_e",
                             on="user_id", bucket_width=1800.0) \
        .groupBy("purchase_id").count().show(5)

    print("-- count-min heavy hitters: top tokens, fixed-size sketch --")
    from map_reduce_folds_spark.operators import sketches as K
    from map_reduce_folds_spark.operators import text as T2
    toks = docs.select(F.explode(T2.tokenize("text")).alias("tok"))
    cells = K.cms_cells(toks, "tok", d=4, w=1024)
    relational.topk(K.cms_estimate(cells, toks.distinct(), "tok", 4, 1024),
                    [F.col("est").desc(), F.col("tok")], 5).show()

    print("-- PSI drift gate between two corpus slices --")
    from map_reduce_folds_spark.operators.quality import drift_psi
    drift_psi(docs.filter("doc_id % 2 = 0"), docs.filter("doc_id % 2 = 1"),
              "n_chars", 0.0, 600.0, 12).show()

    print("-- C4-style line dedup: rewrite docs, drop repeated lines --")
    ld = dedup.dedup_lines_corpus(docs, "doc_id", "text",
                                  pseudo_line_tokens=10)
    ld.selectExpr("sum(n_lines) AS lines", "sum(n_kept) AS kept").show()

    print("-- weighted sample: 5 docs, probability ~ length --")
    SM.weighted_sample_exact(docs, "n_chars", 5, "doc_id") \
        .select("doc_id", "n_chars").show()

    print("-- bloom semi-join reduction: prune facts before the shuffle --")
    hot = docs.filter("n_chars > 500").select("doc_id")
    pruned = K.bloom_prune_join(docs, hot, "doc_id", "doc_id")
    print(f"   exact join rows via bloom-pruned fact scan: {pruned.count()}")

    print("-- PageRank over event-type transitions (bit-exact integer) --")
    from pyspark.sql.window import Window
    trans = ev.select(
        "event_type",
        F.lead("event_type").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("nxt")).where("nxt IS NOT NULL")
    G.pagerank(trans, "event_type", "nxt").orderBy(F.desc("rank")).show()

    print("-- personalized PageRank: journey proximity to purchase --")
    G.pagerank(trans, "event_type", "nxt", seeds=["purchase"]) \
        .orderBy(F.desc("rank")).show(3)

    print("-- triangle count of the near-dup pair graph (cliquishness) --")
    G.triangle_count(pairs, "id_a", "id_b").show()

    print("-- unigram log-prob quality score (perplexity proxy) --")
    from map_reduce_folds_spark.operators.quality import unigram_logprob
    unigram_logprob(docs).orderBy("mean_logprob").show(3)

    print("-- scale_audit: lint a pipeline plan for 100 TB smells --")
    from map_reduce_folds_spark.plans import scale_audit
    bad = docs.crossJoin(docs.select(F.col("doc_id").alias("d2")))
    print("   cross join ->", scale_audit(bad)[:1])
    clean = docs.groupBy("lang").count()
    clean.collect()
    print("   grouped count ->", scale_audit(clean) or "clean")

    spark.stop()


if __name__ == "__main__":
    main()
