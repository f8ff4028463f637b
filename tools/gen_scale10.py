"""Generate a 10x-sf0.1 synthetic dataset for scaling measurement.

Facts (orders, lineitem, events, documents, embeddings) are replicated
10x with key offsets so every join stays valid; dimensions (region,
nation, customer, supplier, part) stay fixed — the realistic shape of a
growing warehouse (fact growth >> dim growth), and it means per-key group
sizes genuinely grow 10x (the right stress for per-key windows,
sessionization, and aggregations).

Copy transforms keep the WORKLOAD shape linear rather than quadratic:

- documents: every token in copy c>0 gets a ``_c{c}`` suffix, so shingle
  sets are disjoint ACROSS copies — near-dup pair counts scale 10x, not
  45x-cross-copy-quadratic (10 identical copies of each doc would make
  every dedup query measure pair-explosion, not data scaling).
- embeddings: copy c rolls the vector by c positions — norm and
  distribution preserved, copies decorrelated (random vectors rolled are
  ~orthogonal), so candidate volumes scale linearly.
- events: ts shifted by 7c seconds per copy so per-user streams
  interleave instead of stacking 10 duplicates on each instant.
- customer + nation (round 12): the record-linkage family scales on
  CUSTOMER, and with all dims fixed its 10x/100x rows measured nothing
  (flat 13 s, SCALE_BENCH_r11 note / r11 verdict #2).  Copy c offsets
  c_custkey and moves the copy into its OWN nation-key space
  (c_nationkey + 25c, with nation replicated the same way so every FK
  stays valid) — per-block size is constant, block COUNT grows with the
  data, so blocked-linkage candidates scale 10x, not the 100x a
  fixed-key-space copy would produce (the realistic shape: a growing
  customer base comes with a growing blocking-key domain, Hernández–
  Stolfo).  Names get the ``_c{c}`` suffix — a common suffix preserves
  every within-copy Levenshtein distance, so the match histogram is
  exactly ``copies ×`` the base histogram on shifted keys.

Usage: python tools/gen_scale10.py [out_dir] [copies]
       (defaults: scale_data/sf1.0, 10 copies)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from map_reduce_folds_spark.session import get_spark  # noqa: E402

COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10
# optional 3rd arg: comma-separated fact-table subset (a 100× rehearsal
# of the document/embedding rows doesn't need 60M lineitems on disk)
FACTS = ("orders", "lineitem", "events", "documents", "embeddings",
         "customer")
WANT = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set(FACTS)
DIMS = ("region", "supplier", "part")


def main() -> None:
    src = "/root/testdata/sf0.1"
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scale_data", "sf1.0")
    os.makedirs(out, exist_ok=True)
    spark = get_spark(app_name="gen-scale10")
    spark.sparkContext.setLogLevel("ERROR")

    for t in DIMS:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode(
            "overwrite").parquet(f"{out}/{t}.parquet")
        print(f"# {t}: copied")

    if "customer" in WANT:
        nat = spark.read.parquet(f"{src}/nation.parquet")
        nk_off = nat.agg(F.max("n_nationkey")).first()[0] + 1
        nparts = [nat] + [
            nat.withColumn("n_nationkey",
                           F.col("n_nationkey") + F.lit(c * nk_off))
               .withColumn("n_name",
                           F.concat(F.col("n_name"), F.lit(f"_c{c}")))
            for c in range(1, COPIES)
        ]
        u = nparts[0]
        for p in nparts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out}/nation.parquet")
        print(f"# nation: x{COPIES} (nationkey offset {nk_off})")

        cust = spark.read.parquet(f"{src}/customer.parquet")
        ck_off = cust.agg(F.max("c_custkey")).first()[0] + 1
        cparts = [cust] + [
            cust.withColumn("c_custkey",
                            F.col("c_custkey") + F.lit(c * ck_off))
                .withColumn("c_nationkey",
                            F.col("c_nationkey") + F.lit(c * nk_off))
                .withColumn("c_name",
                            F.concat(F.col("c_name"), F.lit(f"_c{c}")))
            for c in range(1, COPIES)
        ]
        u = cparts[0]
        for p in cparts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out}/customer.parquet")
        print(f"# customer: x{COPIES} (custkey offset {ck_off}, "
              f"per-copy nation space)")
    else:
        for t in ("nation", "customer"):
            spark.read.parquet(f"{src}/{t}.parquet").write.mode(
                "overwrite").parquet(f"{out}/{t}.parquet")
            print(f"# {t}: copied")

    if "orders" in WANT or "lineitem" in WANT:
        orders = spark.read.parquet(f"{src}/orders.parquet")
        ok_off = orders.agg(F.max("o_orderkey")).first()[0] + 1
    if "orders" in WANT:
        parts = [orders] + [
            orders.withColumn("o_orderkey",
                              F.col("o_orderkey") + F.lit(c * ok_off))
            for c in range(1, COPIES)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out}/orders.parquet")
        print(f"# orders: x{COPIES} (orderkey offset {ok_off})")

    if "lineitem" in WANT:
        li = spark.read.parquet(f"{src}/lineitem.parquet")
        parts = [li] + [
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(c * ok_off))
            for c in range(1, COPIES)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
        print(f"# lineitem: x{COPIES} (same orderkey offset)")

    if "events" in WANT:
        ev = spark.read.parquet(f"{src}/events.parquet")
        ev_off = ev.agg(F.max("event_id")).first()[0] + 1
        parts = [ev] + [
            ev.withColumn("event_id", F.col("event_id") + F.lit(c * ev_off))
              .withColumn("ts",
                          F.col("ts") + F.expr(f"INTERVAL {7 * c} SECONDS"))
            for c in range(1, COPIES)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out}/events.parquet")
        print(f"# events: x{COPIES} (ts interleaved, user_id shared)")

    if "documents" not in WANT:
        if "embeddings" in WANT:
            _write_embeddings(spark, src, out)
        print(f"# done -> {out}")
        return

    docs = spark.read.parquet(f"{src}/documents.parquet")
    d_off = docs.agg(F.max("doc_id")).first()[0] + 1
    parts = [docs]
    for c in range(1, COPIES):
        suffixed = F.array_join(
            F.transform(F.split("text", " "),
                        lambda tok: F.concat(tok, F.lit(f"_c{c}"))), " ")
        parts.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(c * d_off))
                .withColumn("text", suffixed)
                .withColumn("n_chars", F.length(suffixed)))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    print(f"# documents: x{COPIES} (per-copy token suffix)")

    if "embeddings" in WANT:
        _write_embeddings(spark, src, out)
    print(f"# done -> {out}")


def _sign_pattern(block: int, dim: int) -> list[float]:
    """Deterministic ±1 pattern per roll-exhaustion block (md5 parity —
    the same public derivation as similarity._srp_coeff).  Block 0 is
    all +1 so copies < dim are bit-identical to the historical roll-only
    transform."""
    import hashlib

    if block == 0:
        return [1.0] * dim
    return [
        1.0 if int(hashlib.md5(f"sgn{block}d{i}".encode())
                   .hexdigest()[:15], 16) & 1 else -1.0
        for i in range(dim)
    ]


def _write_embeddings(spark, src: str, out: str) -> None:
    """Copy c = roll by ``c % dim`` composed with the block-``c // dim``
    sign pattern: norm-preserving, deterministic, and decorrelated for
    ANY copy count (a bare roll repeats identically at c = dim, which
    would plant exact-duplicate vectors and turn every pair query
    quadratic in copies rather than linear in rows)."""
    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    v_off = emb.agg(F.max("vec_id")).first()[0] + 1
    dim = emb.select(F.size("embedding")).first()[0]
    parts = [emb]
    for c in range(1, COPIES):
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
    u.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    print(f"# embeddings: x{COPIES} (roll c%dim + sign-block c//dim, "
          f"dim={dim})")


if __name__ == "__main__":
    main()
