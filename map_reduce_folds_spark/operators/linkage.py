"""Blocked record linkage (entity resolution) — approximate string-match
pairs without an all-pairs comparison.

Reference analog: none (the reference's fold algebra, Core.hs/Simple.hs,
has no string-similarity join); this is north-star curation surface: the
"same customer typed their name twice" / "same title, different feed"
resolution step of a data-integration pipeline.

The classic two-stage shape (Fellegi–Sunter style blocking, public
literature): (1) BLOCK on cheap deterministic keys so candidate pairs
form only within blocks; (2) score candidates with an exact edit-distance
predicate.  Both Spark and DuckDB implement Levenshtein distance with
the standard unit-cost dynamic program, so the match set is engine-exact
and oracle-checkable.

100 TB discipline: the candidate count is Σ_b |block_b|², so one hot
block (NULL keys, a default value) silently turns the join quadratic —
the same hazard as the dedup shingle index.  ``block_cap`` therefore
REFUSES oversized blocks by default (refuse-loudly, like the pagerank
weight cap): pick finer blocking keys (add a prefix/phonetic column)
rather than letting one block dominate the stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    block_cols: list[str],
    max_dist: int = 2,
    block_cap: int | None = 10_000,
) -> DataFrame:
    """Candidate match pairs ``(block…, id_a, id_b, dist)``: all row pairs
    sharing every ``block_cols`` value whose ``str_col`` Levenshtein
    distance is ≤ ``max_dist``; ``id_a < id_b`` canonical orientation.

    One self-join shuffled on the block keys (never a cartesian — the
    equi-join on blocks is the join key), distance computed JVM-side
    (``F.levenshtein``).  Rows with a NULL block key or NULL string are
    excluded up front: NULL keys would all collect into one block (the
    hot-block hazard), and a NULL string has no distance.

    ``block_cap``: raises if any block exceeds it (a count over the
    block-key aggregation — map-side-combinable, one cheap pass) —
    Σ|block|² is the stage's cost, so an oversized block is a plan error
    to fix with finer keys, not a thing to silently grind through.  Pass
    ``None`` to skip the check when the blocking is known-bounded."""
    if not block_cols:
        raise ValueError(
            "blocked_levenshtein_pairs: block_cols must be non-empty — "
            "an empty blocking key is the all-pairs cartesian this "
            "operator exists to avoid")
    src = df.select(
        F.col(id_col), F.col(str_col), *[F.col(c) for c in block_cols]
    ).where(F.col(str_col).isNotNull())
    for c in block_cols:
        src = src.where(F.col(c).isNotNull())
    if block_cap is not None:
        over = (
            src.groupBy(*block_cols).agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > block_cap)
            .limit(1).collect()
        )
        if over:
            r = over[0]
            keys = {c: r[c] for c in block_cols}
            raise ValueError(
                f"blocked_levenshtein_pairs: block {keys} has {r['n']} rows "
                f"(> block_cap={block_cap}) — candidate pairs grow with "
                "block size squared; use finer blocking keys (or raise "
                "block_cap deliberately)")
    a = src.alias("a")
    b = src.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    # banded DP: the threshold form costs O(max_dist·n) per pair instead
    # of the full O(n²) matrix and returns -1 past the bound — measured
    # 24 s → ~4 s on the 4.5M-pair sf0.1 block join.  For kept pairs the
    # value equals the true distance, so the histogram is unchanged.
    dist = F.levenshtein(F.col(f"a.{str_col}"), F.col(f"b.{str_col}"),
                         int(max_dist))
    return (
        a.join(b, cond)
        .where(dist >= F.lit(0))
        .select(*[F.col(f"a.{c}").alias(c) for c in block_cols],
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                dist.cast("int").alias("dist"))
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    bucket: Column,
    window: int = 3,
) -> DataFrame:
    """Sorted-Neighborhood blocking (Hernández & Stolfo 1995): sort the
    relation by ``key_col`` and emit every pair within ``window``
    positions of each other — the classic entity-resolution alternative
    to equi-blocking (``blocked_levenshtein_pairs``): an equi-block
    misses matches that straddle block boundaries; the sliding sort
    window catches near-misses wherever they sort adjacently.  Candidate
    volume is EXACTLY (window−1)·n — linear by construction, never a
    block-size quadratic.

    No global-ORDER-BY window (the package lint forbids the single-task
    sort): global positions come from the distributed decomposition —
    rank within ``bucket`` (caller-supplied, must be ORDER-PRESERVING
    w.r.t. ``key_col``: bucket a < bucket b ⇒ every key in a sorts
    before every key in b) plus the exclusive prefix sum of bucket
    counts (``windows.exclusive_bucket_offsets``, lazily assembled and
    broadcast back).  Pairs then form by an EQUI-join on
    ``pos = pos + d`` for d ∈ 1..window−1 (an explode, not a range
    join).  Output: (id_a, key_a, id_b, key_b, dist) where dist is the
    positional distance."""
    from pyspark.sql.window import Window as W_

    from .windows import exclusive_bucket_offsets

    w_in = W_.partitionBy("__b").orderBy(key_col, id_col)
    ranked = df.select(
        F.col(id_col), F.col(key_col), bucket.alias("__b"),
        ).withColumn("__r", F.row_number().over(w_in))
    totals = ranked.groupBy("__b").agg(F.count(F.lit(1)).alias("__t"))
    offs = exclusive_bucket_offsets(totals)
    pos = ranked.join(F.broadcast(offs), "__b").select(
        id_col, key_col, (F.col("__r") + F.col("__off")).alias("__p"))
    # the join key must be computable from ONE side: `left.p + right.d ==
    # right.p` mixes sides and degrades to a CartesianProduct (measured
    # 38 s vs 2 s on 15k rows) — fold the offset into the right side so
    # the condition is a pure equi-key
    right = pos.select(
        F.col(id_col).alias("id_b"), F.col(key_col).alias("key_b"),
        F.explode(F.sequence(
            F.lit(1), F.lit(int(window) - 1))).alias("__d"),
        F.col("__p").alias("__pb")
    ).withColumn("__pa", F.col("__pb") - F.col("__d"))
    return (
        pos.select(F.col(id_col).alias("id_a"),
                   F.col(key_col).alias("key_a"),
                   F.col("__p").alias("__pa"))
        .join(right, "__pa")
        .select("id_a", "key_a", "id_b", "key_b",
                F.col("__d").cast("int").alias("dist"))
    )
