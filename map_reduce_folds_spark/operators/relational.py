"""Relational gap-fill operators (SURVEY §2.7 GAP rows).

The reference has no joins, sorts, limits, set ops, or grouping sets — its
surface is the map-reduce fold only.  A user switching from the reference
still needs these around the fold algebra, so they are first-class here.

Everything is declarative DataFrame API so Catalyst plans it; the helpers
add the scale-affecting choices (broadcast hints, co-partitioning, tie-broken
top-k) that a 100 TB run needs but the naive call sites forget.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Join with an explicit broadcast knob.

    ``how`` ∈ inner/left/right/full/semi (left_semi)/anti (left_anti)/cross.
    At scale: broadcast every dimension-sized right side — a broadcast hash
    join is shuffle-free on the fact side; a shuffle join on 100 TB of
    lineitem is the single most expensive mistake available.  AQE will also
    auto-broadcast below the threshold, but being explicit survives stale
    stats.
    """
    aliases = {"semi": "left_semi", "anti": "left_anti"}
    how = aliases.get(how, how)
    if broadcast_right:
        right = F.broadcast(right)
    return left.join(right, on=on, how=how)


def topk(df: DataFrame, order_by: Sequence[Column | str], k: int) -> DataFrame:
    """Global top-k.

    Catalyst compiles orderBy+limit to TakeOrderedAndProject: each partition
    keeps k rows, the driver merges — no full sort, no single-node shuffle.
    Always pass a total order (include a unique tie-break column) or the
    result set at the boundary is nondeterministic.
    """
    return df.orderBy(*order_by).limit(k)


def topk_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """Per-group top-k via row_number window (SURVEY §2.7 'sorts/limits').

    One shuffle on ``keys``; skewed groups are bounded because row_number
    short-circuits nothing — for heavily skewed keys prefer pre-aggregation
    or AQE skew handling.  Tie-break responsibility is the caller's, as in
    :func:`topk`.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def distinct(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Exact distinct — hash aggregation with map-side partial dedup."""
    return df.select(*cols).distinct() if cols else df.distinct()


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b)


def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b).distinct()


def intersect(a: DataFrame, b: DataFrame, all: bool = False) -> DataFrame:
    return a.intersectAll(b) if all else a.intersect(b)


def except_(a: DataFrame, b: DataFrame, all: bool = False) -> DataFrame:
    return a.exceptAll(b) if all else a.subtract(b)


def rollup_agg(df: DataFrame, keys: Sequence[str], aggs: dict[str, Column]) -> DataFrame:
    """GROUP BY ROLLUP — hierarchical subtotals in one pass (Spark expands
    to a single Expand+Aggregate, not N jobs)."""
    return df.rollup(*keys).agg(*[c.alias(n) for n, c in aggs.items()])


def cube_agg(df: DataFrame, keys: Sequence[str], aggs: dict[str, Column]) -> DataFrame:
    """GROUP BY CUBE — all 2^k subtotal combinations, one Expand+Aggregate."""
    return df.cube(*keys).agg(*[c.alias(n) for n, c in aggs.items()])


def grouping_sets_agg(
    df: DataFrame, sets: Sequence[Sequence[str]], keys: Sequence[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """Explicit GROUPING SETS via the groupingSets API."""
    gs = [[F.col(c) for c in s] for s in sets]
    return df.groupingSets(gs, *[F.col(k) for k in keys]).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    direction: str = "backward",
    strategy: str = "merge",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_time <= left_time`` (backward) or earliest with ``>=`` (forward),
    per ``on`` key.  Output = left columns + ``__rt`` (the matched right
    time) + the right payload columns (null when no row qualifies).

    Two physical strategies, same semantics:

    - ``merge`` (default) — the scale path.  Tag both sides, union, and run
      ``last(payload, ignorenulls=True)`` over a running window partitioned
      by the key and ordered by (time, side).  ONE shuffle on the key, a
      sort, zero fan-out: cost is O(n log n) per key regardless of how wide
      the time range is.  This is the sort-merge as-of of kdb/pandas
      ``merge_asof``, expressed as Catalyst window aggregation.  Caveat: a
      pathologically hot key serializes into one partition's sort (same
      skew profile as any per-key window; pre-split by a coarse time bucket
      if a single key exceeds a partition).
    - ``range`` — conditional join + per-left-row dedup.  Fan-out is
      unbounded for wide time ranges (every left row pairs with EVERY
      earlier right row before dedup), so use it only when one side is
      broadcast-small or the join is tolerance-bounded upstream.
    """
    if strategy == "range":
        return _asof_range(left, right, on, left_time, right_time, direction)
    payload = [c for c in right.columns if c not in (on, right_time)]
    # the match travels as ONE struct so a single running `last` fills the
    # matched time and every payload column together (a right row whose
    # payload columns are legitimately null is still a non-null struct)
    match = F.struct(F.col(right_time).alias("__rt"),
                     *[F.col(c) for c in payload])
    r = (
        right.filter(F.col(right_time).isNotNull())
        .select(F.col(on), F.col(right_time).alias("__t"),
                F.lit(0).alias("__side"), match.alias("__m"))
    )
    l = left.withColumns({"__t": F.col(left_time), "__side": F.lit(1)})
    u = l.unionByName(r, allowMissingColumns=True)  # missing cols -> null
    if direction == "backward":
        order = [F.col("__t").asc_nulls_first(), F.col("__side").asc()]
    else:
        order = [F.col("__t").desc_nulls_first(), F.col("__side").asc()]
    w = (
        Window.partitionBy(on).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # side ordering puts the right row FIRST at equal times, making the
    # comparison inclusive (<= / >=) exactly like the range form
    filled = F.when(
        F.col(on).isNotNull() & F.col("__t").isNotNull(),
        F.last("__m", ignorenulls=True).over(w),
    )
    return (
        u.withColumn("__m", filled)
        .filter(F.col("__side") == 1)
        .select(*left.columns, F.col("__m.__rt").alias("__rt"),
                *[F.col(f"__m.{c}").alias(c) for c in payload])
    )


def _asof_range(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    direction: str,
) -> DataFrame:
    """Conditional-join as-of (see :func:`asof_join` ``strategy="range"``)."""
    # a generated row id is the dedup identity: partitioning the window by
    # *left.columns would (a) shuffle on the whole row — fragile for wide
    # rows — and (b) silently merge fully-identical left rows, dropping one
    lid = left.withColumn("__lid", F.monotonically_increasing_id())
    r = right.select(
        F.col(on).alias("__k"), F.col(right_time).alias("__rt"),
        *[c for c in right.columns if c not in (on, right_time)],
    )
    if direction == "backward":
        cond = (F.col(on) == F.col("__k")) & (F.col("__rt") <= F.col(left_time))
        order = F.col("__rt").desc()
    else:
        cond = (F.col(on) == F.col("__k")) & (F.col("__rt") >= F.col(left_time))
        order = F.col("__rt").asc()
    joined = lid.join(r, cond, "left")
    w = Window.partitionBy("__lid").orderBy(order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__k", "__lid")
    )
