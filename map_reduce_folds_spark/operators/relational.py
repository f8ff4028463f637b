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

from ..timeutil import epoch_seconds


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
    pre_split: int | None = None,
) -> DataFrame:
    """Per-group top-k via row_number window (SURVEY §2.7 'sorts/limits').

    One shuffle on ``keys``; a pathologically hot key serializes its whole
    group into one partition's sort.  ``pre_split=s`` is the skew escape
    hatch (two-level tournament): rows are first ranked within
    (key, hash(row)%s) — the hot key's sort spreads over ``s``
    partitions — and only each sub-group's top-k (≤ s·k rows per key)
    advances to the final per-key ranking.  Requires ``order_by`` to be a
    TOTAL order (a non-deterministic tie-break could otherwise select a
    different-but-equally-ranked row set than the single-pass form; with a
    total order the result is identical — property-tested on 50%-skew
    data).  Tie-break responsibility is the caller's, as in :func:`topk`.
    """
    if pre_split is not None and pre_split > 1:
        salt = F.pmod(F.xxhash64(*df.columns), F.lit(pre_split))
        w1 = Window.partitionBy(*keys, "__salt").orderBy(*order_by)
        survivors = (
            df.withColumn("__salt", salt)
            .withColumn("__r1", F.row_number().over(w1))
            .filter(F.col("__r1") <= k)
            .drop("__salt", "__r1")
        )
        df = survivors
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
    on: str | Sequence[str],
    left_time: str,
    right_time: str,
    direction: str = "backward",
    strategy: str = "merge",
    hot_key_bucket: float | None = None,
    tolerance: float | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_time <= left_time`` (backward), earliest with ``>=`` (forward),
    or smallest absolute distance with backward tie-break (nearest — the
    full pandas ``merge_asof`` direction set), per ``on`` key (a column
    name or a list — multi-key as-of, ``merge_asof(by=[...])`` parity).
    Output = left columns + ``__rt`` (the matched right time) + the right
    payload columns (null when no row qualifies).

    ``tolerance`` — maximum allowed time distance (pandas merge_asof
    parity): a match farther than this from the left time (in the time
    column's own units; SECONDS for timestamps) comes back null.  In the
    ``range`` strategy the bound ALSO prunes the conditional join's
    fan-out; in ``merge`` it nulls out-of-range matches post-fill (same
    results, property-tested).

    Two physical strategies, same semantics:

    - ``merge`` (default) — the scale path.  Tag both sides, union, and run
      ``last(payload, ignorenulls=True)`` over a running window partitioned
      by the key and ordered by (time, side).  ONE shuffle on the key, a
      sort, zero fan-out: cost is O(n log n) per key regardless of how wide
      the time range is.  This is the sort-merge as-of of kdb/pandas
      ``merge_asof``, expressed as Catalyst window aggregation.  Caveat: a
      pathologically hot key serializes into one partition's sort — pass
      ``hot_key_bucket`` to pre-split it (below).
    - ``range`` — conditional join + per-left-row dedup.  Fan-out is
      unbounded for wide time ranges (every left row pairs with EVERY
      earlier right row before dedup), so use it only when one side is
      broadcast-small or the join is tolerance-bounded upstream.

    ``hot_key_bucket`` (merge only) — the skew escape hatch.  A width in
    the time column's own units (seconds for timestamps, plain numbers for
    numeric times): rows are additionally partitioned by
    ``floor(time / width)``, the running ``last`` runs per (key, bucket) —
    so a key holding 50% of all rows spreads over time-range/width window
    partitions instead of serializing into one — and the cross-bucket
    carry is stitched with a per-(key, bucket) summary table that is
    smaller than the data by the average bucket occupancy.  Exact same
    results as the unsplit form (property-tested on skewed data).  Cost:
    one extra shuffle of the summary table; use only when a key is hot
    enough to overflow a partition.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if direction == "nearest":
        return _asof_nearest(left, right, keys, left_time, right_time,
                             strategy, hot_key_bucket, tolerance)
    if strategy == "range":
        if hot_key_bucket is not None:
            raise ValueError("hot_key_bucket applies to strategy='merge' only")
        return _asof_range(left, right, keys, left_time, right_time,
                           direction, tolerance)
    payload = [c for c in right.columns if c not in (*keys, right_time)]
    # the match travels as ONE struct so a single running `last` fills the
    # matched time and every payload column together (a right row whose
    # payload columns are legitimately null is still a non-null struct)
    match = F.struct(F.col(right_time).alias("__rt"),
                     *[F.col(c) for c in payload])
    r = (
        right.filter(F.col(right_time).isNotNull())
        .select(*[F.col(k) for k in keys], F.col(right_time).alias("__t"),
                F.lit(0).alias("__side"), match.alias("__m"))
    )
    l = left.withColumns({"__t": F.col(left_time), "__side": F.lit(1)})
    u = l.unionByName(r, allowMissingColumns=True)  # missing cols -> null
    if direction == "backward":
        order = [F.col("__t").asc_nulls_first(), F.col("__side").asc()]
    else:
        order = [F.col("__t").desc_nulls_first(), F.col("__side").asc()]
    if hot_key_bucket is not None:
        return _asof_merge_split(u, keys, order, payload, left.columns,
                                 direction, hot_key_bucket, tolerance)
    w = (
        Window.partitionBy(*keys).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # side ordering puts the right row FIRST at equal times, making the
    # comparison inclusive (<= / >=) exactly like the range form
    keys_ok = _all_not_null(keys)
    filled = F.when(
        keys_ok & F.col("__t").isNotNull(),
        F.last("__m", ignorenulls=True).over(w),
    )
    out = u.withColumn("__m", filled).filter(F.col("__side") == 1)
    out = _apply_tolerance(out, direction, tolerance)
    return out.select(*left.columns, F.col("__m.__rt").alias("__rt"),
                      *[F.col(f"__m.{c}").alias(c) for c in payload])


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_time: str,
    right_time: str,
    strategy: str,
    hot_key_bucket: float | None,
    tolerance: float | None,
) -> DataFrame:
    """direction="nearest" (pandas merge_asof parity): the right row with
    the SMALLEST absolute time distance; equal distance breaks BACKWARD
    (the earlier row), matching pandas.

    ``merge``: ONE pass over the tagged union — the backward candidate is
    the usual running ``last`` and the forward candidate a mirrored
    ``first`` over (currentRow, unboundedFollowing) with the side order
    flipped so equal-time right rows stay inclusive; the row then keeps
    whichever candidate is closer.  Same single shuffle as directional
    merge (two window sorts over one partitioning), and — deliberately —
    no generated-row-id self-join: joining two separately executed
    branches on ``monotonically_increasing_id`` can misalign if upstream
    row order is unstable between executions.

    ``range``: the per-left-row window dedup with order =
    (|Δt| asc, backward-first) over a keys-equality join; unbounded
    fan-out without ``tolerance`` (which prunes it in the join
    condition), exactly like the directional range form."""
    if hot_key_bucket is not None:
        raise ValueError(
            "hot_key_bucket is not supported with direction='nearest' "
            "(use tolerance + strategy='range', or pre-filter the hot key)")
    if strategy == "range":
        return _asof_range_nearest(left, right, keys, left_time, right_time,
                                   tolerance)
    payload = [c for c in right.columns if c not in (*keys, right_time)]
    match = F.struct(F.col(right_time).alias("__rt"),
                     *[F.col(c) for c in payload])
    r = (
        right.filter(F.col(right_time).isNotNull())
        .select(*[F.col(k) for k in keys], F.col(right_time).alias("__t"),
                F.lit(0).alias("__side"), match.alias("__m"))
    )
    l = left.withColumns({"__t": F.col(left_time), "__side": F.lit(1)})
    u = l.unionByName(r, allowMissingColumns=True)
    keys_ok = _all_not_null(keys)
    # backward: right rows sort BEFORE the left row at equal time (side 0
    # first) → running last is inclusive, as in the directional merge
    w_back = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc_nulls_first(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: flip the side order so equal-time right rows sort AFTER the
    # left row and land inside the (current, following) frame → inclusive
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc_nulls_first(), F.col("__side").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    fill_ok = keys_ok & F.col("__t").isNotNull()
    mb = F.when(fill_ok, F.last("__m", ignorenulls=True).over(w_back))
    mf = F.when(fill_ok, F.first("__m", ignorenulls=True).over(w_fwd))
    dt = dict(u.dtypes)["__t"]
    lt = _tnum(F.col("__t"), dt)
    out = (
        u.withColumn("__mb", mb).withColumn("__mf", mf)
        .filter(F.col("__side") == 1)
    )
    bdelta = lt - _tnum(F.col("__mb.__rt"), dt)
    fdelta = _tnum(F.col("__mf.__rt"), dt) - lt
    take_back = F.col("__mb").isNotNull() & (
        F.col("__mf").isNull() | (bdelta <= fdelta))
    out = out.withColumn(
        "__m", F.when(take_back, F.col("__mb")).otherwise(F.col("__mf")))
    if tolerance is not None:
        if tolerance < 0:
            raise ValueError("tolerance must be non-negative")
        chosen_delta = F.abs(lt - _tnum(F.col("__m.__rt"), dt))
        out = out.withColumn(
            "__m",
            F.when(chosen_delta <= F.lit(float(tolerance)), F.col("__m")))
    return out.select(*left.columns, F.col("__m.__rt").alias("__rt"),
                      *[F.col(f"__m.{c}").alias(c) for c in payload])


def _asof_range_nearest(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_time: str,
    right_time: str,
    tolerance: float | None,
) -> DataFrame:
    """range-strategy nearest: keys-equality join (tolerance-pruned when
    given), keep the row with min |Δt| per left row, backward on ties."""
    lid = left.withColumn("__asof_rid", F.monotonically_increasing_id())
    r = right.select(
        *[F.col(k).alias(f"__k{i}") for i, k in enumerate(keys)],
        F.col(right_time).alias("__rt"),
        *[c for c in right.columns if c not in (*keys, right_time)],
    )
    keys_eq = F.lit(True)
    for i, k in enumerate(keys):
        keys_eq = keys_eq & (F.col(k) == F.col(f"__k{i}"))
    dt = dict(right.dtypes)[right_time]
    delta = _tnum(F.col("__rt"), dt) - _tnum(F.col(left_time), dt)
    # a null left time must match nothing (the directional forms get this
    # for free from their time-comparison join predicate)
    cond = keys_eq & F.col(left_time).isNotNull()
    if tolerance is not None:
        if tolerance < 0:
            raise ValueError("tolerance must be non-negative")
        cond = cond & (F.abs(delta) <= F.lit(float(tolerance)))
    joined = lid.join(r, cond, "left")
    # min |Δ|, ties to the backward (Δ ≤ 0) side — pandas tie rule
    order = [F.abs(delta).asc(),
             F.when(delta <= 0, F.lit(0)).otherwise(F.lit(1)).asc()]
    w = Window.partitionBy("__asof_rid").orderBy(*order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", *[f"__k{i}" for i in range(len(keys))], "__asof_rid")
    )


def _all_not_null(keys: Sequence[str]) -> Column:
    cond = F.col(keys[0]).isNotNull()
    for k in keys[1:]:
        cond = cond & F.col(k).isNotNull()
    return cond


def _tnum(col: Column, dtype: str) -> Column:
    """Numeric view of a time value: epoch seconds for timestamps, the
    value itself (as double) otherwise — makes tolerance/bucket arithmetic
    unit-generic."""
    return (epoch_seconds(col) if dtype.startswith("timestamp")
            else col.cast("double"))


def _apply_tolerance(out: DataFrame, direction: str,
                     tolerance: float | None) -> DataFrame:
    """Null out matches farther than ``tolerance`` from the left time.
    Operates on the internal frame (``__t`` + matched struct ``__m``)."""
    if tolerance is None:
        return out
    if tolerance < 0:
        raise ValueError("tolerance must be non-negative")
    dt = dict(out.dtypes)["__t"]
    lt = _tnum(F.col("__t"), dt)
    rt = _tnum(F.col("__m.__rt"), dt)
    delta = (lt - rt) if direction == "backward" else (rt - lt)
    return out.withColumn(
        "__m", F.when(delta <= F.lit(float(tolerance)), F.col("__m")))


def _asof_merge_split(
    u: DataFrame,
    keys: Sequence[str],
    order: list[Column],
    payload: list[str],
    left_columns: list[str],
    direction: str,
    hot_key_bucket: float,
    tolerance: float | None = None,
) -> DataFrame:
    """Hot-key pre-split body of the merge as-of (``hot_key_bucket=``).

    Decomposition (backward; forward is the time-mirrored dual):

    1. bucket every unioned row by ``floor(time / width)`` — any
       deterministic monotonic bucketing preserves correctness, so float
       rounding at bucket edges is harmless;
    2. the running ``last(match)`` window runs per (key, bucket) — the
       hot key's sort is now parallel across its time range;
    3. per (key, bucket), the carry-out is simply the bucket's latest
       right row (``max_by(match, time)``; earliest/``min_by`` forward) —
       computed by aggregation, no window;
    4. an exclusive running ``last`` over the per-(key, bucket) summary
       rows — bounded by #distinct (key, bucket), orders of magnitude
       smaller than the data — gives each bucket its carry-in;
    5. a row's match = its local running last, else the bucket carry-in.

    The left-row fill condition and the (time, side) intra-bucket order
    are byte-identical to the unsplit form, so results match exactly.
    """
    if hot_key_bucket <= 0:
        raise ValueError("hot_key_bucket must be positive")
    backward = direction == "backward"
    # unit-generic time: timestamps bucket by epoch seconds, numerics as-is
    dt = dict(u.dtypes)["__t"]
    tnum = _tnum(F.col("__t"), dt)
    u2 = u.withColumn("__bk", F.floor(tnum / F.lit(float(hot_key_bucket))))
    w_local = (
        Window.partitionBy(*keys, "__bk").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry-out of each bucket: its last right row in scan order (right
    # rows are the only non-null __m, so max_by/min_by over them is the
    # bucket-final value the unsplit running `last` would hold)
    pick = F.max_by if backward else F.min_by
    summ = (
        u2.filter(F.col("__side") == 0)
        .groupBy(*keys, "__bk")
        .agg(pick("__m", F.col("__t")).alias("__mb"))
    )
    # carry-in per (key, bucket) actually present: exclusive running last
    # over the summary rows in bucket-scan order (≤ one row per bucket)
    bk_order = F.col("__bk").asc() if backward else F.col("__bk").desc()
    w_carry = (
        Window.partitionBy(*keys).orderBy(bk_order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        u2.select(*keys, "__bk").distinct()
        .join(summ, [*keys, "__bk"], "left")
        .withColumn("__carry", F.last("__mb", ignorenulls=True).over(w_carry))
        .select(*keys, "__bk", "__carry")
    )
    filled = F.when(
        _all_not_null(keys) & F.col("__t").isNotNull(),
        F.coalesce(F.last("__m", ignorenulls=True).over(w_local),
                   F.col("__carry")),
    )
    out = (
        u2.join(carry, [*keys, "__bk"], "left")
        .withColumn("__m", filled)
        .filter(F.col("__side") == 1)
    )
    out = _apply_tolerance(out, direction, tolerance)
    return out.select(*left_columns, F.col("__m.__rt").alias("__rt"),
                      *[F.col(f"__m.{c}").alias(c) for c in payload])


def _asof_range(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_time: str,
    right_time: str,
    direction: str,
    tolerance: float | None = None,
) -> DataFrame:
    """Conditional-join as-of (see :func:`asof_join` ``strategy="range"``).
    A ``tolerance`` bound is pushed INTO the join condition — it prunes
    fan-out, not just the result."""
    # a generated row id is the dedup identity: partitioning the window by
    # *left.columns would (a) shuffle on the whole row — fragile for wide
    # rows — and (b) silently merge fully-identical left rows, dropping one
    # "__asof_rid", not "__lid": the nearest-direction composition passes a
    # left side that already carries its own row id
    lid = left.withColumn("__asof_rid", F.monotonically_increasing_id())
    r = right.select(
        *[F.col(k).alias(f"__k{i}") for i, k in enumerate(keys)],
        F.col(right_time).alias("__rt"),
        *[c for c in right.columns if c not in (*keys, right_time)],
    )
    keys_eq = F.lit(True)
    for i, k in enumerate(keys):
        keys_eq = keys_eq & (F.col(k) == F.col(f"__k{i}"))
    if direction == "backward":
        cond = keys_eq & (F.col("__rt") <= F.col(left_time))
        order = F.col("__rt").desc()
    else:
        cond = keys_eq & (F.col("__rt") >= F.col(left_time))
        order = F.col("__rt").asc()
    if tolerance is not None:
        if tolerance < 0:
            raise ValueError("tolerance must be non-negative")
        dt = dict(right.dtypes)[right_time]
        lt, rt = _tnum(F.col(left_time), dt), _tnum(F.col("__rt"), dt)
        delta = (lt - rt) if direction == "backward" else (rt - lt)
        cond = cond & (delta <= F.lit(float(tolerance)))
    joined = lid.join(r, cond, "left")
    w = Window.partitionBy("__asof_rid").orderBy(order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", *[f"__k{i}" for i in range(len(keys))], "__asof_rid")
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    on: str | Sequence[str] | None = None,
    how: str = "inner",
    bucket_width: float | None = None,
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Point-in-interval join: each point row pairs with every interval
    row whose ``[start_col, end_col]`` (inclusive) contains its
    ``point_col`` — with equal values on the optional equi-keys ``on``.
    The companion of :func:`asof_join` in the temporal-join family
    (reference analog: none — SURVEY §2.7 GAP rows): attribution windows,
    maintenance/outage periods, validity ranges.

    Strategies (same split as ``asof_join``'s merge/range):

    * ``bucket_width=w`` — the 100 TB path.  Every interval EXPLODES to
      the ⌈len/w⌉+1 width-``w`` buckets it overlaps; each point belongs
      to exactly ONE bucket, so the bucket equi-join meets every matching
      pair exactly once (no dedup step) and never builds the cartesian
      product a raw theta-join would.  Shuffle is on (keys…, bucket) —
      a hot key spreads over its time range.  Pick ``w`` near the median
      interval length: too small multiplies interval rows (len/w
      replicas), too large piles unrelated points into each bucket's
      verify.  For timestamp columns ``w`` is in SECONDS; for numeric
      columns it is in the column's own units.
    * ``broadcast_intervals=True`` — dimension-sized interval tables:
      broadcast hash join on the equi-keys (or nested-loop when no keys),
      range predicate evaluated stream-side.  No shuffle at all.
    * neither — plain join with the range predicate; Catalyst extracts
      the equi-keys into a shuffle hash join.  Fine when per-key fan-out
      is modest; prefer ``bucket_width`` at scale.

    Timestamp columns of either flavor (TIMESTAMP / TIMESTAMP_NTZ) are
    compared on exact ``epoch_us`` bigints (timeutil contract).
    ``how`` ∈ inner/left — left keeps unmatched points with null interval
    columns.  Column names must be disjoint apart from the ``on`` keys
    (asserted), and key columns are emitted once.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner or left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on or [])
    clash = [
        c for c in intervals.columns if c in points.columns and c not in keys
    ]
    if clash:
        raise ValueError(
            f"interval_join: column collision {clash} — rename before joining")

    def _num(df: DataFrame, col: str) -> Column:
        from ..timeutil import epoch_us

        return (epoch_us(F.col(col))
                if "timestamp" in dict(df.dtypes)[col] else F.col(col))

    p, i = points, intervals
    pnum = _num(p, point_col)
    snum, enum = _num(i, start_col), _num(i, end_col)
    if bucket_width is not None:
        w = bucket_width
        if "timestamp" in dict(p.dtypes)[point_col]:
            w = w * 1_000_000  # seconds → the epoch_us bucket axis
        p = p.withColumn("__pb", F.floor(pnum / F.lit(w)))
        i = i.withColumn(
            "__ib",
            F.explode(F.sequence(F.floor(snum / F.lit(w)),
                                 F.floor(enum / F.lit(w)))),
        )
        cond = F.col("__pb") == F.col("__ib")
    else:
        cond = F.lit(True)
        if broadcast_intervals:
            i = F.broadcast(i)
    for k in keys:
        cond = cond & (p[k] == i[k])  # SQL join semantics: nulls don't match
    # the containment check re-derives the numeric forms against the
    # (possibly bucket-augmented) frames so it resolves unambiguously
    cond = cond & _num(p, point_col).between(_num(i, start_col),
                                             _num(i, end_col))
    out = p.join(i, cond, how)
    drop = [c for c in ("__pb", "__ib") if c in out.columns]
    # emit each equi-key once (the points side; identical by the condition)
    return out.drop(*[i[k] for k in keys]).drop(*drop)


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: str | Sequence[str] | None = None,
    how: str = "inner",
    bucket_width: float | None = None,
    broadcast_right: bool = False,
) -> DataFrame:
    """Interval-overlap join: pairs whose CLOSED ranges intersect
    (``l.start ≤ r.end AND r.start ≤ l.end``), optionally per equi-key.
    Completes the temporal-join family (asof = nearest event,
    interval_join = point containment, this = range intersection):
    sessions × outages, validity-range reconciliation, conflict detection.

    ``bucket_width=w`` is the scale path: BOTH sides explode to the
    width-``w`` buckets they cover, and a pair is emitted only from its
    FIRST shared bucket — the one holding ``max(l.start, r.start)``,
    expressed as ``bucket == greatest(floor(ls/w), floor(rs/w))`` (floor
    commutes with max) — so every overlapping pair is met EXACTLY once
    and no dedup shuffle is needed.  Same width guidance as
    :func:`interval_join`; timestamps bucket and compare on exact
    epoch_us (``w`` in seconds).

    ``how="left"`` (keep unmatched left intervals) is supported on the
    plain/broadcast strategies only: under bucketing BOTH sides explode,
    so a left replica in a non-matching bucket would surface as a
    spurious null row — to keep unmatched intervals at scale, run the
    bucketized inner form and anti-join on your interval id."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner or left, got {how!r}")
    if how == "left" and bucket_width is not None:
        raise ValueError(
            "overlap_join: how='left' is unsound with bucket_width (left "
            "side explodes into per-bucket replicas) — use the plain/"
            "broadcast strategy, or bucketized inner + anti-join on an id")
    keys = [on] if isinstance(on, str) else list(on or [])
    clash = [c for c in right.columns if c in left.columns and c not in keys]
    if clash:
        raise ValueError(
            f"overlap_join: column collision {clash} — rename before joining")

    def _num(df: DataFrame, col: str) -> Column:
        from ..timeutil import epoch_us

        return (epoch_us(F.col(col))
                if "timestamp" in dict(df.dtypes)[col] else F.col(col))

    lf, rt = left, right
    if bucket_width is not None:
        w = bucket_width
        if "timestamp" in dict(lf.dtypes)[left_start]:
            w = w * 1_000_000
        lf = lf.withColumn("__lsb", F.floor(_num(lf, left_start) / F.lit(w))) \
               .withColumn("__lb", F.explode(F.sequence(
                   F.col("__lsb"), F.floor(_num(lf, left_end) / F.lit(w)))))
        rt = rt.withColumn("__rsb", F.floor(_num(rt, right_start) / F.lit(w))) \
               .withColumn("__rb", F.explode(F.sequence(
                   F.col("__rsb"), F.floor(_num(rt, right_end) / F.lit(w)))))
        cond = (F.col("__lb") == F.col("__rb")) & (
            F.col("__lb") == F.greatest(F.col("__lsb"), F.col("__rsb")))
    else:
        cond = F.lit(True)
        if broadcast_right:
            rt = F.broadcast(rt)
    for k in keys:
        cond = cond & (lf[k] == rt[k])
    cond = cond & (_num(lf, left_start) <= _num(rt, right_end)) \
        & (_num(rt, right_start) <= _num(lf, left_end))
    out = lf.join(rt, cond, how)
    drop = [c for c in ("__lsb", "__lb", "__rsb", "__rb")
            if c in out.columns]
    return out.drop(*[rt[k] for k in keys]).drop(*drop)


def mode_per_group(
    df: DataFrame,
    keys: Sequence[str],
    val_col: str,
    out_col: str = "mode",
) -> DataFrame:
    """DETERMINISTIC most-frequent value per group: ties break to the
    smallest value, unlike Spark's ``F.mode`` (and DuckDB's ``mode()``),
    whose tie winner is implementation/partitioning-dependent — which is
    exactly what a differential gate cannot accept.  Output:
    ``(keys…, <out_col>, mode_count)``.

    Two map-side-combinable aggregations, no window: value counts, then
    a min over the ``(-count, value)`` struct (lexicographic struct
    ordering = count desc, value asc) — the same argmax-by-struct trick
    as ``exact_dedup_keep_first``.  Hot groups cost one combiner row per
    distinct value, never a sort.

    NULL values are EXCLUDED from mode candidacy (standard SQL ``mode()``
    semantics, and required for determinism: Spark's struct-min sorts a
    NULL field smallest while the DuckDB mirror's ``ORDER BY n DESC,
    value`` sorts NULLs last, so a NULL winning a tie would diverge
    between engines).  A group whose values are all NULL emits no row."""
    counts = (df.where(F.col(val_col).isNotNull())
              .groupBy(*keys, val_col).agg(F.count(F.lit(1)).alias("__n")))
    pick = F.min(F.struct(
        (-F.col("__n")).alias("nn"), F.col(val_col).alias("v"),
    )).alias("__m")
    return counts.groupBy(*keys).agg(pick).select(
        *keys, F.col("__m.v").alias(out_col),
        (-F.col("__m.nn")).cast("bigint").alias("mode_count"),
    )


def association_rules(
    df: DataFrame,
    key: str,
    item: str,
    min_pair_count: int = 1,
) -> DataFrame:
    """Market-basket association rules A → B over per-key item sets
    (Agrawal–Srikant support/confidence/lift, pair rules): which items
    co-occur in the same basket more than independence predicts.  Here a
    "basket" is the DISTINCT item set of one key.

    Plan: distinct (key, item) once; item frequencies and the basket
    total are two map-side-combinable aggregations; co-occurrence counts
    come from ONE self-equi-join on the key — per-basket fan-out is
    |basket|², bounded by the item VOCABULARY, never by event volume
    (events collapse in the distinct).  Frequency relations are
    vocabulary-sized → broadcast joins; the total rides a 1-row cross
    join, never a collect.

    Numeric policy: all counts are exact bigints; each measure is ONE
    division of exact integers (lift's numerator/denominator are bigint
    PRODUCTS — n_ab·N and n_a·n_b — before the single divide), so every
    double is bitwise-identical in any engine.

    Output: (ante, cons, n_ab, n_a, n_b, n_keys, support, confidence,
    lift) for ordered pairs ante ≠ cons with n_ab ≥ min_pair_count."""
    items = df.select(key, item).distinct()
    freq = items.groupBy(item).agg(F.count(F.lit(1)).alias("__nf"))
    total = items.select(
        F.count_distinct(F.col(key)).alias("__nk"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(b, (F.col(f"a.{key}") == F.col(f"b.{key}"))
               & (F.col(f"a.{item}") != F.col(f"b.{item}")))
        .groupBy(F.col(f"a.{item}").alias("ante"),
                 F.col(f"b.{item}").alias("cons"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= int(min_pair_count))
    )
    na = F.broadcast(freq.select(F.col(item).alias("ante"),
                                 F.col("__nf").alias("n_a")))
    nb = F.broadcast(freq.select(F.col(item).alias("cons"),
                                 F.col("__nf").alias("n_b")))
    d_ = lambda c: c.cast("double")  # noqa: E731
    return (
        pairs.join(na, "ante").join(nb, "cons")
        .crossJoin(F.broadcast(total))
        .select(
            "ante", "cons", "n_ab", "n_a", "n_b",
            F.col("__nk").alias("n_keys"),
            (d_(F.col("n_ab")) / F.col("__nk")).alias("support"),
            (d_(F.col("n_ab")) / F.col("n_a")).alias("confidence"),
            (d_(F.col("n_ab") * F.col("__nk"))
             / (F.col("n_a") * F.col("n_b"))).alias("lift"),
        )
    )


def incremental_agg_merge(
    state: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str | None]],
) -> DataFrame:
    """Materialized-aggregate MAINTENANCE: merge a batch of NEW rows into
    a stored per-key aggregate state WITHOUT rescanning the base table —
    the incremental-view-maintenance core (Delta/streaming "merge new
    partial aggregates into state").  ``aggs`` maps output column →
    (fn, col) with fn ∈ {count, sum, min, max} — the algebraic
    aggregates whose partial states merge losslessly: counts and sums
    ADD, min/max take least/greatest.  (avg = sum/count at read time;
    retractions need either retractable functions only — count/sum — or
    a rescan of the touched keys: this operator handles INSERTS.)

    ``state`` must carry exactly ``keys + aggs.keys()`` (the output of a
    previous full aggregation or a previous merge — the operation is
    associative, so chains of merges equal one recompute;
    oracle-verified by the registered query).  Plan: one partial
    aggregation over the delta (shuffles ONLY the batch), one full-outer
    merge join on the key — the stored state is read once and never
    sorted.  NULL discipline: a sum over an all-NULL group is NULL, and
    merging NULL with NULL must stay NULL (not 0) — the coalesce guards
    mirror ``running_keyed``'s."""
    fns = {"sum": F.sum, "count": None, "min": F.min, "max": F.max}
    for name, (fn, _c) in aggs.items():
        if fn not in fns:
            raise ValueError(f"{name}: fn must be one of {sorted(fns)}")
    missing = [c for c in [*keys, *aggs] if c not in state.columns]
    if missing:
        raise ValueError(f"state is missing columns {missing}")

    def agg_expr(fn: str, col: str | None) -> Column:
        if fn == "count":
            return F.count(F.lit(1) if col is None else F.col(col))
        return fns[fn](col)

    d = delta.groupBy(*keys).agg(
        *[agg_expr(fn, col).alias(f"__d_{name}")
          for name, (fn, col) in aggs.items()])
    # full-outer NULL-SAFE merge join: eqNullSafe so a NULL-key group is
    # one group on both sides, and the output key COALESCES across sides
    # (a right-only key must survive — windows._join_null_safe drops the
    # right key, which silently nulls delta-only keys under "full")
    for k in keys:
        d = d.withColumnRenamed(k, f"__dk_{k}")
    cond = F.lit(True)
    for k in keys:
        cond = cond & F.col(k).eqNullSafe(F.col(f"__dk_{k}"))
    merged = state.select(
        *keys, *[F.col(n).alias(f"__s_{n}") for n in aggs]
    ).join(d, cond, "full")
    out_cols = [F.coalesce(F.col(k), F.col(f"__dk_{k}")).alias(k)
                for k in keys]
    for name, (fn, _c) in aggs.items():
        s, n = F.col(f"__s_{name}"), F.col(f"__d_{name}")
        if fn in ("sum", "count"):
            merged_val = F.when(s.isNull() & n.isNull(), F.lit(None)) \
                .otherwise(F.coalesce(s, F.lit(0)) + F.coalesce(n, F.lit(0)))
        elif fn == "min":
            merged_val = F.least(s, n)
        else:
            merged_val = F.greatest(s, n)
        out_cols.append(merged_val.alias(name))
    return merged.select(*out_cols)


def nearest_event_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    on: Sequence[str],
    tolerance_us: int,
    left_id: str,
    right_id: str,
) -> DataFrame:
    """NEAREST-neighbor temporal join: each left row pairs with the ONE
    right row (same equi-keys) closest in time — BOTH directions, unlike
    :func:`asof_join`'s backward-only look — within ``tolerance_us``.
    The sensor-alignment / feature-attachment join: "the closest reading
    to each observation, max 30 min apart".

    Candidate generation is the bucket trick: bucket = ⌊t/tol⌋; the
    right side explodes to its bucket ± 1 (三 rows), so every pair with
    |Δt| ≤ tol co-buckets at least once and the join is a pure equi-join
    on (keys…, bucket) — never a theta/cartesian, and a hot key spreads
    over its time range.  Duplicate candidate meetings (a pair can
    co-bucket twice) collapse in the arg-min itself.  The winner per
    left row is a deterministic min over ``(|Δt|, right ts, right id)``
    structs — ties break to the EARLIER right row, then smaller id.

    Output: (keys…, ``left_id``, ``right_id``, ``diff_us``), inner
    (unmatched left rows drop; left-outer is one extra join upstream if
    needed)."""
    from ..timeutil import epoch_us

    keys = list(on)
    tol = int(tolerance_us)
    if tol <= 0:
        raise ValueError(f"tolerance_us must be > 0, got {tolerance_us!r}")
    lt, rt = epoch_us(F.col(left_ts)), epoch_us(F.col(right_ts))
    l_ = left.select(*keys, F.col(left_id).alias("__lid"),
                     lt.alias("__lt"),
                     F.floor(lt / F.lit(tol)).alias("__b"))
    r_ = right.select(*keys, F.col(right_id).alias("__rid"),
                      rt.alias("__rt"),
                      F.explode(F.sequence(
                          F.floor(rt / F.lit(tol)) - 1,
                          F.floor(rt / F.lit(tol)) + 1)).alias("__b"))
    cand = (
        l_.join(r_, [*keys, "__b"])
        .where(F.abs(F.col("__lt") - F.col("__rt")) <= tol)
    )
    pick = F.min(F.struct(
        F.abs(F.col("__lt") - F.col("__rt")).alias("d"),
        F.col("__rt").alias("t"),
        F.col("__rid").alias("e"))).alias("__m")
    return (
        cand.groupBy(*keys, "__lid").agg(pick)
        .select(*keys,
                F.col("__lid").alias(left_id),
                F.col("__m.e").alias(right_id),
                F.col("__m.d").cast("bigint").alias("diff_us"))
    )


def ols2_fit(
    df: DataFrame,
    y_col: str,
    x1_col: str,
    x2_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Closed-form TWO-REGRESSOR least squares per group —
    ``y = b0 + b1·x1 + b2·x2`` solved from the normal equations over
    EXACT integer moments (the multiple-regression upgrade of the
    trend_per_user slope): one scan accumulates the nine sums
    (n, Σx1, Σx2, Σy, Σx1², Σx1x2, Σx2², Σx1y, Σx2y) with per-row
    integer products staged to DECIMAL(38,0) (the HHI/skewness
    discipline — Σy² cross terms overflow int64), then the centered
    2×2 system solves in fixed-parenthesization doubles:

        S11 = n·Σx1² − Σx1²  …  det = S11·S22 − S12·S12
        b1 = (S22·S1y − S12·S2y)/det,  b2 = (S11·S2y − S12·S1y)/det
        b0 = (Σy − b1·Σx1 − b2·Σx2)/n
        r² = (b1·S1y + b2·S2y)/SST,   SST = n·Σy² − Σy²

    Every exact integer casts to double ONCE (correctly rounded in any
    engine) and every subsequent op is a single IEEE step in pinned
    order — bitwise-portable; outputs round to 9 decimals (house
    policy).  Distributed training of a linear model with NO iteration
    and NO driver math beyond the plan: the moments are map-side
    combinable, the solve is a projection.  Inputs must be INTEGER
    columns (fixed-point upstream — cents, counts, basis points).
    Collinear / degenerate groups (det ≤ 0 in exact arithmetic) are
    excluded rather than emitting NaN/Inf.

    Output: ``(*group_cols, n, b0, b1, b2, r2)``."""
    y, x1, x2 = F.col(y_col), F.col(x1_col), F.col(x2_col)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    # operands cast to DECIMAL BEFORE multiplying (the HHI/skewness
    # staging): an int64 per-row product like y·y wraps silently at
    # |y| ≥ ~3.04e9 with ANSI off, diverging from the HUGEINT mirror
    s = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec(x1)).alias("sx1"),
        F.sum(dec(x2)).alias("sx2"),
        F.sum(dec(y)).alias("sy"),
        F.sum(dec(x1) * dec(x1)).alias("sx1x1"),
        F.sum(dec(x1) * dec(x2)).alias("sx1x2"),
        F.sum(dec(x2) * dec(x2)).alias("sx2x2"),
        F.sum(dec(x1) * dec(y)).alias("sx1y"),
        F.sum(dec(x2) * dec(y)).alias("sx2y"),
        F.sum(dec(y) * dec(y)).alias("syy"),
    )
    nD = F.col("n").cast("decimal(38,0)")
    exacts = {
        "S11": nD * F.col("sx1x1") - F.col("sx1") * F.col("sx1"),
        "S12": nD * F.col("sx1x2") - F.col("sx1") * F.col("sx2"),
        "S22": nD * F.col("sx2x2") - F.col("sx2") * F.col("sx2"),
        "S1y": nD * F.col("sx1y") - F.col("sx1") * F.col("sy"),
        "S2y": nD * F.col("sx2y") - F.col("sx2") * F.col("sy"),
        "SST": nD * F.col("syy") - F.col("sy") * F.col("sy"),
    }
    staged = s.select(
        *group_cols, "n", "sx1", "sx2", "sy",
        *[v.cast("decimal(38,0)").cast("double").alias(k)
          for k, v in exacts.items()])
    det = (F.col("S11") * F.col("S22") - F.col("S12") * F.col("S12"))
    b1 = ((F.col("S22") * F.col("S1y") - F.col("S12") * F.col("S2y"))
          / det)
    b2 = ((F.col("S11") * F.col("S2y") - F.col("S12") * F.col("S1y"))
          / det)
    solved = staged.withColumn("__det", det).where(
        (F.col("n") >= 3) & (F.col("__det") > 0)
    ).select(
        *group_cols, "n", "S1y", "S2y", "SST",
        F.col("sx1").cast("double").alias("__sx1"),
        F.col("sx2").cast("double").alias("__sx2"),
        F.col("sy").cast("double").alias("__sy"),
        b1.alias("__b1"), b2.alias("__b2"))
    b0 = ((F.col("__sy") - F.col("__b1") * F.col("__sx1")
           - F.col("__b2") * F.col("__sx2"))
          / F.col("n").cast("double"))
    r2 = ((F.col("__b1") * F.col("S1y") + F.col("__b2") * F.col("S2y"))
          / F.col("SST"))
    return solved.select(
        *group_cols, "n",
        F.round(b0, 9).alias("b0"),
        F.round(F.col("__b1"), 9).alias("b1"),
        F.round(F.col("__b2"), 9).alias("b2"),
        F.round(r2, 9).alias("r2"))


def ols2_sql(
    src: str,
    y_expr: str,
    x1_expr: str,
    x2_expr: str,
    group_exprs: Sequence[str] = (),
    where: str = "",
) -> str:
    """DuckDB mirror of :func:`ols2_fit`: HUGEINT-exact moments, the
    same one-cast-to-double discipline and fixed-parenthesization
    solve (HUGEINT ≡ DECIMAL(38,0) for these magnitudes: both exact
    integers, both correctly rounded on the single cast)."""
    g = ", ".join(group_exprs)
    gsel = f"{g}, " if g else ""
    gby = f"GROUP BY {g}" if g else ""
    wh = f"WHERE {where}" if where else ""
    return f"""
    WITH pts AS (
        SELECT {gsel}CAST({y_expr} AS HUGEINT) AS y,
               CAST({x1_expr} AS HUGEINT) AS x1,
               CAST({x2_expr} AS HUGEINT) AS x2
        FROM {src} {wh}
    ),
    s AS (
        SELECT {gsel}CAST(COUNT(*) AS HUGEINT) AS n,
               SUM(x1) AS sx1, SUM(x2) AS sx2, SUM(y) AS sy,
               SUM(x1 * x1) AS sx1x1, SUM(x1 * x2) AS sx1x2,
               SUM(x2 * x2) AS sx2x2, SUM(x1 * y) AS sx1y,
               SUM(x2 * y) AS sx2y, SUM(y * y) AS syy
        FROM pts {gby}
    ),
    c AS (
        SELECT {gsel}n,
               CAST(sx1 AS DOUBLE) AS sx1d, CAST(sx2 AS DOUBLE) AS sx2d,
               CAST(sy AS DOUBLE) AS syd,
               CAST(n * sx1x1 - sx1 * sx1 AS DOUBLE) AS S11,
               CAST(n * sx1x2 - sx1 * sx2 AS DOUBLE) AS S12,
               CAST(n * sx2x2 - sx2 * sx2 AS DOUBLE) AS S22,
               CAST(n * sx1y - sx1 * sy AS DOUBLE) AS S1y,
               CAST(n * sx2y - sx2 * sy AS DOUBLE) AS S2y,
               CAST(n * syy - sy * sy AS DOUBLE) AS SST
        FROM s
    ),
    d AS (
        SELECT *, S11 * S22 - S12 * S12 AS det,
               (S22 * S1y - S12 * S2y) / (S11 * S22 - S12 * S12) AS b1,
               (S11 * S2y - S12 * S1y) / (S11 * S22 - S12 * S12) AS b2
        FROM c
    )
    SELECT {gsel}CAST(n AS BIGINT) AS n,
           round((syd - b1 * sx1d - b2 * sx2d) / CAST(n AS DOUBLE), 9)
               AS b0,
           round(b1, 9) AS b1,
           round(b2, 9) AS b2,
           round((b1 * S1y + b2 * S2y) / SST, 9) AS r2
    FROM d
    WHERE n >= 3 AND det > 0
    """


def join_size_audit(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    top_n: int = 5,
) -> DataFrame:
    """PRE-JOIN cardinality + skew audit: the EXACT output size an
    equi-join would produce and the keys that dominate it — computed
    WITHOUT running the join (two per-key count aggregates and a skinny
    count-relation join; the candidate join's n_left·n_right row blowup
    never materializes).  ``|A ⋈ B| = Σ_k cntA(k)·cntB(k)`` is an
    identity, not an estimate, so the row sits under a hash-exact
    oracle.

    The scale-planning companion of ``shard_skew_audit``: run it
    before a fact-fact join to decide broadcast vs bucketed layout vs
    salting — ``top_share`` (the hottest key's fraction of the entire
    join output) ≫ 1/parts means one task owns the join; the
    scale_audit skew toolkit (salt_and_replicate, bucketed layouts)
    is the fix.

    Output: one summary row per rank 0 (totals) plus the ``top_n``
    hottest keys by pair product —
    ``(rank, key, pairs, join_rows, top_share)`` with rank 1..top_n;
    rank 0 carries key NULL and the exact total.  All counts exact
    integers (DECIMAL(38,0)-staged products); top_share is one rounded
    division."""
    lc = left.groupBy(F.col(left_key).alias("__k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__la"))
    rc = right.groupBy(F.col(right_key).alias("__k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__rb"))
    prod = lc.join(rc, "__k").select(
        "__k",
        (F.col("__la").cast("decimal(38,0)")
         * F.col("__rb").cast("decimal(38,0)")).alias("__p"))
    total = prod.agg(
        F.sum("__p").cast("decimal(38,0)").alias("__tot"))
    # global top-n via sort+limit (TakeOrderedAndProject — distributed,
    # no empty-PARTITION-BY window anywhere: the package-wide lint);
    # ranks then derive VALUE-BASED on the bounded n-row set (count of
    # strictly-greater rows + 1, the monthly_revenue_growth rework)
    topset = (prod.orderBy(F.col("__p").desc(), F.col("__k"))
              .limit(int(top_n)))
    other = topset.select(F.col("__p").alias("__p2"),
                          F.col("__k").alias("__k2"))
    ranked = (
        topset.join(F.broadcast(other),
                    (F.col("__p2") > F.col("__p"))
                    | ((F.col("__p2") == F.col("__p"))
                       & (F.col("__k2") < F.col("__k"))), "left")
        .groupBy("__k", "__p")
        .agg((F.count("__k2") + 1).cast("int").alias("__rnk"))
        .crossJoin(F.broadcast(total))
    )
    top = ranked.select(
        F.col("__rnk").cast("int").alias("rank"),
        F.col("__k").cast("string").alias("key"),
        F.col("__p").cast("bigint").alias("pairs"),
        F.col("__tot").cast("bigint").alias("join_rows"),
        F.round(F.col("__p").cast("double")
                / F.col("__tot").cast("double"), 9).alias("top_share"))
    summary = total.select(
        F.lit(0).cast("int").alias("rank"),
        F.lit(None).cast("string").alias("key"),
        F.col("__tot").cast("bigint").alias("pairs"),
        F.col("__tot").cast("bigint").alias("join_rows"),
        F.lit(1.0).alias("top_share"))
    return summary.unionByName(top)


def join_size_audit_sql(
    left_src: str,
    right_src: str,
    left_key: str,
    right_key: str,
    top_n: int = 5,
) -> str:
    """DuckDB mirror of :func:`join_size_audit` (HUGEINT products ≡ the
    DECIMAL(38,0) staging)."""
    return f"""
    WITH lc AS (SELECT {left_key} AS k, CAST(COUNT(*) AS HUGEINT) AS la
                FROM {left_src} GROUP BY 1),
    rc AS (SELECT {right_key} AS k, CAST(COUNT(*) AS HUGEINT) AS rb
           FROM {right_src} GROUP BY 1),
    prod AS (SELECT lc.k, lc.la * rc.rb AS p
             FROM lc JOIN rc USING (k)),
    tot AS (SELECT SUM(p) AS t FROM prod),
    ranked AS (
        SELECT ROW_NUMBER() OVER (ORDER BY p DESC, k) AS rnk, k, p
        FROM prod
    )
    SELECT CAST(0 AS INT) AS rank, CAST(NULL AS VARCHAR) AS key,
           CAST(t AS BIGINT) AS pairs, CAST(t AS BIGINT) AS join_rows,
           1.0 AS top_share
    FROM tot
    UNION ALL
    SELECT CAST(rnk AS INT), CAST(k AS VARCHAR), CAST(p AS BIGINT),
           CAST(t AS BIGINT),
           round(CAST(p AS DOUBLE) / CAST(t AS DOUBLE), 9)
    FROM ranked, tot WHERE rnk <= {int(top_n)}
    """


# ---------------------------------------------------------------------------
# Z-order (Morton) interleaving for multi-dimensional layout
# ---------------------------------------------------------------------------

def zorder_quantize(col: Column, lo: Column, hi: Column,
                    bits: int) -> Column:
    """Equal-width quantization of an integer column onto
    ``[0, 2^bits)`` given its (broadcast scalar) min/max: ``q =
    (v − lo)·(2^bits − 1) div (hi − lo)``, with a degenerate-range
    guard (hi = lo → 0).  Pure integer arithmetic — exact and
    SQL-mirrorable; (hi − lo)·(2^bits − 1) must fit int64 (bits ≤ 16
    and any realistic key range)."""
    span = hi - lo
    num = ((col - lo) * F.lit((1 << bits) - 1)).cast("bigint")
    # exact integer div: (num - num % span) / span is integral, and the
    # double division of an integral quotient < 2^53 is exact
    q = ((num - num % span) / span).cast("bigint")
    return F.when(span > 0, q).otherwise(F.lit(0).cast("bigint"))


def zorder_value(q1: Column, q2: Column, bits: int) -> Column:
    """MORTON / Z-ORDER interleaving of two ``bits``-bit quantized
    integers (Morton 1966; the multi-dimensional clustering key behind
    Delta/Iceberg OPTIMIZE ZORDER): bit j of q1 lands at position 2j,
    bit j of q2 at 2j+1 — so records close in BOTH dimensions land
    close on the 1-D z-line, and range-partitioning the z-line yields
    files whose per-dimension min/max envelopes are tight in BOTH
    dimensions at once (the property multi-dim data skipping needs;
    a single-column sort gives a tight envelope in ONE dimension
    only).

    Exact integer expression — an unrolled sum of ``2·bits`` disjoint
    shifted bit terms (bits ≤ 16 keeps z < 2^32 in bigint), identical
    in Spark and the SQL mirror :func:`zorder_value_sql`."""
    assert 1 <= bits <= 16, "bits must be in [1, 16]"
    z = F.lit(0).cast("bigint")
    for j in range(bits):
        z = z + F.shiftleft(F.shiftright(q1, j).bitwiseAND(F.lit(1)),
                            2 * j).cast("bigint")
        z = z + F.shiftleft(F.shiftright(q2, j).bitwiseAND(F.lit(1)),
                            2 * j + 1).cast("bigint")
    return z


def zorder_value_sql(q1_expr: str, q2_expr: str, bits: int) -> str:
    """DuckDB text of :func:`zorder_value` — the same unrolled sum of
    shifted bit terms."""
    assert 1 <= bits <= 16, "bits must be in [1, 16]"
    terms = []
    for j in range(bits):
        terms.append(f"((({q1_expr} >> {j}) & 1) << {2 * j})")
        terms.append(f"((({q2_expr} >> {j}) & 1) << {2 * j + 1})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"
