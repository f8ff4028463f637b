"""Window-function operators (SURVEY §2.7 GAP: none in the reference).

The reference's nearest concept is the key-dependent fold ``k -> Fold c d``
(reference Core.hs:181); true windows (per-row results over ordered frames)
are new surface.  All helpers take an explicit total order — after a shuffle
Spark guarantees no intra-partition order, so every ordered window needs a
deterministic ORDER BY (include a unique tie-break).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..timeutil import epoch_seconds


def running(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    aggs: dict[str, Column],
) -> DataFrame:
    """Running (cumulative) aggregates per key: rows unbounded-preceding →
    current.  One shuffle on ``keys``; frames evaluate incrementally."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for name, col in aggs.items():
        out = out.withColumn(name, col.over(w))
    return out


def lag_lead(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    col: str,
    lag: int = 1,
) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn(f"{col}_lag{lag}", F.lag(col, lag).over(w)).withColumn(
        f"{col}_lead{lag}", F.lead(col, lag).over(w)
    )


def ranked(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    method: str = "row_number",
    out: str = "rank",
) -> DataFrame:
    fns = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank,
           "percent_rank": F.percent_rank, "ntile4": lambda: F.ntile(4)}
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn(out, fns[method]().over(w))


def ordered_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum_before",
    n_buckets: int = 1024,
) -> DataFrame:
    """EXCLUSIVE running sum of ``value_col`` over the total order of
    ``order_col`` (which must be unique) — WITHOUT the single-task
    ``ORDER BY``-only window that a naive global running sum compiles to.

    Distributed prefix-sum decomposition:

    1. bucket rows by order-preserving ranges of ``order_col`` (range
       width from one cheap min/max agg — buckets are a pure function of
       the value, so recomputation is deterministic; uniform when ids are
       dense, the common case for generated ids);
    2. exclusive running sum WITHIN each bucket (windows partitioned by
       bucket — parallel);
    3. per-bucket totals → driver-side exclusive prefix sum over
       ≤ ``n_buckets`` rows → broadcast-joined offsets (the bounded-
       metadata pattern);
    4. global prefix = bucket offset + local prefix.

    Same result as ``SUM() OVER (ORDER BY order_col ROWS UNBOUNDED
    PRECEDING AND 1 PRECEDING)``, n_buckets-way parallel."""
    lo, hi = df.agg(F.min(order_col), F.max(order_col)).first()
    if lo is None:
        return df.withColumn(out_col, F.lit(0).cast("bigint"))
    width = max(1, (int(hi) - int(lo)) // n_buckets + 1)
    b = ((F.col(order_col) - F.lit(int(lo))) / F.lit(width)).cast("bigint")
    tagged = df.withColumn("__b", b)
    w = (
        Window.partitionBy("__b").orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = tagged.withColumn(
        "__local", F.coalesce(F.sum(value_col).over(w), F.lit(0)).cast("bigint")
    )
    totals = tagged.groupBy("__b").agg(F.sum(value_col).alias("__t")).collect()
    offsets, acc = [], 0
    for row in sorted(totals, key=lambda r: r["__b"]):
        offsets.append((int(row["__b"]), acc))
        acc += int(row["__t"])
    off_df = df.sparkSession.createDataFrame(offsets, "__b bigint, __off bigint")
    return (
        local.join(F.broadcast(off_df), "__b")
        .withColumn(out_col, F.col("__off") + F.col("__local"))
        .drop("__b", "__local", "__off")
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Batch sessionization: a new session starts when the gap to the
    previous event (per key) exceeds ``gap_seconds``.  Classic two-window
    composition: lag → gap flag → running sum of flags = session index.
    One shuffle on ``key``.  (Streaming equivalent: F.session_window —
    streaming/ module.)"""
    w = Window.partitionBy(key).orderBy(ts)
    # epoch_seconds tolerates TIMESTAMP and TIMESTAMP_NTZ alike (timeutil)
    gap = epoch_seconds(ts) - F.lag(epoch_seconds(ts)).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
