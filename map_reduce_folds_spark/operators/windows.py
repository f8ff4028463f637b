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
