"""Plan inspection & assertion helpers.

"Would this plan survive a 100× scale-up?" is checkable: filters must reach
the parquet scan, dimension joins must broadcast, an applicative reduce must
cost exactly one shuffle.  These helpers read the executed plan so tests
can pin those properties — a perf regression then fails CI instead of
surfacing as a 10× slowdown at sf=full.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Final physical plan string (post-AQE section only)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def initial_physical_plan(df: DataFrame) -> str:
    """Pre-AQE physical plan.  Use when AQE's runtime shortcuts (e.g. empty-
    relation propagation at tiny SF) hide the join strategies that would run
    on real data."""
    return df._jdf.queryExecution().sparkPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle boundaries in the final plan (broadcast exchanges
    excluded)."""
    p = executed_plan(df)
    return p.count("Exchange hashpartitioning") + p.count(
        "Exchange rangepartitioning"
    ) + p.count("Exchange SinglePartition")


def count_broadcast_joins(df: DataFrame) -> int:
    return executed_plan(df).count("BroadcastHashJoin")

def count_sortmerge_joins(df: DataFrame) -> int:
    return executed_plan(df).count("SortMergeJoin")


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the scan node reports a pushed filter mentioning `fragment`."""
    plan = executed_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def scan_columns(df: DataFrame) -> list[str]:
    """Columns actually read at the (first) parquet scan — column pruning
    check: a 2-column projection must not read 16 columns."""
    plan = executed_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            frag = line.split("ReadSchema:")[1]
            inner = frag[frag.find("<") + 1: frag.rfind(">")]
            return [f.split(":")[0] for f in inner.split(",") if ":" in f]
    return []


def count_cartesian_joins(df: DataFrame) -> int:
    """Cartesian/nested-loop joins in the final plan — the O(n²) smell.
    A dedup/similarity plan containing one does NOT survive a scale-up."""
    p = executed_plan(df)
    return p.count("CartesianProduct") + p.count("BroadcastNestedLoopJoin")


def uses_whole_stage_codegen(df: DataFrame) -> bool:
    # codegen'd operators render as "*(n) Op" in the plan string
    p = executed_plan(df)
    return "WholeStageCodegen" in p or "*(" in p
