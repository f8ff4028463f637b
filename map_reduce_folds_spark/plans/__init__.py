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


def scale_audit(df: DataFrame, max_shuffles: int | None = None) -> list[str]:
    """Lint a plan for the smells that kill a 100× scale-up.  Returns a
    list of human-readable findings (empty = clean); each names the smell
    and the fix this package provides.  Run it on any composed pipeline
    before promoting it to a big cluster — the same checks the test suite
    pins per-operator (test_plans), packaged as a user-facing audit:

    * cartesian / broadcast-nested-loop joins — O(n²): add an equi-key,
      bucketize (interval_join/overlap_join), or broadcast a small side;
    * global-order Window (empty PARTITION BY) — the whole dataset sorts
      in ONE task: use windows.ordered_prefix_sum / rank buckets;
    * row-at-a-time Python UDF (BatchEvalPython) — interpreter in the
      per-row path: use built-ins or an Arrow stage (mapInPandas);
    * no whole-stage codegen anywhere — interpreted expressions;
    * more shuffles than ``max_shuffles`` (when given).
    """
    p = executed_plan(df)
    findings: list[str] = []
    n_cart = p.count("CartesianProduct") + p.count("BroadcastNestedLoopJoin")
    if n_cart:
        findings.append(
            f"{n_cart} cartesian/nested-loop join(s): O(n^2) pair "
            "generation — add an equi-key, bucketize the range condition "
            "(relational.interval_join/overlap_join), or broadcast an "
            "actually-small side")
    for ln in p.splitlines():
        if "Window [" not in ln:
            continue
        # a Window operator renders its top-level argument lists as
        # `Window [fns], [partitionExprs], [orderExprs]` — the partition
        # group is OMITTED entirely when empty, leaving only 2 groups
        depth = 0
        groups = 0
        for ch in ln[ln.index("Window ["):]:
            if ch == "[":
                if depth == 0:
                    groups += 1
                depth += 1
            elif ch == "]":
                depth -= 1
        if groups < 3:
            findings.append(
                "global-order Window (no PARTITION BY): the whole "
                "dataset sorts in one task — use "
                "windows.ordered_prefix_sum / bucketed ranks")
            break
    if "BatchEvalPython" in p:
        findings.append(
            "row-at-a-time Python UDF (BatchEvalPython): ~10-100x slower "
            "than Arrow — use pyspark.sql.functions or mapInPandas")
    if not ("WholeStageCodegen" in p or "*(" in p):
        findings.append(
            "no whole-stage codegen in the plan: expressions run "
            "interpreted — prefer built-in functions over HOF-heavy or "
            "UDF expressions in the hot path")
    if max_shuffles is not None:
        n = count_exchanges(df)
        if n > max_shuffles:
            findings.append(
                f"{n} shuffle Exchanges (budget {max_shuffles}): look for "
                "a missing broadcast hint, a re-derived lineage that a "
                "materialize boundary would cut, or bucketed tables for "
                "repeated co-located joins")
    return findings
