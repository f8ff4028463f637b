"""Data-quality / expectation operators for pipeline gating.

Training-data pipelines gate on corpus health before burning compute:
null rates, duplicate rates, domain violations, cardinalities.  All checks
compile into ONE aggregation pass per table (applicative fold composition
— N expectations, one scan, one tiny shuffle)."""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One-row profile: per column — null count and distinct count, plus
    total rows and full-row duplicate count.  Single .agg pass."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"))
        aggs.append(F.countDistinct(c).alias(f"{c}__distinct"))
    return df.agg(*aggs)


def expect(df: DataFrame, expectations: Mapping[str, Column]) -> DataFrame:
    """Count violations per named expectation (Column predicates that
    should hold for every row).  Returns one row: name → violation count;
    0 everywhere means the gate passes.  One scan regardless of N."""
    aggs = [
        # NULL-evaluating predicates count as violations (a NULL in the
        # expression is itself a quality failure, not a pass)
        F.count(F.when(~F.coalesce(cond, F.lit(False)), 1)).alias(name)
        for name, cond in expectations.items()
    ]
    return df.agg(*aggs)


def gate(df: DataFrame, expectations: Mapping[str, Column]) -> None:
    """Raise ValueError if any expectation is violated (driver-side gate
    for pipeline orchestration)."""
    row = expect(df, expectations).collect()[0]
    bad = {k: v for k, v in row.asDict().items() if v}
    if bad:
        raise ValueError(f"data-quality gate failed: {bad}")
