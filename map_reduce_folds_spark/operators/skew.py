"""Skew-mitigation operators.

At 100 TB a single hot key (one language, one source domain, one null-ish
default) can pin an executor for hours.  Two mitigations:

* AQE skew handling (on by default in session.py) — splits oversized
  shuffle partitions at runtime; covers joins and simple aggs.
* :func:`salted_aggregate` — explicit two-stage aggregation for algebraic
  folds: group on (key, salt) first (spreading a hot key over N reducers),
  then re-aggregate the partials per key.  Results are identical to the
  direct aggregation for any commutative-monoid agg (sum/count/min/max);
  means must be computed as sum/count across the two stages (done here).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


#: partial-stage expression and matching final-stage re-aggregation
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, tuple[str, str | Column | None]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs`` maps output name → (kind, input column), kind ∈
    sum/count/min/max.  Stage 1 groups by (keys..., salt) where salt =
    pmod(hash(whole row id-ish), buckets) — here a uniform random-free salt
    from ``spark_partition_id`` is NOT used because it breaks determinism;
    instead we salt by a hash of all value columns, which spreads hot keys
    while keeping the plan deterministic.  Stage 2 re-aggregates partials
    by the true keys.  Both stages are plain hash aggregations with map-side
    combine; total shuffle volume is keys×buckets rows for stage 2.
    """
    value_cols = [c for c in df.columns if c not in keys]
    salt = F.pmod(F.hash(*[F.col(c) for c in value_cols]), F.lit(salt_buckets))
    stage1_aggs = []
    stage2_aggs = []
    for name, (kind, col) in aggs.items():
        part_fn, merge_fn = _MERGEABLE[kind]
        incol = F.col(col) if isinstance(col, str) else col
        stage1_aggs.append(
            (part_fn(incol) if kind != "count" else part_fn(None)).alias(f"__p_{name}")
        )
        stage2_aggs.append(merge_fn(F.col(f"__p_{name}")).alias(name))
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*stage1_aggs)
    return partial.groupBy(*keys).agg(*stage2_aggs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe equi-join by salt-and-replicate.

    The LEFT (big, skew-prone) side gets a deterministic salt from a hash
    of all its non-key columns, spreading a hot key's rows over
    ``salt_buckets`` reducers; the RIGHT (small) side is replicated once
    per bucket via an explode, so every (key, salt) pair still meets its
    match.  Join semantics are exactly the plain inner equi-join — only
    the shuffle layout changes.  Shuffle volume: left unchanged, right
    × salt_buckets (cheap by the small-side assumption; for genuinely
    large right sides prefer AQE's skew-join splitting, on by default).
    """
    value_cols = [c for c in left.columns if c != on]
    salt = F.pmod(F.hash(*[F.col(c) for c in value_cols]), F.lit(salt_buckets))
    l_salted = left.withColumn("__salt", salt)
    r_replicated = right.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    return l_salted.join(r_replicated, [on, "__salt"]).drop("__salt")
