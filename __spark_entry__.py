"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query key.

Numeric-stability policy (so value hashes match the DuckDB oracle exactly):
compute exact, emit deterministic — sums over fractional doubles go through
DECIMAL(18,2) (exact in both engines), means are emitted as a single double
division of exact quantities, and double outputs are produced by identical
single operations on both sides.  Integer-valued doubles (e.g. l_quantity)
sum exactly in binary double, so they need no cast.

Corollary for ROUNDED outputs (the ln/pow 9-decimal discipline): rounding
absorbs cross-engine ulp noise ONLY while the rounding quantum exceeds the
value's ulp — round(x, 9) of an O(1) score is stable, but at magnitude
~1e7+ one ulp (~7e-9) is WIDER than the 1e-9 grid and round() itself
becomes engine-dependent.  Rescale large-magnitude outputs into a range
where quantum ≫ ulp (moments_per_event_type emits variance in units², not
cents², for exactly this reason) or emit them from exact integer
numerators without a rounding step.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# importable regardless of the harness's working directory
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from map_reduce_folds_spark.queries import QUERIES, ORACLES, flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
