"""Query registry: every implemented operator as (PySpark impl, DuckDB oracle).

This mirrors the reference's differential-test strategy (engine vs hand
oracle, reference test/Test1.hs:27-57) with DuckDB as the oracle — SURVEY §5.

Each query callable takes ``(spark, sf_dir)`` and returns a DataFrame whose
column names match the oracle SQL exactly (the driver sorts columns by name
and hashes values).  Numeric-stability policy in ``__spark_entry__``'s
docstring.
"""

from __future__ import annotations

from map_reduce_folds_spark.queries.registry import ORACLES, QUERIES, query

# importing the submodules populates the registry
from map_reduce_folds_spark.queries import core_mr  # noqa: E402,F401
from map_reduce_folds_spark.queries import relational  # noqa: E402,F401
from map_reduce_folds_spark.queries import llm  # noqa: E402,F401

from map_reduce_folds_spark.queries.core_mr import flagship  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "query", "flagship"]
