"""Shared query/oracle registry used by the queries.* submodules."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query implementation and (optionally) its DuckDB oracle.

    Queries without an oracle get the driver's weaker rows-only check —
    reserve that for genuinely non-SQL-expressible ops.
    """

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
