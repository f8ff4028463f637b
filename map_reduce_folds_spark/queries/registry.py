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
        # duplicate registration silently SHADOWS the earlier query (the
        # round-13 pipeline_curation_v3 name collision left the round-8
        # shard-packing composition unverified for two sessions) — refuse
        # loudly so a copy-pasted @query name can never hide a row
        assert name not in QUERIES, (
            f"duplicate query registration: {name!r} is already "
            f"registered; pick a distinct name")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
