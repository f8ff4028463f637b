"""Timestamp-dtype-tolerant epoch helpers.

The driver regenerates the parquet fixtures between rounds, and the
physical type of ``events.ts`` has already shifted once (TIMESTAMP(NANOS)
→ plain ``timestamp[us]``, which Spark 4 reads as **TIMESTAMP_NTZ**).
Catalyst treats TIMESTAMP and TIMESTAMP_NTZ as distinct types:
``unix_micros`` accepts only TIMESTAMP, and TIMESTAMP_NTZ → DOUBLE is an
illegal cast.  Rather than have every time-consuming operator open-code a
dtype check, these helpers route *any* timestamp flavor through one legal
path.

The trick: ``cast("timestamp")`` is the identity on TIMESTAMP and a legal,
instant-preserving cast from TIMESTAMP_NTZ **because the session timezone
is pinned UTC** (session.py) — an NTZ wall-clock reinterpreted in UTC is
the same instant the fixture generator wrote.  No schema inspection
needed, so these compose into any expression tree.

Reference analog: none (the reference has no timestamps — its rows are
arbitrary Haskell values, reference Core.hs:96-98).  This is fixture-
contract robustness in the spirit of reference test/Test1.hs:54-57
(engine-vs-oracle under regenerated data).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_ts(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp")


def epoch_us(col: Column | str) -> Column:
    """Microseconds since epoch (bigint) from TIMESTAMP or TIMESTAMP_NTZ.

    Matches DuckDB ``epoch_us(ts)`` on the same parquet column (DuckDB
    reads naive parquet timestamps as TIMESTAMP and epoch_us treats them
    as UTC — identical to our UTC-pinned session cast).
    """
    return F.unix_micros(_as_ts(col))


def epoch_seconds(col: Column | str) -> Column:
    """Fractional seconds since epoch (double) from any timestamp flavor.

    Matches DuckDB ``epoch(ts)``.  Use for gap arithmetic (sessionize)
    where sub-second precision matters but bigint exactness does not.
    """
    return _as_ts(col).cast("double")


def to_utc_timestamp(col: Column | str) -> Column:
    """Canonicalize any timestamp flavor to TIMESTAMP (UTC session)."""
    return _as_ts(col)
