"""Fixture-contract hardening: the driver regenerates /root/testdata between
rounds and has already shipped two physical types for ``events.ts``
(TIMESTAMP(NANOS) in rounds 1-2, plain timestamp[us] → TIMESTAMP_NTZ in
round 3).  These tests pin that the loader canonicalizes EVERY known
variant to the same UTC TIMESTAMP instants, fails loudly on unknown
dtypes, and that every events-consuming query still *analyzes* (plan
build only — an AnalysisException here is exactly the class of breakage
round 3 suffered)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from map_reduce_folds_spark.sources import _normalize_events_ts
from map_reduce_folds_spark.timeutil import epoch_seconds, epoch_us
from tests.conftest import SF_DIR

# one reference instant, expressed per physical variant
_US = 1_700_000_123_456_789  # microseconds since epoch
_NAIVE = dt.datetime(2023, 11, 14, 22, 15, 23, 456789)  # same instant, UTC wall clock


def _schema(ts_type):
    return StructType(
        [StructField("event_id", LongType()), StructField("ts", ts_type)]
    )


@pytest.fixture()
def variants(spark):
    """The three known fixture shapes carrying the SAME instant."""
    nanos = spark.createDataFrame([(1, _US * 1000)], _schema(LongType()))
    ntz = spark.createDataFrame([(1, _NAIVE)], _schema(TimestampNTZType()))
    # session tz is UTC, so a naive datetime binds to the UTC instant
    tstz = spark.createDataFrame([(1, _NAIVE)], _schema(TimestampType()))
    return {"long_nanos": nanos, "ntz": ntz, "timestamp": tstz}


def test_normalize_all_variants_same_instant(variants):
    for name, df in variants.items():
        out = _normalize_events_ts(df)
        assert isinstance(out.schema["ts"].dataType, TimestampType), name
        [row] = out.select(F.unix_micros("ts").alias("us")).collect()
        assert row["us"] == _US, name


def test_normalize_rejects_unknown_dtype(spark):
    bad = spark.createDataFrame([(1, "2023-11-14")], _schema(StringType()))
    with pytest.raises(TypeError, match="events.ts arrived as unsupported"):
        _normalize_events_ts(bad)


def test_epoch_helpers_tolerate_both_timestamp_flavors(variants):
    for name in ("ntz", "timestamp"):
        df = variants[name]
        [row] = df.select(
            epoch_us("ts").alias("us"), epoch_seconds("ts").alias("s")
        ).collect()
        assert row["us"] == _US, name
        assert row["s"] == pytest.approx(_US / 1e6), name


# Every registered query that reads the events table.  Plan-build + analysis
# only (``.schema`` resolves the logical plan, no job runs): round 3's red
# surface was three of these failing to ANALYZE after the fixture dtype
# changed, so this is the cheapest possible regression net.
_EVENTS_QUERIES = [
    "asof_join_purchase_click",
    "sessionize_events",
    "events_tumbling_window",
    "json_props_extract",
    "pivot_event_counts",
    "salted_aggregation",
    "salted_join_hot_keys",
    "deterministic_sample",
]


def test_temporal_contract_accepts_current_fixtures(spark):
    from map_reduce_folds_spark.sources import load_table

    for t in ("events", "orders", "lineitem", "documents", "embeddings"):
        load_table(spark, SF_DIR, t)  # raises TypeError on contract breach


def test_contract_rejects_non_array_embedding(spark):
    from map_reduce_folds_spark.sources import _check_fixture_contract

    bad = spark.createDataFrame(
        [(1, "0.5,0.25")], "vec_id bigint, embedding string"
    )
    with pytest.raises(TypeError, match="embedding arrived as unsupported"):
        _check_fixture_contract("embeddings", bad)


def test_contract_rejects_missing_column(spark):
    """A dropped/renamed load-bearing column is the same breakage class as
    a dtype change: one descriptive TypeError naming the column and the
    observed schema, not a bare KeyError."""
    from map_reduce_folds_spark.sources import _check_fixture_contract

    bad = spark.createDataFrame([(1, "x")], "doc_id bigint, body string")
    with pytest.raises(TypeError, match="documents.text is MISSING"):
        _check_fixture_contract("documents", bad)


def test_temporal_contract_rejects_string_date(spark):
    from map_reduce_folds_spark.sources import _check_fixture_contract

    bad = spark.createDataFrame(
        [(1, "1995-01-01")], "o_orderkey bigint, o_orderdate string"
    )
    with pytest.raises(TypeError, match="o_orderdate arrived as unsupported"):
        _check_fixture_contract("orders", bad)


@pytest.mark.parametrize("name", _EVENTS_QUERIES)
def test_events_query_analyzes(spark, name):
    from map_reduce_folds_spark.queries import QUERIES

    fn = QUERIES.get(name)
    if fn is None:
        pytest.skip(f"{name} not registered")
    df = fn(spark, SF_DIR)
    assert len(df.schema.fields) > 0
