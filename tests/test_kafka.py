"""Kafka wrapper tests: the parse/encode stages are pure DataFrame logic
over Kafka's fixed wire schema — fully testable without a broker; the
connector-config stage is asserted to fail loudly when the connector
package is absent (as in this container) or to return the wire schema
when it is present."""

from __future__ import annotations

import datetime
import json

import pytest
from pyspark.sql import Row

from map_reduce_folds_spark.streaming import kafka as KF


def _wire_rows(spark, payloads: list[dict], topic="events"):
    ts = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        Row(
            key=str(i).encode(), value=json.dumps(p).encode(), topic=topic,
            partition=i % 2, offset=i, timestamp=ts, timestampType=0,
        )
        for i, p in enumerate(payloads)
    ]
    return spark.createDataFrame(rows, KF.KAFKA_WIRE_SCHEMA)


def test_parse_kafka_json_fields_and_meta(spark):
    raw = _wire_rows(spark, [
        {"event_id": 1, "user_id": 7, "value": 2.5},
        {"event_id": 2, "user_id": 9, "value": -1.0},
    ])
    out = KF.parse_kafka_json(raw, "event_id long, user_id long, value double")
    assert out.columns == ["event_id", "user_id", "value", "_corrupt",
                           "_key", "_topic", "_partition", "_offset",
                           "_kafka_ts"]
    got = {r["event_id"]: r for r in out.collect()}
    assert got[1]["user_id"] == 7 and got[1]["_topic"] == "events"
    assert got[2]["value"] == -1.0 and got[2]["_offset"] == 1
    assert got[2]["_key"] == "1"


def test_parse_kafka_json_malformed_yields_nulls(spark):
    import pyspark.sql.functions as F

    raw = _wire_rows(spark, [{"event_id": 1}])
    bad = raw.withColumn("value", F.lit(b"not json"))
    out = KF.parse_kafka_json(raw.union(bad), "event_id long", include_meta=False)
    vals = sorted([r["event_id"] for r in out.collect()], key=lambda v: (v is None, v))
    assert vals == [1, None]


def test_parse_kafka_json_corrupt_flag_separates_bad_from_null(spark):
    """_corrupt is true exactly for unparseable payloads — rows whose
    fields are LEGITIMATELY null (parseable JSON missing the field, or
    explicit null) are not flagged (round-5 advisor finding)."""
    import pyspark.sql.functions as F

    good = _wire_rows(spark, [{"event_id": 1}, {"other": 9}])  # 2nd: null field
    bad = _wire_rows(spark, [{"event_id": 2}]) \
        .withColumn("value", F.lit(b"{{not json"))
    null_payload = _wire_rows(spark, [{"event_id": 3}]) \
        .withColumn("value", F.lit(None).cast("binary"))
    out = KF.parse_kafka_json(good.union(bad).union(null_payload),
                              "event_id long", include_meta=False)
    rows = [(r["event_id"], r["_corrupt"]) for r in out.collect()]
    assert sorted(rows, key=str) == sorted(
        [(1, False), (None, False), (None, True), (None, False)], key=str)
    # corrupt_col=None drops the flag (pre-round-6 shape)
    assert KF.parse_kafka_json(good, "event_id long", include_meta=False,
                               corrupt_col=None).columns == ["event_id"]


def test_kafka_json_round_trip(spark):
    src = spark.createDataFrame(
        [Row(user_id=i, name=f"u{i}", score=float(i) / 4) for i in range(10)],
        "user_id long, name string, score double",
    )
    wire = KF.to_kafka_json(src, key_col="user_id")
    assert wire.columns == ["key", "value"]
    # re-wrap as a wire frame and parse back
    import pyspark.sql.functions as F
    raw = wire.select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.lit("t").alias("topic"), F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    back = KF.parse_kafka_json(raw, "name string, score double",
                               include_meta=False)
    assert sorted(r["name"] for r in back.collect()) == sorted(
        r["name"] for r in src.collect())
    assert {r["score"] for r in back.collect()} == {
        r["score"] for r in src.collect()}


def test_kafka_reader_fails_loudly_or_returns_wire_schema(spark):
    try:
        df = KF.kafka_stream_reader(spark, "localhost:9092", "t",
                                    max_offsets_per_trigger=100,
                                    min_partitions=4)
    except RuntimeError as e:
        assert "connector" in str(e)
    else:  # connector present in this environment: check the wire schema
        assert set(c.split()[0] for c in KF.KAFKA_WIRE_SCHEMA.split(", ")) \
            <= set(df.columns)


def test_kafka_parse_drives_streaming_aggregation(spark, tmp_path_factory):
    """End-to-end: a file-replay stream of Kafka WIRE frames (binary
    key/value) through parse_kafka_json → windowless streaming agg —
    the parse stage composes with streaming exactly as with batch, so a
    real Kafka topic is a source swap, not a pipeline rewrite."""
    import pyspark.sql.functions as F

    from map_reduce_folds_spark.streaming import run_to_memory

    wire_dir = str(tmp_path_factory.mktemp("kafka_wire"))
    payloads = [{"user_id": i % 3, "amount": float(i)} for i in range(60)]
    _wire_rows(spark, payloads).repartition(3).write.mode("overwrite") \
        .parquet(wire_dir)

    raw_stream = (
        spark.readStream.schema(KF.KAFKA_WIRE_SCHEMA)
        .option("maxFilesPerTrigger", "1").parquet(wire_dir)
    )
    parsed = KF.parse_kafka_json(raw_stream, "user_id long, amount double",
                                 include_meta=False)
    agg = parsed.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("amount").alias("total"))
    got = {r["user_id"]: (r["n"], r["total"])
           for r in run_to_memory(agg, "kafka_parse_agg",
                                  output_mode="complete").collect()}
    want = {
        u: (sum(1 for p in payloads if p["user_id"] == u),
            sum(p["amount"] for p in payloads if p["user_id"] == u))
        for u in (0, 1, 2)
    }
    assert got == want
