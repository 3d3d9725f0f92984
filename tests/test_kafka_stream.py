"""Kafka-shaped source tests: the file-backed source must deliver the
exact connector wire schema, honor Kafka's partition/offset contracts,
round-trip event payloads losslessly, and feed the existing watermarked
plans with batch-identical results — the source-swap contract."""

from __future__ import annotations

import json
import shutil

import pytest
from pyspark.sql import functions as F

from nyc_tlc_analytics_pipeline_spark.sources.testdata import load_table
from nyc_tlc_analytics_pipeline_spark.streaming import kafka
from nyc_tlc_analytics_pipeline_spark.streaming.events import (
    hourly_type_counts_stream,
    run_to_memory_sink,
)

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_SMOKE, "events")


@pytest.fixture(scope="module")
def kafka_dir(spark, events, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("kafka_records"))
    kafka.encode_events_as_kafka(events).repartition(4).write.mode(
        "overwrite"
    ).parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_wire_schema_matches_connector(spark, kafka_dir):
    stream = kafka.read_kafka_like_stream(spark, kafka_dir)
    assert stream.isStreaming
    assert stream.schema == kafka.KAFKA_WIRE_SCHEMA


def test_kafka_contracts_key_partition_offset(spark, events, kafka_dir):
    recs = spark.read.parquet(kafka_dir)
    # every key maps to exactly one partition
    assert (
        recs.groupBy("key").agg(F.countDistinct("partition").alias("np"))
        .filter(F.col("np") > 1).count() == 0
    )
    # offsets are dense 0..n-1 within each partition
    per_part = recs.groupBy("partition").agg(
        F.count("*").alias("n"), F.min("offset").alias("lo"), F.max("offset").alias("hi")
    )
    assert per_part.filter(
        (F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1)
    ).count() == 0
    assert recs.count() == events.count()


def test_value_payload_roundtrip(spark, events, kafka_dir):
    """from_json(value) must reproduce the original typed event rows."""
    parsed = kafka.parse_event_values(spark.read.parquet(kafka_dir))
    assert parsed.schema == events.select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).schema
    assert (
        parsed.exceptAll(events.select(parsed.columns)).count() == 0
        and events.select(parsed.columns).exceptAll(parsed).count() == 0
    )
    # spot-check one payload is honest JSON with the right fields
    raw = spark.read.parquet(kafka_dir).select("value").head()[0]
    assert set(json.loads(bytes(raw))) == {
        "event_id", "ts", "user_id", "event_type", "value", "props"
    }


def test_kafka_fed_plan_matches_batch(spark, events, kafka_dir):
    """The SAME hourly aggregation plan, fed from the kafka-shaped source
    instead of the file event source, must equal the batch answer."""
    stream = hourly_type_counts_stream(
        kafka.parse_event_values(kafka.read_kafka_like_stream(spark, kafka_dir))
    )
    run_to_memory_sink(stream, "kafka_hourly", output_mode="complete")
    got = {
        (r.window_start, r.event_type): (r.n_events, round(r.total_value, 6))
        for r in spark.table("kafka_hourly").collect()
    }
    expected = {
        (r.ws, r.event_type): (r.n, round(r.v, 6))
        for r in events.groupBy(
            F.window("ts", "1 hour").getField("start").alias("ws"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    assert got == expected


def test_real_connector_absence_raises_clear_error(spark):
    with pytest.raises(RuntimeError, match="read_kafka_like_stream"):
        kafka.read_kafka_stream(spark, "localhost:9092", "events")
