"""Kafka-shaped streaming source.

The production event feed is Kafka; this module gives every downstream
plan the EXACT record shape the Spark Kafka connector delivers
(``key``/``value`` binary, ``topic``, ``partition``, ``offset``,
``timestamp``, ``timestampType`` — the columns of
``spark.readStream.format("kafka")``), through two interchangeable
sources:

- :func:`read_kafka_stream` — the real connector (requires the
  ``spark-sql-kafka`` package on the cluster classpath).
- :func:`read_kafka_like_stream` — a file-backed source with the
  identical schema, for dev/test/CI where no broker exists.  Because the
  schema matches byte-for-byte, every parse + watermark + window plan
  downstream is source-agnostic: swap the reader, keep the query.

Consumption follows the standard pattern: ``value`` is a JSON-encoded
event payload; :func:`parse_event_values` projects it back to the typed
event columns with ``from_json`` (JVM-side, no Python), after which the
stream is plan-compatible with ``events.read_event_stream`` output —
the watermarked aggregations in :mod:`streaming.events` accept either.

Scale notes: partition-by-key encoding preserves Kafka's per-key
ordering contract (all records of one key in one partition, offsets
monotone); ``minPartitions`` on the real source lets Spark split hot
Kafka partitions; JSON parsing is a codegen'd expression, so the
connector swap costs nothing downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from .events import EVENT_STREAM_SCHEMA

#: payload serialization contract: explicit microsecond timestamps + UTC.
#: Spark's to_json default truncates to milliseconds — a silent 999 µs
#: loss per event that would break replay/batch parity.
_JSON_OPTS = {
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "timeZone": "UTC",
}

#: the wire schema of spark-sql-kafka's source, reproduced exactly
KAFKA_WIRE_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    min_partitions: int | None = None,
) -> DataFrame:
    """The real Kafka source (``format("kafka")``).  Raises a clear error
    if the connector package is absent from the cluster classpath —
    dev/test environments use :func:`read_kafka_like_stream` instead."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if min_partitions is not None:
        # split hot Kafka partitions across more Spark tasks
        reader = reader.option("minPartitions", str(min_partitions))
    try:
        return reader.load()
    except Exception as e:  # pragma: no cover — no broker/connector in CI
        raise RuntimeError(
            "Kafka connector unavailable (spark-sql-kafka not on the "
            "classpath?) — use read_kafka_like_stream for file-backed dev"
        ) from e


def read_kafka_like_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 10
) -> DataFrame:
    """File-backed source emitting the exact Kafka wire schema: a parquet
    directory of records written by :func:`encode_events_as_kafka` (or a
    connector-side archiver), streamed with the same bounded-trigger
    semantics as ``events.read_event_stream``."""
    return (
        spark.readStream.schema(KAFKA_WIRE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def encode_events_as_kafka(
    events: DataFrame, topic: str = "events", num_partitions: int = 8
) -> DataFrame:
    """Events → Kafka wire records, honoring Kafka's contracts: key =
    user id bytes; partition = positive hash(key) mod num_partitions (all
    records of a key land in ONE partition); offset = arrival order
    within the partition (monotone per partition, deterministic here by
    (ts, event_id)); value = JSON payload; timestampType = 0
    (CreateTime).  Used to materialize replayable kafka-shaped archives
    and test fixtures."""
    keyed = events.select(
        F.col("user_id").cast("string").cast("binary").alias("key"),
        F.to_json(
            F.struct("event_id", "ts", "user_id", "event_type", "value", "props"),
            _JSON_OPTS,
        ).cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        F.pmod(F.hash(F.col("user_id")), F.lit(num_partitions))
        .cast("int")
        .alias("partition"),
        F.col("ts").alias("timestamp"),
        F.lit(0).alias("timestampType"),
        F.col("ts").alias("__ts"),
        F.col("event_id").alias("__eid"),
    )
    w = Window.partitionBy("partition").orderBy("__ts", "__eid")
    return keyed.withColumn("offset", F.row_number().over(w).cast("long") - 1).select(
        "key", "value", "topic", "partition", "offset", "timestamp", "timestampType"
    )


def parse_event_values(kafka_df: DataFrame) -> DataFrame:
    """Kafka records → typed event rows: ``from_json`` over the value
    payload (codegen'd — the parse adds no Python to the hot path).
    Output schema == ``EVENT_STREAM_SCHEMA``, so the watermarked plans in
    :mod:`streaming.events` run unchanged on a Kafka-fed stream."""
    return kafka_df.select(
        F.from_json(
            F.col("value").cast("string"), EVENT_STREAM_SCHEMA, _JSON_OPTS
        ).alias("e")
    ).select("e.*")
