"""Raw-table schema registry for the three TLC services + zone lookup.

Mirrors the reference DDL (reference: sql/ddl/01_raw_tables.sql:10-105) and
the advisory expected-column lists (reference: src/database/loader.py:18-88)
as explicit ``StructType``s.  Spark reads the monthly parquet natively;
these schemas drive the drift report and the align-and-append load path
(SURVEY §1.3, §3.3).
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _field(name: str, dtype) -> StructField:
    return StructField(name, dtype, nullable=True)


YELLOW_SCHEMA = StructType(
    [
        _field("VendorID", IntegerType()),
        _field("tpep_pickup_datetime", TimestampType()),
        _field("tpep_dropoff_datetime", TimestampType()),
        _field("passenger_count", DoubleType()),
        _field("trip_distance", DoubleType()),
        _field("RatecodeID", DoubleType()),
        _field("store_and_fwd_flag", StringType()),
        _field("PULocationID", IntegerType()),
        _field("DOLocationID", IntegerType()),
        _field("payment_type", IntegerType()),
        _field("fare_amount", DoubleType()),
        _field("extra", DoubleType()),
        _field("mta_tax", DoubleType()),
        _field("tip_amount", DoubleType()),
        _field("tolls_amount", DoubleType()),
        _field("improvement_surcharge", DoubleType()),
        _field("total_amount", DoubleType()),
        _field("congestion_surcharge", DoubleType()),
        _field("Airport_fee", DoubleType()),  # capital A quirk (01_raw_tables.sql:29)
    ]
)

GREEN_SCHEMA = StructType(
    [
        _field("VendorID", IntegerType()),
        _field("lpep_pickup_datetime", TimestampType()),
        _field("lpep_dropoff_datetime", TimestampType()),
        _field("store_and_fwd_flag", StringType()),
        _field("RatecodeID", DoubleType()),
        _field("PULocationID", IntegerType()),
        _field("DOLocationID", IntegerType()),
        _field("passenger_count", DoubleType()),
        _field("trip_distance", DoubleType()),
        _field("fare_amount", DoubleType()),
        _field("extra", DoubleType()),
        _field("mta_tax", DoubleType()),
        _field("tip_amount", DoubleType()),
        _field("tolls_amount", DoubleType()),
        _field("ehail_fee", DoubleType()),
        _field("improvement_surcharge", DoubleType()),
        _field("total_amount", DoubleType()),
        _field("payment_type", IntegerType()),
        _field("trip_type", DoubleType()),
        _field("congestion_surcharge", DoubleType()),
    ]
)

HVFHV_SCHEMA = StructType(
    [
        _field("hvfhs_license_num", StringType()),
        _field("dispatching_base_num", StringType()),
        _field("originating_base_num", StringType()),
        _field("request_datetime", TimestampType()),
        _field("on_scene_datetime", TimestampType()),
        _field("pickup_datetime", TimestampType()),
        _field("dropoff_datetime", TimestampType()),
        _field("PULocationID", LongType()),  # BIGINT in source (01_raw_tables.sql:75)
        _field("DOLocationID", LongType()),
        _field("trip_miles", DoubleType()),
        _field("trip_time", LongType()),  # seconds
        _field("base_passenger_fare", DoubleType()),
        _field("tolls", DoubleType()),
        _field("bcf", DoubleType()),
        _field("sales_tax", DoubleType()),
        _field("congestion_surcharge", DoubleType()),
        _field("airport_fee", DoubleType()),
        _field("tips", DoubleType()),
        _field("driver_pay", DoubleType()),
        _field("shared_request_flag", StringType()),
        _field("shared_match_flag", StringType()),
        _field("access_a_ride_flag", StringType()),
        _field("wav_request_flag", StringType()),
        _field("wav_match_flag", StringType()),
    ]
)

ZONES_SCHEMA = StructType(
    [
        _field("LocationID", IntegerType()),
        _field("Borough", StringType()),
        _field("Zone", StringType()),
        _field("service_zone", StringType()),
    ]
)

RAW_SCHEMAS: dict[str, StructType] = {
    "yellow": YELLOW_SCHEMA,
    "green": GREEN_SCHEMA,
    "hvfhv": HVFHV_SCHEMA,
    "zones": ZONES_SCHEMA,
}

# Lineage columns injected at load (reference: 01_raw_tables.sql:31-32,
# schema_drift.py:206-216).
LINEAGE_COLUMNS = ("source_file", "ingestion_timestamp")
