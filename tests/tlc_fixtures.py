"""Canonical TLC micro-fixtures (FIXTURES.md §1-4, lifted from the
reference's deterministic conftest DataFrames — 4 yellow, 3 green,
3 hvfhv rows, 12 taxi zones incl. the Unknown zones 264/265)."""

from __future__ import annotations

from datetime import datetime

import pandas as pd

_D = datetime


def yellow_fixture() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "VendorID": [1, 2, 1, 2],
            "tpep_pickup_datetime": [
                _D(2024, 6, 1, 10, 0),
                _D(2024, 6, 1, 11, 0),
                _D(2024, 6, 1, 12, 0),
                _D(2024, 6, 1, 13, 0),
            ],
            "tpep_dropoff_datetime": [
                _D(2024, 6, 1, 10, 15),
                _D(2024, 6, 1, 11, 20),
                _D(2024, 6, 1, 12, 30),
                _D(2024, 6, 1, 13, 10),
            ],
            "passenger_count": [1.0, 2.0, 1.0, 3.0],
            "trip_distance": [2.5, 5.0, 3.2, 1.8],
            "RatecodeID": [1.0, 1.0, 1.0, 1.0],
            "store_and_fwd_flag": ["N"] * 4,
            "PULocationID": [161, 237, 142, 236],
            "DOLocationID": [237, 142, 236, 161],
            "payment_type": [1, 1, 2, 1],
            "fare_amount": [12.5, 25.0, 16.0, 9.5],
            "extra": [0.5] * 4,
            "mta_tax": [0.5] * 4,
            "tip_amount": [2.5, 5.0, 0.0, 2.0],
            "tolls_amount": [0.0, 0.0, 5.76, 0.0],
            "improvement_surcharge": [0.3] * 4,
            "total_amount": [16.3, 31.3, 23.06, 12.8],
            "congestion_surcharge": [2.5] * 4,
            "Airport_fee": [0.0] * 4,
            "source_file": ["yellow_2024-06.parquet"] * 4,
        }
    )


def green_fixture() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "VendorID": [1, 2, 1],
            "lpep_pickup_datetime": [
                _D(2024, 6, 1, 10, 0),
                _D(2024, 6, 1, 11, 0),
                _D(2024, 6, 1, 12, 0),
            ],
            "lpep_dropoff_datetime": [
                _D(2024, 6, 1, 10, 20),
                _D(2024, 6, 1, 11, 25),
                _D(2024, 6, 1, 12, 35),
            ],
            "store_and_fwd_flag": ["N"] * 3,
            "RatecodeID": [1.0] * 3,
            "PULocationID": [74, 75, 41],
            "DOLocationID": [75, 41, 74],
            "passenger_count": [1.0, 2.0, 1.0],
            "trip_distance": [3.0, 4.5, 2.8],
            "fare_amount": [15.0, 22.5, 14.0],
            "extra": [0.5] * 3,
            "mta_tax": [0.5] * 3,
            "tip_amount": [3.0, 4.5, 0.0],
            "tolls_amount": [0.0, 0.0, 5.76],
            "ehail_fee": [None, None, None],
            "improvement_surcharge": [0.3] * 3,
            "total_amount": [19.3, 28.3, 21.06],
            "payment_type": [1, 1, 2],
            "trip_type": [1.0] * 3,
            "congestion_surcharge": [2.5] * 3,
            "source_file": ["green_2024-06.parquet"] * 3,
        }
    )


def hvfhv_fixture() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "hvfhs_license_num": ["HV0003", "HV0005", "HV0003"],
            "dispatching_base_num": ["B02764"] * 3,
            "originating_base_num": ["B02510"] * 3,
            "request_datetime": [
                _D(2024, 6, 1, 10, 0),
                _D(2024, 6, 1, 11, 0),
                _D(2024, 6, 1, 12, 0),
            ],
            "on_scene_datetime": [
                _D(2024, 6, 1, 10, 5),
                _D(2024, 6, 1, 11, 5),
                _D(2024, 6, 1, 12, 5),
            ],
            "pickup_datetime": [
                _D(2024, 6, 1, 10, 10),
                _D(2024, 6, 1, 11, 8),
                _D(2024, 6, 1, 12, 8),
            ],
            "dropoff_datetime": [
                _D(2024, 6, 1, 10, 25),
                _D(2024, 6, 1, 11, 30),
                _D(2024, 6, 1, 12, 40),
            ],
            "PULocationID": [161, 237, 142],
            "DOLocationID": [237, 142, 236],
            "trip_miles": [2.8, 5.2, 3.5],
            "trip_time": [900, 1320, 1920],
            "base_passenger_fare": [15.5, 28.0, 20.0],
            "tolls": [0.0, 0.0, 5.76],
            "bcf": [0.47, 0.84, 0.60],
            "sales_tax": [1.37, 2.48, 1.77],
            "congestion_surcharge": [2.75] * 3,
            "airport_fee": [0.0] * 3,
            "tips": [3.0, 5.5, 0.0],
            "driver_pay": [12.5, 22.0, 16.0],
            "shared_request_flag": ["N", "N", "Y"],
            "shared_match_flag": ["N"] * 3,
            "access_a_ride_flag": [" "] * 3,
            "wav_request_flag": ["N"] * 3,
            "wav_match_flag": ["N"] * 3,
            "source_file": ["hvfhv_2024-06.parquet"] * 3,
        }
    )


def zones_fixture() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "LocationID": [1, 4, 13, 41, 74, 75, 142, 161, 236, 237, 264, 265],
            "Borough": [
                "EWR",
                "Manhattan",
                "Manhattan",
                "Manhattan",
                "Manhattan",
                "Manhattan",
                "Manhattan",
                "Manhattan",
                "Manhattan",
                "Manhattan",
                "Unknown",
                "Unknown",
            ],
            "Zone": [
                "Newark Airport",
                "Alphabet City",
                "Battery Park City",
                "Central Harlem",
                "East Harlem North",
                "East Harlem South",
                "Lincoln Square East",
                "Midtown Center",
                "Upper East Side North",
                "Upper East Side South",
                "NV",
                "NV",
            ],
            "service_zone": [
                "EWR",
                "Yellow Zone",
                "Yellow Zone",
                "Boro Zone",
                "Boro Zone",
                "Boro Zone",
                "Yellow Zone",
                "Yellow Zone",
                "Yellow Zone",
                "Yellow Zone",
                "N/A",
                "N/A",
            ],
        }
    )
