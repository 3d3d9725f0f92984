"""Deterministic synthetic TLC raw data spanning the congestion-fee epoch
(2024-11-01 .. 2025-01-31) — big enough that all 14 analytics queries
produce non-trivial results.  Seeded stdlib ``random``; no numpy RNG so
row-level values are reproducible across platforms."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pandas as pd

from .tlc_fixtures import zones_fixture

# weighted: four dense Manhattan zones (so the reference's ≥50-trips-per-
# zone-day and ≥10-per-zone-hour thresholds in q11/q14 are met), plus a
# sprinkle of airport (1) and unknown (264) zones for q06/q09 coverage
ZONE_IDS = [161, 161, 161, 236, 236, 236, 142, 142, 74, 74, 132, 264]
LICENSES = ["HV0002", "HV0003", "HV0003", "HV0003", "HV0004", "HV0005", "HV0005"]
START = datetime(2024, 12, 8)
DAYS = 55  # through 2025-01-31 — spans the 2025-01-05 congestion-fee epoch


def _ts(rng: random.Random) -> datetime:
    return START + timedelta(
        days=rng.randrange(DAYS), hours=rng.randrange(24), minutes=rng.randrange(60)
    )


def synth_yellow(n: int = 3000, seed: int = 1) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        pickup = _ts(rng)
        minutes = rng.randint(3, 90)
        dist = round(rng.uniform(0.3, 18.0), 2)
        fare = round(3.0 + dist * rng.uniform(2.0, 4.0), 2)
        tip = round(fare * rng.uniform(0, 0.3), 2)
        tolls = rng.choice([0.0, 0.0, 0.0, 6.55])
        total = round(fare + tip + tolls + 0.5 + 0.5 + 0.3 + 2.5, 2)
        rows.append(
            {
                "VendorID": rng.choice([1, 2]),
                "tpep_pickup_datetime": pickup,
                "tpep_dropoff_datetime": pickup + timedelta(minutes=minutes),
                "passenger_count": float(rng.randint(1, 4)),
                "trip_distance": dist,
                "RatecodeID": 1.0,
                "store_and_fwd_flag": "N",
                "PULocationID": rng.choice(ZONE_IDS),
                "DOLocationID": rng.choice(ZONE_IDS),
                "payment_type": rng.choice([1, 1, 2]),
                "fare_amount": fare,
                "extra": 0.5,
                "mta_tax": 0.5,
                "tip_amount": tip,
                "tolls_amount": tolls,
                "improvement_surcharge": 0.3,
                "total_amount": total,
                "congestion_surcharge": 2.5,
                "Airport_fee": rng.choice([0.0, 0.0, 1.75]),
                "source_file": "yellow_synth.parquet",
            }
        )
    return pd.DataFrame(rows)


def synth_green(n: int = 800, seed: int = 2) -> pd.DataFrame:
    y = synth_yellow(n, seed)
    g = y.rename(
        columns={
            "tpep_pickup_datetime": "lpep_pickup_datetime",
            "tpep_dropoff_datetime": "lpep_dropoff_datetime",
        }
    ).drop(columns=["Airport_fee"])
    # float64 NaN, not object-None: plain (non-Arrow) sessions cannot infer
    # a type for an all-None object column
    g["ehail_fee"] = float("nan")
    g["trip_type"] = 1.0
    g["source_file"] = "green_synth.parquet"
    return g


def synth_hvfhv(n: int = 12000, seed: int = 3) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        pickup = _ts(rng)
        secs = rng.randint(240, 5400)
        dist = round(rng.uniform(0.4, 20.0), 2)
        base = round(5.0 + dist * rng.uniform(1.8, 3.5), 2)
        tips = round(base * rng.uniform(0, 0.25), 2)
        tolls = rng.choice([0.0, 0.0, 6.55])
        bcf = round(base * 0.03, 2)
        tax = round(base * 0.08875, 2)
        total = base + tips + tolls + bcf + tax + 2.75 + 0.0
        pay = round(total * rng.uniform(0.6, 0.9), 2)
        rows.append(
            {
                "hvfhs_license_num": rng.choice(LICENSES),
                "dispatching_base_num": "B02764",
                "originating_base_num": "B02510",
                "request_datetime": pickup - timedelta(minutes=8),
                "on_scene_datetime": pickup - timedelta(minutes=2),
                "pickup_datetime": pickup,
                "dropoff_datetime": pickup + timedelta(seconds=secs),
                "PULocationID": rng.choice(ZONE_IDS),
                "DOLocationID": rng.choice(ZONE_IDS),
                "trip_miles": dist,
                "trip_time": secs,
                "base_passenger_fare": base,
                "tolls": tolls,
                "bcf": bcf,
                "sales_tax": tax,
                "congestion_surcharge": 2.75,
                "airport_fee": 0.0,
                "tips": tips,
                "driver_pay": pay,
                "shared_request_flag": rng.choice(["N", "N", "N", "Y"]),
                "shared_match_flag": rng.choice(["N", "N", "Y"]),
                "access_a_ride_flag": " ",
                "wav_request_flag": "N",
                "wav_match_flag": "N",
                "source_file": "hvfhv_synth.parquet",
            }
        )
    return pd.DataFrame(rows)


def synth_zones() -> pd.DataFrame:
    z = zones_fixture()
    # add JFK so q06's service_zone = 'Airports' filter has signal
    z.loc[len(z)] = [132, "Queens", "JFK Airport", "Airports"]
    return z
