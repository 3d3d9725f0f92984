"""Sources-layer tests: drift detection/alignment, idempotent bronze
loads, ingestion log, month-range/checksum utils, and the async HTTP
downloader against a local server (retry, 404 short-circuit,
skip-if-exists)."""

from __future__ import annotations

import http.server
import os
import threading

import pytest
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from nyc_tlc_analytics_pipeline_spark.core.config import IngestionConfig
from nyc_tlc_analytics_pipeline_spark.sources.downloader import (
    download_months,
    generate_month_range,
    sha256_file,
)
from nyc_tlc_analytics_pipeline_spark.sources.drift import (
    align_to_schema,
    detect_drift,
    drift_report_rows,
)
from nyc_tlc_analytics_pipeline_spark.sources import sinks
from nyc_tlc_analytics_pipeline_spark.sources.readers import (
    read_zones_csv,
    validate_parquet,
)
from nyc_tlc_analytics_pipeline_spark.sources.tlc_schemas import YELLOW_SCHEMA

from .tlc_fixtures import yellow_fixture, zones_fixture


def _schema(*fields) -> StructType:
    return StructType([StructField(n, t) for n, t in fields])


def test_detect_drift_cases():
    expected = _schema(("a", IntegerType()), ("b", StringType()))
    observed = _schema(("a", IntegerType()), ("c", DoubleType()))
    r = detect_drift(observed, expected)
    assert r.new_columns == (("c", "double"),)
    assert r.removed_columns == ("b",)
    assert not r.is_breaking
    r2 = detect_drift(_schema(("a", StringType())), expected)
    assert r2.type_changes == (("a", "int", "string"),)
    assert r2.is_breaking


def test_align_to_schema_nulls_and_drops(spark):
    df = spark.createDataFrame([(1, "x", 9.5)], "a int, extra string, b double")
    expected = _schema(("a", IntegerType()), ("b", DoubleType()), ("missing", StringType()))
    out = align_to_schema(df, expected, strict_types=False)
    assert out.columns == ["a", "b", "missing"]
    row = out.head()
    assert row.a == 1 and row.b == 9.5 and row.missing is None


def test_align_raises_on_breaking_drift(spark):
    df = spark.createDataFrame([("not-int",)], "a string")
    with pytest.raises(ValueError, match="breaking schema drift"):
        align_to_schema(df, _schema(("a", IntegerType())), strict_types=True)


def test_drift_report_rows():
    expected = _schema(("a", IntegerType()))
    observed = _schema(("a", StringType()), ("n", DoubleType()))
    rows = drift_report_rows("yellow", "f.parquet", detect_drift(observed, expected))
    kinds = {r[2] for r in rows}
    assert kinds == {"new_column", "type_change"}


def test_idempotent_bronze_load(spark, tmp_path):
    bronze = str(tmp_path / "raw_yellow")
    df = spark.createDataFrame(yellow_fixture().drop(columns=["source_file"]))
    assert sinks.idempotent_append(df, bronze, "yellow_2024-06.parquet") is True
    assert sinks.idempotent_append(df, bronze, "yellow_2024-06.parquet") is False  # skip
    assert sinks.idempotent_append(df, bronze, "yellow_2024-07.parquet") is True
    loaded = spark.read.parquet(bronze)
    assert loaded.count() == 8  # 4 rows x 2 distinct files, no dup load
    assert set(r.source_file for r in loaded.select("source_file").distinct().collect()) == {
        "yellow_2024-06.parquet",
        "yellow_2024-07.parquet",
    }


def test_idempotent_append_replay_does_not_duplicate(spark, tmp_path, monkeypatch):
    """A loader that races past the already-loaded pre-check (or a re-run
    of a crashed load) must converge to ONE clean copy of the file's rows:
    the write is a dynamic partition overwrite, not an append."""
    bronze = str(tmp_path / "raw_yellow")
    df = spark.createDataFrame(yellow_fixture().drop(columns=["source_file"]))
    assert sinks.idempotent_append(df, bronze, "yellow_2024-06.parquet") is True
    assert sinks.idempotent_append(df, bronze, "yellow_2024-07.parquet") is True
    # simulate the check-race loser: pre-check says "not loaded", write runs again
    monkeypatch.setattr(sinks, "is_file_loaded", lambda *_: False)
    assert sinks.idempotent_append(df, bronze, "yellow_2024-06.parquet") is True
    loaded = spark.read.parquet(bronze)
    assert loaded.count() == 8  # 4 rows x 2 files — replay replaced, not doubled
    assert (
        loaded.filter("source_file = 'yellow_2024-07.parquet'").count() == 4
    )  # untouched partition survives the dynamic overwrite


def test_ingestion_log(spark):
    df = sinks.ingestion_log_rows(
        spark,
        [
            {"service_type": "yellow", "source_file": "a.parquet", "rows_loaded": 10},
            {"service_type": "green", "source_file": "b.parquet", "rows_loaded": 5},
        ],
    )
    rows = df.collect()
    assert len(rows) == 2
    assert len({r.log_id for r in rows}) == 2


def test_validate_parquet_and_zones_csv(spark, tmp_path):
    p = str(tmp_path / "y.parquet")
    spark.createDataFrame(yellow_fixture().drop(columns=["source_file"])).write.parquet(p)
    info = validate_parquet(spark, p, YELLOW_SCHEMA)
    assert info["row_count"] == 4 and info["valid"]
    csv_path = str(tmp_path / "zones.csv")
    zones_fixture().to_csv(csv_path, index=False)
    z = read_zones_csv(spark, csv_path)
    assert z.count() == 12
    assert dict(z.dtypes)["LocationID"] in ("int", "bigint")


def test_csv_export_and_pandas_sinks(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    out = str(tmp_path / "export")
    sinks.export_csv(df, out)
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 2 and set(back.columns) == {"id", "name"}
    pdf = sinks.to_pandas(df)
    assert list(pdf.columns) == ["id", "name"] and len(pdf) == 2


def test_generate_month_range():
    assert generate_month_range("2024-11", "2025-02") == [
        "2024-11",
        "2024-12",
        "2025-01",
        "2025-02",
    ]
    assert generate_month_range("2024-01", "2024-01") == ["2024-01"]
    with pytest.raises(ValueError):
        generate_month_range("2025-01", "2024-01")


def test_sha256_file(tmp_path):
    import hashlib

    p = tmp_path / "x.bin"
    p.write_bytes(b"hello world")
    assert sha256_file(str(p)) == hashlib.sha256(b"hello world").hexdigest()


class _Handler(http.server.BaseHTTPRequestHandler):
    """Serves yellow/green 2024-01; 404s hvfhv; fails yellow 2024-02 twice
    then succeeds (exercises retry)."""

    fail_counts: dict[str, int] = {}

    def do_GET(self):  # noqa: N802
        name = os.path.basename(self.path)
        if "fhvhv" in name:
            self.send_error(404)
            return
        if "2024-02" in name:
            n = self.fail_counts.get(name, 0)
            if n < 2:
                self.fail_counts[name] = n + 1
                self.send_error(500)
                return
        body = f"parquet-bytes-for-{name}".encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def http_base_url():
    _Handler.fail_counts = {}
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_downloader_retry_404_and_skip(tmp_path, http_base_url):
    cfg = IngestionConfig(max_retries=3, retry_backoff_base_seconds=0.01)
    landing = str(tmp_path / "landing")
    results = download_months(
        ["2024-01", "2024-02"], landing, ("yellow", "hvfhv"), cfg, http_base_url
    )
    by = {os.path.basename(r.path): r for r in results}
    ok = by["yellow_tripdata_2024-01.parquet"]
    assert ok.status == "downloaded" and ok.attempts == 1 and ok.sha256
    retried = by["yellow_tripdata_2024-02.parquet"]
    assert retried.status == "downloaded" and retried.attempts == 3  # 2 fails + 1 ok
    nf = by["fhvhv_tripdata_2024-01.parquet"]
    assert nf.status == "not_found" and nf.attempts == 1  # 404 short-circuit
    # second run: existing files are skipped
    again = download_months(
        ["2024-01"], landing, ("yellow",), cfg, http_base_url
    )
    assert again[0].status == "skipped_exists"


def test_timestamp_policy_one_type(spark, tmp_path):
    """Engine-wide timestamp policy: parquet TIMESTAMP(isAdjustedToUTC=
    false) — which Spark 4 would otherwise infer as TIMESTAMP_NTZ, a type
    that rejects numeric casts — must surface as plain TimestampType both
    through the tuned session (conf) and through load_table (normalizer),
    and the NTZ-safe epoch helper must be castable on it."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import TimestampType

    from nyc_tlc_analytics_pipeline_spark.functions.scalar import to_epoch

    p = str(tmp_path / "ntz.parquet")
    pq.write_table(
        pa.table({"ts": pa.array([0, 10**6], type=pa.timestamp("us"))}), p
    )
    df = spark.read.parquet(p)
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    assert [r[0] for r in df.select(to_epoch("ts")).orderBy("ts").collect()] == [0, 1]


def test_events_ts_is_timestamp_type(spark):
    from pyspark.sql.types import TimestampType

    from nyc_tlc_analytics_pipeline_spark.sources.testdata import load_table
    from .conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampType)


def test_jsonl_roundtrip_and_pruning(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from nyc_tlc_analytics_pipeline_spark.sources.readers import (
        read_jsonl,
        write_jsonl,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i}", "en" if i % 2 else "de") for i in range(100)],
        ["doc_id", "text", "lang"],
    )
    out = str(tmp_path / "corpus_jsonl")
    write_jsonl(df, out)
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
        ]
    )
    back = read_jsonl(spark, out, schema)
    assert back.schema == schema
    assert back.count() == 100
    assert back.agg(F.sum("doc_id")).collect()[0][0] == sum(range(100))
    # explicit-schema read prunes: only requested fields reach the scan
    plan = back.select("doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "text" not in plan


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    from pyspark.sql import functions as F

    from nyc_tlc_analytics_pipeline_spark.sources.readers import (
        read_orc,
        write_orc,
    )
    from nyc_tlc_analytics_pipeline_spark.sources.testdata import load_table

    df = load_table(spark, "/root/testdata/sf0.001", "nation")
    path = str(tmp_path / "nation_orc")
    write_orc(df, path)
    back = read_orc(spark, path)
    assert sorted(back.columns) == sorted(df.columns)
    assert back.count() == df.count()
    # filter + projection reach the ORC scan (pushdown/pruning parity
    # with the parquet path)
    plan = (
        back.filter(F.col("n_regionkey") == 1)
        .select("n_name")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "n_regionkey" in plan
    assert "ReadSchema" in plan


def test_orc_partitioned_write_prunes(spark, tmp_path):
    from pyspark.sql import functions as F

    from nyc_tlc_analytics_pipeline_spark.sources.readers import (
        read_orc,
        write_orc,
    )
    from nyc_tlc_analytics_pipeline_spark.sources.testdata import load_table

    df = load_table(spark, "/root/testdata/sf0.001", "nation")
    path = str(tmp_path / "nation_orc_parts")
    write_orc(df, path, partition_by=["n_regionkey"])
    back = read_orc(spark, path)
    plan = (
        back.filter(F.col("n_regionkey") == 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
    assert back.filter(F.col("n_regionkey") == 1).count() == df.filter(
        F.col("n_regionkey") == 1
    ).count()
