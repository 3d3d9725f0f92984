"""End-to-end pipeline orchestration: the reference's four Prefect stages
(init → ingest → quality → transform; reference:
src/orchestration/flows.py:228-294) as plain driver-side phases over a
parquet warehouse.

Warehouse layout (medallion, replacing the single DB file):

    <warehouse>/bronze/raw_<service>/source_file=<file>/...
    <warehouse>/silver/fact_trips/service_type=*/pickup_date=*/...
    <warehouse>/gold/agg_*/
    <warehouse>/meta/{ingestion_log,data_quality_metrics}/

Each Spark stage boundary is a job; the bronze partition layout makes
re-ingesting a month idempotent, and the silver partitioning serves the
same access paths the reference indexed (SURVEY §4)."""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


class StageFailed(RuntimeError):
    """A pipeline stage exhausted its retries; the run state on disk marks
    every earlier stage complete, so a re-run resumes at this stage."""

    def __init__(self, stage: str, attempts: int, cause: Exception):
        super().__init__(f"stage {stage!r} failed after {attempts} attempt(s): {cause}")
        self.stage = stage
        self.attempts = attempts
        self.cause = cause

from .core.config import PipelineConfig
from .operators import aggregations, dimensions, quality, standardize
from .sources import sinks
from .sources.readers import read_service_parquet, read_zones_csv
from .sources.tlc_schemas import RAW_SCHEMAS


@dataclass
class TlcPipeline:
    spark: SparkSession
    config: PipelineConfig = field(default_factory=PipelineConfig)

    # -- paths ------------------------------------------------------------
    def bronze(self, service: str) -> str:
        return os.path.join(self.config.warehouse_dir, "bronze", f"raw_{service}")

    @property
    def fact_path(self) -> str:
        return os.path.join(self.config.warehouse_dir, "silver", "fact_trips")

    def gold(self, name: str) -> str:
        return os.path.join(self.config.warehouse_dir, "gold", name)

    def dim(self, name: str) -> str:
        return os.path.join(self.config.warehouse_dir, "silver", name)

    def meta(self, name: str) -> str:
        return os.path.join(self.config.warehouse_dir, "meta", name)

    # -- stage 1: init (dims) ---------------------------------------------
    def init_dims(self, zones_csv: str | None = None) -> dict[str, int]:
        """Build + materialize the dimensions (reference stage 1: DDL init;
        dims are fully derivable so overwrite-rebuild replaces upsert)."""
        raw_zones = read_zones_csv(self.spark, zones_csv) if zones_csv else None
        dims = dimensions.build_all_dims(self.spark, raw_zones=raw_zones)
        counts = {}
        for name, df in dims.items():
            sinks.overwrite(df, self.dim(name))
            counts[name] = self.spark.read.parquet(self.dim(name)).count()
        return counts

    # -- stage 2: ingest ---------------------------------------------------
    def _bronze_manifest(self, service: str):
        from .sources.manifest import ManifestTable

        return ManifestTable(self.spark, self.bronze(service))

    # -- meta tables (format follows bronze_format) ------------------------
    def _meta_append(self, df: DataFrame, name: str) -> None:
        """Append to a meta table through the configured table format.
        Under "manifest" this matters for correctness, not just hygiene:
        concurrent loaders each append an ingestion_log entry, and the
        plain parquet append stages through a SHARED ``_temporary`` dir
        (two jobs interleave each other's commit phase) — the exact race
        the manifest format exists to serialize."""
        if self.config.bronze_format == "manifest":
            from .sources.manifest import ManifestTable

            ManifestTable(self.spark, self.meta(name)).append(df)
        else:
            sinks.append(df, self.meta(name))

    def read_meta(self, name: str) -> DataFrame:
        """Read a meta table through the configured table format."""
        if self.config.bronze_format == "manifest":
            from .sources.manifest import ManifestTable

            return ManifestTable(self.spark, self.meta(name)).read()
        return self.spark.read.parquet(self.meta(name))

    def load_file(self, path: str, service: str) -> dict:
        """Validate → align → idempotent bronze append (SURVEY §3.3).

        ``config.bronze_format`` picks the table format: the partition
        layout (replay-safe, zero metadata) or the manifest commit log
        (safe under concurrent loaders, time travel) — same idempotency
        key (the source filename) either way."""
        df = read_service_parquet(self.spark, path, service)
        fname = os.path.basename(path)
        if self.config.bronze_format == "manifest":
            from pyspark.sql import functions as F

            tagged = df.withColumn(
                "source_file", F.lit(fname)
            ).withColumn("ingestion_timestamp", F.current_timestamp())
            written = self._bronze_manifest(service).append(tagged, tag=fname) is not None
        else:
            written = sinks.idempotent_append(df, self.bronze(service), fname)
        rows = df.count() if written else 0
        entry = {
            "service_type": service,
            "source_file": fname,
            "rows_loaded": rows,
            "file_size_bytes": os.path.getsize(path) if os.path.exists(path) else 0,
            "status": "success" if written else "skipped_already_loaded",
        }
        self._meta_append(
            sinks.ingestion_log_rows(self.spark, [entry]), "ingestion_log"
        )
        return entry

    def load_landing_dir(self, landing_dir: str) -> list[dict]:
        """Glob the landing dir and load every recognized service file
        (reference: DataLoader.load_all_downloaded_files)."""
        results = []
        for service, prefix in (
            ("yellow", "yellow_tripdata"),
            ("green", "green_tripdata"),
            ("hvfhv", "fhvhv_tripdata"),
        ):
            for path in sorted(glob.glob(os.path.join(landing_dir, f"{prefix}*.parquet"))):
                results.append(self.load_file(path, service))
        return results

    def raw(self, service: str) -> DataFrame:
        if self.config.bronze_format == "manifest":
            return self._bronze_manifest(service).read()
        return self.spark.read.parquet(self.bronze(service))

    def _loaded_services(self) -> list[str]:
        return [s for s in ("yellow", "green", "hvfhv") if os.path.isdir(self.bronze(s))]

    # -- stage 3: quality --------------------------------------------------
    def run_quality_checks(self) -> dict[str, list[quality.CheckResult]]:
        out: dict[str, list[quality.CheckResult]] = {}
        for service in self._loaded_services():
            results = quality.run_all_checks(self.raw(service), service, self.config.quality)
            self._meta_append(
                quality.metrics_df(self.spark, results), "data_quality_metrics"
            )
            out[service] = results
        return out

    # -- stage 4: transform + aggregates ----------------------------------
    def build_fact(self) -> int:
        loaded = {s: self.raw(s) for s in self._loaded_services()}
        fact = standardize.build_fact_trips(
            yellow=loaded.get("yellow"), green=loaded.get("green"), hvfhv=loaded.get("hvfhv")
        )
        standardize.write_fact_trips(fact, self.fact_path)
        return self.spark.read.parquet(self.fact_path).count()

    def build_aggregates(self) -> dict[str, int]:
        fact = self.spark.read.parquet(self.fact_path)
        counts = {}
        for name, df in aggregations.build_all(
            fact, approx=self.config.approx_percentiles
        ).items():
            sinks.overwrite(df, self.gold(name))
            counts[name] = self.spark.read.parquet(self.gold(name)).count()
        return counts

    # -- analytics ---------------------------------------------------------
    def tables(self) -> dict[str, DataFrame]:
        t = {"fact_trips": self.spark.read.parquet(self.fact_path)}
        for name in ("dim_zones", "dim_date", "dim_time", "dim_service", "dim_hvfhs_company"):
            p = self.dim(name)
            if os.path.isdir(p):
                t[name] = self.spark.read.parquet(p)
        for name in (
            "agg_pricing_by_zone_hour",
            "agg_hvfhv_take_rates",
            "agg_market_share",
            "agg_daily_summary",
        ):
            p = self.gold(name)
            if os.path.isdir(p):
                t[name] = self.spark.read.parquet(p)
        return t

    def run_analytics(self, name: str) -> DataFrame:
        from .plans.analytics import ANALYTICS

        return ANALYTICS[name](self.tables())

    # -- end-to-end --------------------------------------------------------
    @property
    def _state_path(self) -> str:
        return self.meta("e2e_state.json")

    def _load_state(self) -> dict:
        try:
            with open(self._state_path) as f:
                return json.load(f)
        except (OSError, ValueError):
            return {"stages": {}}

    def _save_state(self, state: dict) -> None:
        os.makedirs(os.path.dirname(self._state_path), exist_ok=True)
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self._state_path)  # atomic: a crash never half-writes

    def _run_stage(self, state: dict, name: str, fn, retries: int):
        """Run one stage with retries and durable completion state —
        the Spark-side equivalent of the reference's per-task
        ``@task(retries=2)`` wiring (reference:
        src/orchestration/flows.py:34,58,76,89,104).  Completed stages are
        skipped on re-entry; every stage body is idempotent (overwrite
        dims/fact/aggs, idempotent-append bronze), so a retry after a
        partial failure converges to the same state."""
        done = state["stages"].get(name)
        if done and done.get("status") == "success":
            return done["result"]
        last: Exception | None = None
        for attempt in range(1, retries + 2):
            try:
                result = fn()
            except Exception as e:  # noqa: BLE001 — stage isolation boundary
                last = e
                continue
            state["stages"][name] = {
                "status": "success",
                "attempts": attempt,
                "result": result,
            }
            self._save_state(state)
            return result
        state["stages"][name] = {"status": "failed", "attempts": retries + 1}
        self._save_state(state)
        raise StageFailed(name, retries + 1, last)

    def run_e2e(
        self,
        landing_dir: str,
        zones_csv: str | None = None,
        retries: int = 2,
        resume: bool = True,
    ) -> dict:
        """The full pipeline (reference: cli.py run-e2e → full_pipeline_flow)
        with per-stage retry + resume: each stage retries ``retries`` times
        (reference default, flows.py:34), completion is journaled to
        ``meta/e2e_state.json``, and a re-run after a failure skips the
        already-completed stages (their idempotent writes are not repeated,
        so e.g. ingestion_log gets no duplicate entries).  A journaled
        ingest stage does NOT freeze the file set: resume re-scans the
        landing dir and loads any files that arrived after the failed run.
        ``resume=False`` discards prior state and runs everything."""
        state = self._load_state() if resume else {"stages": {}}
        if all(
            state["stages"].get(s, {}).get("status") == "success"
            for s in ("init_dims", "ingest", "quality", "build_fact", "build_aggregates")
        ):
            state = {"stages": {}}  # previous run finished — start fresh
        dims = self._run_stage(state, "init_dims", lambda: self.init_dims(zones_csv), retries)
        ingest_was_journaled = state["stages"].get("ingest", {}).get("status") == "success"
        loads = self._run_stage(
            state, "ingest", lambda: self.load_landing_dir(landing_dir), retries
        )
        if ingest_was_journaled:
            # the journal froze the file set seen by the failed run; files
            # landed SINCE then must still be loaded (the loads themselves
            # are idempotent, so this is safe to repeat).  Only unjournaled
            # filenames are touched — no duplicate ingestion_log rows for
            # the already-loaded set.
            journaled = {r["source_file"] for r in loads}
            catchup = [
                self.load_file(path, service)
                for service, prefix in (
                    ("yellow", "yellow_tripdata"),
                    ("green", "green_tripdata"),
                    ("hvfhv", "fhvhv_tripdata"),
                )
                for path in sorted(
                    glob.glob(os.path.join(landing_dir, f"{prefix}*.parquet"))
                )
                if os.path.basename(path) not in journaled
            ]
            if catchup:
                loads = loads + catchup
                state["stages"]["ingest"]["result"] = loads
                self._save_state(state)
        qc_pct = self._run_stage(
            state,
            "quality",
            lambda: {
                s: round(quality.overall_quality_pct(rs), 2)
                for s, rs in self.run_quality_checks().items()
            },
            retries,
        )
        fact_rows = self._run_stage(state, "build_fact", self.build_fact, retries)
        aggs = self._run_stage(state, "build_aggregates", self.build_aggregates, retries)
        return {
            "dims": dims,
            "files_loaded": len([r for r in loads if r["status"] == "success"]),
            "files_skipped": len([r for r in loads if r["status"] != "success"]),
            "quality_pct": qc_pct,
            "fact_rows": fact_rows,
            "aggregates": aggs,
        }
