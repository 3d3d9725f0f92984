"""Async HTTP ingestion source (S4).

Driver-side Python (not a Spark operator — SURVEY §2.1 S4): downloads the
monthly TLC parquet files into a landing directory that Spark then reads.
Reproduces the reference's behavior (src/ingestion/downloader.py:43-291):

- bounded concurrency via a semaphore (default 10);
- up to 3 retries with exponential backoff ``base**attempt``;
- 404 short-circuits (no retries — the month simply isn't published);
- sha256 checksum recorded per file;
- skip when the file already exists locally (idempotent re-run).

Implemented with stdlib only (urllib inside ``asyncio.to_thread``)."""

from __future__ import annotations

import asyncio
import hashlib
import os
import urllib.error
import urllib.request
from dataclasses import dataclass

from ..core.config import IngestionConfig

SERVICE_FILE_PATTERNS = {
    "yellow": "yellow_tripdata_{month}.parquet",
    "green": "green_tripdata_{month}.parquet",
    "hvfhv": "fhvhv_tripdata_{month}.parquet",
}

#: the reference's default testing months (reference:
#: src/ingestion/downloader.py:294-307 ``download_sample_months`` /
#: config ``date_range.sample_months``) — the `download-sample` CLI verb
SAMPLE_MONTHS = ("2024-01", "2024-06", "2024-12")


def generate_month_range(start: str, end: str) -> list[str]:
    """'2021-01'..'2021-03' → ['2021-01','2021-02','2021-03']
    (reference: src/utils.py:12-37)."""
    sy, sm = map(int, start.split("-"))
    ey, em = map(int, end.split("-"))
    if (sy, sm) > (ey, em):
        raise ValueError(f"start {start} is after end {end}")
    months = []
    y, m = sy, sm
    while (y, m) <= (ey, em):
        months.append(f"{y:04d}-{m:02d}")
        m += 1
        if m > 12:
            y, m = y + 1, 1
    return months


def sha256_file(path: str, chunk_size: int = 1 << 20) -> str:
    """Streaming checksum (reference: src/utils.py:40-57)."""
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        while chunk := fh.read(chunk_size):
            h.update(chunk)
    return h.hexdigest()


@dataclass
class DownloadResult:
    url: str
    path: str
    status: str  # downloaded | skipped_exists | not_found | failed
    attempts: int = 0
    sha256: str | None = None
    size_bytes: int = 0
    error: str | None = None


def _fetch(url: str, dest: str, timeout: float) -> int:
    tmp = dest + ".partial"
    with urllib.request.urlopen(url, timeout=timeout) as resp, open(tmp, "wb") as out:
        while chunk := resp.read(1 << 20):
            out.write(chunk)
    os.replace(tmp, dest)
    return os.path.getsize(dest)


async def download_one(
    url: str,
    dest: str,
    sem: asyncio.Semaphore,
    cfg: IngestionConfig,
) -> DownloadResult:
    if os.path.exists(dest):
        return DownloadResult(url, dest, "skipped_exists", sha256=sha256_file(dest),
                              size_bytes=os.path.getsize(dest))
    async with sem:
        last_err: str | None = None
        for attempt in range(cfg.max_retries + 1):
            try:
                size = await asyncio.to_thread(_fetch, url, dest, cfg.timeout_seconds)
                return DownloadResult(
                    url, dest, "downloaded", attempts=attempt + 1,
                    sha256=sha256_file(dest), size_bytes=size,
                )
            except urllib.error.HTTPError as e:
                if e.code == 404:  # month not published — don't retry
                    return DownloadResult(url, dest, "not_found", attempts=attempt + 1,
                                          error="404")
                last_err = f"HTTP {e.code}"
            except OSError as e:
                last_err = str(e)
            if attempt < cfg.max_retries:
                await asyncio.sleep(cfg.retry_backoff_base_seconds**attempt)
        return DownloadResult(url, dest, "failed", attempts=cfg.max_retries + 1,
                              error=last_err)


async def download_months_async(
    months: list[str],
    landing_dir: str,
    services: tuple[str, ...] = ("yellow", "green", "hvfhv"),
    cfg: IngestionConfig | None = None,
    base_url: str | None = None,
) -> list[DownloadResult]:
    cfg = cfg or IngestionConfig()
    base = (base_url or cfg.base_url).rstrip("/")
    os.makedirs(landing_dir, exist_ok=True)
    sem = asyncio.Semaphore(cfg.max_concurrent_downloads)
    tasks = []
    for month in months:
        for service in services:
            fname = SERVICE_FILE_PATTERNS[service].format(month=month)
            tasks.append(
                download_one(f"{base}/{fname}", os.path.join(landing_dir, fname), sem, cfg)
            )
    return list(await asyncio.gather(*tasks))


def download_months(
    months: list[str],
    landing_dir: str,
    services: tuple[str, ...] = ("yellow", "green", "hvfhv"),
    cfg: IngestionConfig | None = None,
    base_url: str | None = None,
) -> list[DownloadResult]:
    """Synchronous entry point (reference: asyncio.run in flows.py)."""
    return asyncio.run(
        download_months_async(months, landing_dir, services, cfg, base_url)
    )
