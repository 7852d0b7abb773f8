"""Chunked, paced HTTP row sink + high-watermark commit protocol.

Reproduces the reference .NET sync worker's serve path
(reference azure-function/PushTelemetryFunction.cs):

- A8  HTTP push of a JSON array of flat rows, <=500 rows per POST,
      abort on non-2xx (cs:402-425; batch size cs:192-195)
- F8  200 ms pacing between POSTs during backfill (cs:264)
- A9  single high-watermark state cell, default lookback now-1h when
      absent (cs:280-308)
- F6  incremental consumption: read rows strictly newer than the
      watermark, push, and advance the watermark ONLY after a fully
      successful push (cs:100-157, gate at 142-146) — at-least-once
      delivery with a monotone watermark.
- F9  initial-load mode: same query with an unbounded start watermark
      (cs:37-86).

The poster is injected (any callable `(json_rows: list[str]) -> None`
that raises on failure), so tests use an in-memory collector and
production wires `requests.post`. Rows serialize via `to_json(struct)`
JVM-side; only the final string rows cross to the driver, in order,
through `toLocalIterator` (one partition in memory at a time). The
single-endpoint POST loop is inherently driver-side — same shape as the
reference's single worker; a fan-out sink would use foreachPartition
with per-executor sessions.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BATCH_SIZE = 500
PACE_SECONDS = 0.2
DEFAULT_LOOKBACK = timedelta(hours=1)

Poster = Callable[[list[str]], None]


class CollectingPoster:
    """Test double: records every chunk; optionally fails the first
    `fail_times` POSTs (to exercise the at-least-once contract)."""

    def __init__(self, fail_times: int = 0) -> None:
        self.chunks: list[list[str]] = []
        self.calls = 0
        self.fail_times = fail_times

    def __call__(self, rows: list[str]) -> None:
        self.calls += 1
        if self.calls <= self.fail_times:
            raise ConnectionError(f"simulated POST failure #{self.calls}")
        self.chunks.append(rows)

    @property
    def rows(self) -> list[str]:
        return [r for c in self.chunks for r in c]


def push_rows(
    df: DataFrame,
    poster: Poster,
    batch_size: int = BATCH_SIZE,
    pace_seconds: float = PACE_SECONDS,
) -> int:
    """Serialize rows JVM-side and POST in paced chunks; raises on the
    first failed chunk (delivered prefix stays delivered — the reference
    has the same at-least-once gap, cs:140-157)."""
    out = df.select(F.to_json(F.struct(*df.columns)).alias("j"))
    sent = 0
    chunk: list[str] = []
    for row in out.toLocalIterator():
        chunk.append(row["j"])
        if len(chunk) >= batch_size:
            if sent:
                time.sleep(pace_seconds)
            poster(chunk)
            sent += len(chunk)
            chunk = []
    if chunk:
        if sent:
            time.sleep(pace_seconds)
        poster(chunk)
        sent += len(chunk)
    return sent


def read_watermark(state_path: str, now: datetime | None = None) -> datetime:
    """A9: the single state cell; default lookback now-1h when absent
    (reference cs:288,301,306)."""
    if os.path.exists(state_path):
        with open(state_path) as fh:
            return datetime.fromisoformat(json.load(fh)["last_processed"])
    now = now or datetime.now(timezone.utc)
    return now - DEFAULT_LOOKBACK


def write_watermark(state_path: str, wm: datetime) -> None:
    tmp = state_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"last_processed": wm.isoformat()}, fh)
    os.replace(tmp, state_path)


def incremental_push(
    spark: SparkSession,
    telemetry_dir: str,
    state_path: str,
    poster: Poster,
    ts_col: str = "enqueuedTime",
    initial_load: bool = False,
    now: datetime | None = None,
    batch_size: int = BATCH_SIZE,
    pace_seconds: float = PACE_SECONDS,
) -> int:
    """One sync tick (F6/F9): tail-read -> push -> commit watermark.

    Returns rows pushed. The watermark advances to max(ts) of the pushed
    rows only after every chunk succeeded; a mid-push failure leaves it
    untouched, so the next tick redelivers (at-least-once, idempotent
    under a monotone watermark). `initial_load=True` is the F9 backfill:
    unbounded start, same commit protocol (cs:270-274).
    """
    df = spark.read.parquet(telemetry_dir)
    if not initial_load:
        wm = read_watermark(state_path, now=now)
        df = df.filter(F.col(ts_col) > F.lit(wm.replace(tzinfo=None)))
    df = df.orderBy(F.col(ts_col).asc())
    hi = df.agg(F.max(ts_col).alias("hi")).collect()[0]["hi"]
    if hi is None:
        return 0
    sent = push_rows(df, poster, batch_size=batch_size, pace_seconds=pace_seconds)
    write_watermark(state_path, hi if hi.tzinfo else hi.replace(tzinfo=timezone.utc))
    return sent
