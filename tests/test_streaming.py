"""Phase 3 streaming tests: replay source, stateful anomaly parity with
the batch oracle, multi-sink fan-out invariants, HTTP push + watermark
commit protocol (SURVEY.md §5 streaming bullet)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from azure_iot_realtime_data_pipeline_spark.operators.windows import (
    spike_dip_score,
    trailing_window,
    with_epoch_seconds,
)
from azure_iot_realtime_data_pipeline_spark.sources.batch import load_table
from azure_iot_realtime_data_pipeline_spark.streaming import http_sink
from azure_iot_realtime_data_pipeline_spark.streaming.anomaly import spike_dip_stream
from azure_iot_realtime_data_pipeline_spark.streaming.pipeline import (
    curated_stream,
    multi_sink_batch_writer,
    run_multi_sink,
)
from azure_iot_realtime_data_pipeline_spark.streaming.source import (
    replay_events,
    stage_replay_dir,
)


@pytest.fixture(scope="module")
def replay_dir(spark, sf_smoke, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("replay"))
    return stage_replay_dir(spark, sf_smoke, out, num_files=4)


def _run_available_now(stream_df, sink_fn, checkpoint):
    q = (
        stream_df.writeStream.foreachBatch(sink_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert not q.isActive


def test_replay_source_delivers_all_rows(spark, sf_smoke, replay_dir, tmp_path):
    total = load_table(spark, sf_smoke, "events").count()
    seen = {"rows": 0, "batches": 0}

    def sink(batch, _bid):
        seen["rows"] += batch.count()
        seen["batches"] += 1

    _run_available_now(
        replay_events(spark, replay_dir), sink, str(tmp_path / "ckpt")
    )
    assert seen["rows"] == total
    assert seen["batches"] >= 2  # maxFilesPerTrigger=1 -> multiple micro-batches


def test_streaming_anomaly_matches_batch_oracle(spark, sf_smoke, replay_dir, tmp_path):
    """Causal streaming evaluation == batch RANGE-frame computation, row
    by row, across micro-batch boundaries (in-order replay)."""
    stream = spike_dip_stream(
        replay_events(spark, replay_dir),
        key_col="user_id",
        window_seconds=60,
        history_size=None,
    )
    got = []

    def sink(batch, _bid):
        got.extend(batch.collect())

    _run_available_now(stream, sink, str(tmp_path / "ckpt"))

    ev = with_epoch_seconds(load_table(spark, sf_smoke, "events"), "ts")
    w = trailing_window("ts_sec", key="user_id", window_seconds=60)
    is_anom, score = spike_dip_score(F.col("value"), w)
    expected = {
        r["event_id"]: (r["score"], r["is_anomaly"])
        for r in ev.select(
            "event_id", score.alias("score"), is_anom.alias("is_anomaly")
        ).collect()
    }
    assert len(got) == len(expected)
    mismatches = [
        (r["event_id"], (r["score"], r["is_anomaly"]), expected[r["event_id"]])
        for r in got
        if (r["score"], r["is_anomaly"]) != expected[r["event_id"]]
    ]
    assert mismatches == []


def test_streaming_anomaly_state_bounded(spark, replay_dir, tmp_path):
    """historySize cap: with history_size=2 no window ever uses more than
    2 retained events + the current batch's same-window rows."""
    stream = spike_dip_stream(
        replay_events(spark, replay_dir),
        key_col="user_id",
        window_seconds=60,
        history_size=2,
    )
    rows = []

    def sink(batch, _bid):
        rows.extend(batch.collect())

    _run_available_now(stream, sink, str(tmp_path / "ckpt"))
    assert rows  # runs to completion with bounded state


def test_multi_sink_fanout(spark, replay_dir, tmp_path):
    bronze = str(tmp_path / "bronze")
    devices = str(tmp_path / "devices")
    telemetry = str(tmp_path / "telemetry")
    q = run_multi_sink(
        curated_stream(replay_events(spark, replay_dir), history_size=85),
        bronze,
        devices,
        telemetry,
        str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(300)

    b = spark.read.parquet(bronze)
    d = spark.read.parquet(devices)
    t = spark.read.parquet(telemetry)
    # bronze is a raw passthrough of the curated stream rows
    assert b.count() == t.count()
    # dimension: exactly one row per deviceId (PK semantics, F7)
    assert d.groupBy("deviceId").count().filter(F.col("count") > 1).count() == 0
    assert d.count() == b.select("deviceId").distinct().count()
    # fact keeps the anomaly flag column, 0/1 only
    flags = {r["Anomaly"] for r in t.select("Anomaly").distinct().collect()}
    assert flags <= {0, 1}


def test_multi_sink_replay_is_idempotent(spark, sf_smoke, tmp_path):
    """Crash-replay semantics: foreachBatch re-delivers a micro-batch
    after a failure between sink writes; re-running the SAME (batch_id,
    rows) through the writer must not duplicate rows in any sink."""
    from azure_iot_realtime_data_pipeline_spark.streaming.pipeline import (
        multi_sink_batch_writer,
    )

    bronze = str(tmp_path / "b3")
    devices = str(tmp_path / "d3")
    telemetry = str(tmp_path / "t3")
    batch = (
        load_table(spark, sf_smoke, "events")
        .limit(200)
        .select(
            F.col("event_id").alias("telemetryId"),
            F.concat(F.lit("dev-"), F.col("user_id").cast("string")).alias("deviceId"),
            F.col("ts").alias("enqueuedTime"),
            "value",
            F.lit(0.0).alias("Score"),
            F.lit(0).alias("Anomaly"),
        )
    )
    write = multi_sink_batch_writer(bronze, devices, telemetry)
    write(batch, 7)
    counts1 = [spark.read.parquet(p).count() for p in (bronze, devices, telemetry)]
    write(batch, 7)  # replay of the same micro-batch
    counts2 = [spark.read.parquet(p).count() for p in (bronze, devices, telemetry)]
    assert counts1 == counts2
    write(batch.limit(50), 8)  # a NEW batch still appends
    assert spark.read.parquet(bronze).count() == counts1[0] + 50


def test_multi_sink_restart_soak(spark, sf_oracle, tmp_path):
    """Replay soak (round-2 verdict item 6): sf0.01 events through the
    full fan-out with an injected MID-fan-out crash (bronze written,
    dimension+fact not) and a checkpoint restart. All three sinks must
    equal the batch oracle row-sets — this exercises batch-id-scoped
    idempotence under real StreamingQuery replay, not just direct
    writer re-invocation."""
    from azure_iot_realtime_data_pipeline_spark.streaming.pipeline import (
        _write_batch_scoped,
        multi_sink_batch_writer,
    )

    replay = stage_replay_dir(spark, sf_oracle, str(tmp_path / "replay"), num_files=6)
    bronze, devices, telemetry = (str(tmp_path / n) for n in ("b", "d", "t"))
    ckpt = str(tmp_path / "ckpt")
    inner = multi_sink_batch_writer(bronze, devices, telemetry)
    crashed = {"done": False}

    def crashy(batch, batch_id):
        if batch_id == 2 and not crashed["done"]:
            crashed["done"] = True
            _write_batch_scoped(batch, batch_id, bronze)
            raise RuntimeError("injected mid-fan-out crash")
        inner(batch, batch_id)

    def start():
        return (
            curated_stream(replay_events(spark, replay), history_size=None)
            .writeStream.foreachBatch(crashy)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    with pytest.raises(Exception):
        q.awaitTermination(300)
        raise AssertionError("first run should die on the injected crash")
    assert crashed["done"]

    q2 = start()
    q2.awaitTermination(300)
    assert not q2.isActive and q2.exception() is None

    ev = with_epoch_seconds(load_table(spark, sf_oracle, "events"), "ts")
    w = trailing_window("ts_sec", key="user_id", window_seconds=60)
    is_anom, score = spike_dip_score(F.col("value"), w)
    expected = ev.select(
        F.col("event_id").alias("telemetryId"),
        F.concat(F.lit("dev-"), F.col("user_id").cast("string")).alias("deviceId"),
        F.col("ts").alias("enqueuedTime"),
        "value",
        score.alias("Score"),
        is_anom.alias("Anomaly"),
    ).filter(F.col("deviceId").isNotNull())

    def row_set(df, cols):
        return {tuple(r) for r in df.select(*cols).collect()}

    cols = ["telemetryId", "deviceId", "enqueuedTime", "value", "Score", "Anomaly"]
    assert row_set(spark.read.parquet(bronze).drop("batch_id"), cols) == row_set(
        expected, cols
    )
    tcols = [c for c in cols if c != "value"]
    assert row_set(spark.read.parquet(telemetry).drop("batch_id"), tcols) == row_set(
        expected, tcols
    )
    d = spark.read.parquet(devices)
    assert d.groupBy("deviceId").count().filter(F.col("count") > 1).count() == 0
    assert row_set(d, ["deviceId", "firstSeen"]) == row_set(
        expected.groupBy("deviceId").agg(F.min("enqueuedTime").alias("firstSeen")),
        ["deviceId", "firstSeen"],
    )


def test_multi_sink_merge_mode_latest_wins_and_replays_clean(
    spark, replay_dir, tmp_path
):
    """devices_mode="merge": the fan-out's dimension sink is the keyed
    MERGE onto the manifest-committed ACID table — one row per deviceId
    with the LATEST lastSeen (WHEN MATCHED UPDATE, the Delta semantics
    the reference's PK'd table gets from its upsert), and a full replay
    against the existing dimension is idempotent."""
    from azure_iot_realtime_data_pipeline_spark.sources import acid

    bronze = str(tmp_path / "bm")
    devices = str(tmp_path / "dm")
    telemetry = str(tmp_path / "tm")
    for i in range(2):  # fresh checkpoint -> full replay, same dimension
        q = run_multi_sink(
            curated_stream(replay_events(spark, replay_dir)),
            bronze,
            devices,
            telemetry,
            str(tmp_path / f"ckptm{i}"),
            available_now=True,
            devices_mode="merge",
        )
        q.awaitTermination(300)
    d = acid.read_table(spark, devices)
    assert set(d.columns) == {"deviceId", "lastSeen"}
    assert d.groupBy("deviceId").count().filter(F.col("count") > 1).count() == 0
    b = spark.read.parquet(bronze)
    want = {
        (r["deviceId"], r["mx"])
        for r in b.groupBy("deviceId")
        .agg(F.max("enqueuedTime").alias("mx"))
        .collect()
    }
    got = {(r["deviceId"], r["lastSeen"]) for r in d.collect()}
    assert got == want  # LATEST enqueuedTime won, across batches AND replays
    with pytest.raises(ValueError, match="devices_mode"):
        multi_sink_batch_writer(bronze, devices, telemetry, devices_mode="bogus")


def test_devices_upsert_is_first_write_wins(spark, replay_dir, tmp_path):
    """Re-running the stream against an existing dimension adds no rows
    and keeps the original firstSeen (F7 upsert, not append)."""
    bronze = str(tmp_path / "b2")
    devices = str(tmp_path / "d2")
    telemetry = str(tmp_path / "t2")
    for i in range(2):  # fresh checkpoint -> full replay, same dimension dir
        q = run_multi_sink(
            curated_stream(replay_events(spark, replay_dir)),
            bronze,
            devices,
            telemetry,
            str(tmp_path / f"ckpt{i}"),
            available_now=True,
        )
        q.awaitTermination(300)
    d = spark.read.parquet(devices)
    assert d.groupBy("deviceId").count().filter(F.col("count") > 1).count() == 0


def test_push_rows_chunks_and_preserves_order(spark, sf_smoke):
    df = (
        load_table(spark, sf_smoke, "events")
        .orderBy("ts", "event_id")
        .limit(120)
        .select("event_id", "event_type")
    )
    poster = http_sink.CollectingPoster()
    sent = http_sink.push_rows(df, poster, batch_size=50, pace_seconds=0.0)
    assert sent == 120
    assert [len(c) for c in poster.chunks] == [50, 50, 20]
    ids = [int(__import__("json").loads(r)["event_id"]) for r in poster.rows]
    expected = [r["event_id"] for r in df.collect()]
    assert ids == expected


def test_incremental_push_watermark_protocol(spark, sf_smoke, tmp_path):
    """F6: watermark advances only after full success; failed push leaves
    it untouched and the next tick redelivers (at-least-once)."""
    src = str(tmp_path / "fact")
    load_table(spark, sf_smoke, "events").select(
        "event_id", F.col("ts").alias("enqueuedTime"), "value"
    ).write.parquet(src)
    state = str(tmp_path / "wm.json")

    # tick 1: initial load, everything delivered, watermark commits
    ok = http_sink.CollectingPoster()
    n1 = http_sink.incremental_push(
        spark, src, state, ok, initial_load=True, pace_seconds=0.0
    )
    assert n1 == len(ok.rows) > 0
    assert os.path.exists(state)

    # tick 2: nothing new
    n2 = http_sink.incremental_push(spark, src, state, ok, pace_seconds=0.0)
    assert n2 == 0

    # regress the watermark to simulate pending rows, then fail mid-push:
    # state must NOT advance
    wm_before = http_sink.read_watermark(state)
    mid = spark.read.parquet(src).agg(
        F.expr("percentile_approx(enqueuedTime, 0.5)").alias("m")
    ).collect()[0]["m"]
    http_sink.write_watermark(state, mid)
    failing = http_sink.CollectingPoster(fail_times=1)
    with pytest.raises(ConnectionError):
        http_sink.incremental_push(
            spark, src, state, failing, batch_size=100, pace_seconds=0.0
        )
    assert http_sink.read_watermark(state) == http_sink.read_watermark(state)
    assert http_sink.read_watermark(state).replace(tzinfo=None) == mid.replace(tzinfo=None)

    # retry tick: delivers the tail and commits to the true max
    retry = http_sink.CollectingPoster()
    n3 = http_sink.incremental_push(spark, src, state, retry, pace_seconds=0.0)
    assert n3 > 0
    assert http_sink.read_watermark(state) >= wm_before


def test_serve_path_soak_ingest_to_push(spark, sf_oracle, tmp_path):
    """The full serve path end-to-end (r9 verdict #9): events arrive in
    three waves through the multi-sink pipeline (ONE checkpoint — batch
    ids continue across waves, only new files process), with an
    incremental_push tick after each wave, a mid-push POST failure
    injected on the second tick, and a simulated process restart (the
    push path's only state is the watermark file — each tick starts
    from disk). Invariants, per the reference's watermark protocol
    (PushTelemetryFunction.cs:140-157): the watermark is MONOTONE
    across every tick and untouched by the failed one; after the final
    tick the receiver holds EVERY curated row exactly once after
    at-least-once dedup by telemetryId; each tick pushes only rows
    beyond the committed watermark."""
    import shutil
    from datetime import datetime, timezone

    staged = stage_replay_dir(
        spark, sf_oracle, str(tmp_path / "staged"), num_files=6
    )
    live = str(tmp_path / "live")
    os.makedirs(live)
    bronze, devices, telemetry = (
        str(tmp_path / n) for n in ("sb", "sd", "st")
    )
    ckpt = str(tmp_path / "sckpt")
    state = str(tmp_path / "push_state.json")

    def ingest_wave(buckets: list[int]) -> None:
        for b in buckets:
            shutil.copytree(
                os.path.join(staged, f"bucket={b:02d}"),
                os.path.join(live, f"bucket={b:02d}"),
            )
        q = run_multi_sink(
            curated_stream(replay_events(spark, live), history_size=None),
            bronze,
            devices,
            telemetry,
            ckpt,
            available_now=True,
        )
        q.awaitTermination(300)
        assert q.exception() is None

    def wm() -> datetime:
        return http_sink.read_watermark(state)

    received: dict[str, int] = {}

    def absorb(poster: http_sink.CollectingPoster) -> None:
        for r in poster.rows:
            rid = __import__("json").loads(r)["telemetryId"]
            received[rid] = received.get(rid, 0) + 1

    # wave 1: backfill tick (F9 initial load)
    ingest_wave([0, 1])
    p1 = http_sink.CollectingPoster()
    n1 = http_sink.incremental_push(
        spark, telemetry, state, p1, initial_load=True,
        batch_size=1000, pace_seconds=0.0,
    )
    assert n1 == spark.read.parquet(telemetry).count() > 0
    w1 = wm()
    absorb(p1)

    # wave 2: mid-push failure -> watermark untouched -> retry redelivers
    ingest_wave([2, 3])
    fail = http_sink.CollectingPoster(fail_times=2)  # dies on chunk 2
    with pytest.raises(ConnectionError):
        http_sink.incremental_push(
            spark, telemetry, state, fail,
            batch_size=500, pace_seconds=0.0,
        )
    assert wm() == w1  # failed tick committed nothing
    absorb(fail)  # chunk 1 WAS delivered: the at-least-once gap
    # process restart: only the state file carries over
    retry = http_sink.CollectingPoster()
    n2 = http_sink.incremental_push(
        spark, telemetry, state, retry, batch_size=1000, pace_seconds=0.0
    )
    assert n2 > 0
    w2 = wm()
    assert w2 > w1
    # the retry pushed ONLY rows beyond the committed watermark
    for r in retry.rows:
        ts = __import__("json").loads(r)["enqueuedTime"]
        assert datetime.fromisoformat(ts).replace(tzinfo=timezone.utc) > \
            w1.replace(tzinfo=timezone.utc)
    absorb(retry)

    # wave 3: clean tick
    ingest_wave([4, 5])
    p3 = http_sink.CollectingPoster()
    n3 = http_sink.incremental_push(
        spark, telemetry, state, p3, batch_size=1000, pace_seconds=0.0
    )
    assert n3 > 0
    assert wm() > w2
    absorb(p3)

    # completeness: after dedup, the receiver holds exactly the curated set
    want = {
        r["telemetryId"]
        for r in spark.read.parquet(telemetry).select("telemetryId").collect()
    }
    assert set(received) == want
    # the only duplicates are the failed tick's delivered prefix
    dup = {k for k, v in received.items() if v > 1}
    prefix = {
        __import__("json").loads(r)["telemetryId"] for r in fail.rows
    }
    assert dup <= prefix
