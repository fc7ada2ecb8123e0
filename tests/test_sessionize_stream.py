"""Stateful streaming sessionization e2e: sessions close on gap across
micro-batches, the open session persists in GroupState between runs."""

from __future__ import annotations

import os

from datetime import datetime, timedelta, timezone

from pyspark.sql import types as T

from es_ch_sync_spark.streaming.sessionize_stream import sessionize_stream

BASE = datetime(2024, 1, 1, tzinfo=timezone.utc)

EVENT_SCHEMA = T.StructType(
    [T.StructField("user_id", T.LongType()), T.StructField("ts", T.TimestampType())]
)


def _drain(spark, src_dir: str, ckpt: str, sink: str):
    stream = spark.readStream.schema(EVENT_SCHEMA).format("parquet").load(src_dir)
    sessions = sessionize_stream(stream, gap_seconds=3600)
    q = (
        sessions.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stateful_session_stream(spark, tmp_path):
    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sessions")

    # wave 1: user 1 has a burst at T..T+10min, then another at T+3h..+3h5m.
    # The first session closes (gap 3h > 1h); the second stays OPEN in state.
    wave1 = [
        (1, BASE + timedelta(minutes=m)) for m in (0, 5, 10)
    ] + [
        (1, BASE + timedelta(hours=3, minutes=m)) for m in (0, 5)
    ]
    spark.createDataFrame(wave1, EVENT_SCHEMA).coalesce(1).write.parquet(src)
    _drain(spark, src, ckpt, sink)

    got1 = spark.read.parquet(sink).collect()
    assert len(got1) == 1
    assert got1[0]["n_events"] == 3
    assert got1[0]["session_start"] == BASE.replace(tzinfo=None)
    assert got1[0]["session_end"] == (BASE + timedelta(minutes=10)).replace(tzinfo=None)

    # wave 2 (checkpointed restart): an event at T+7h closes the open
    # session (3h..3h05); within-gap events would instead extend it.
    wave2 = [(1, BASE + timedelta(hours=7))]
    spark.createDataFrame(wave2, EVENT_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, sink)

    got2 = sorted(spark.read.parquet(sink).collect(), key=lambda r: r["session_start"])
    assert len(got2) == 2
    assert got2[1]["n_events"] == 2  # the T+3h session, closed by the T+7h event
    assert got2[1]["session_end"] == (BASE + timedelta(hours=3, minutes=5)).replace(tzinfo=None)


def _drain_t(spark, src_dir: str, ckpt: str, sink: str):
    stream = spark.readStream.schema(EVENT_SCHEMA).format("parquet").load(src_dir)
    sessions = sessionize_stream(stream, gap_seconds=3600, idle_timeout_seconds=3600)
    q = (
        sessions.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_idle_timeout_flushes_and_evicts_state(spark, tmp_path):
    """r4 directive #8 — state-size discipline: an idle key's open session
    is flushed once the watermark passes last_event + timeout, and the
    key's state is DELETED (a later event starts a fresh session instead
    of closing the old one a second time)."""
    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sessions")

    def w(rows, mode="append"):
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(mode).parquet(src)

    # wave 1: user 1 burst — one OPEN session, nothing emitted
    w([(1, BASE + timedelta(minutes=m)) for m in (0, 5, 10)], mode="overwrite")
    _drain_t(spark, src, ckpt, sink)
    assert not os.path.isdir(sink) or not [
        p for p in os.listdir(sink) if p.startswith("part-")
    ] or spark.read.parquet(sink).count() == 0

    # wave 2: another key far in the future advances the watermark
    w([(2, BASE + timedelta(hours=10))])
    _drain_t(spark, src, ckpt, sink)

    # wave 3: any new data triggers timeout evaluation against the
    # advanced watermark — user 1 (idle since T+10m, timeout T+1h10m)
    # must flush now
    w([(2, BASE + timedelta(hours=10, minutes=1))])
    _drain_t(spark, src, ckpt, sink)
    got = [r for r in spark.read.parquet(sink).collect() if r["user_id"] == 1]
    assert len(got) == 1
    assert got[0]["n_events"] == 3
    assert got[0]["session_end"] == (BASE + timedelta(minutes=10)).replace(tzinfo=None)

    # wave 4: user 1 reappears much later.  Evicted state ⇒ fresh OPEN
    # session, NO second emission of the old one (a surviving state would
    # close old-session again here → duplicate)
    w([(1, BASE + timedelta(hours=20))])
    _drain_t(spark, src, ckpt, sink)
    got = [r for r in spark.read.parquet(sink).collect() if r["user_id"] == 1]
    assert len(got) == 1  # still exactly one closed session for user 1
