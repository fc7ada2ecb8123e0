"""Streaming EWMA: state carries across micro-batches AND across a
checkpointed restart, and the final state equals the batch fold exactly."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F
from pyspark.sql import types as T

from es_ch_sync_spark.operators.analytics import ewma_last
from es_ch_sync_spark.streaming.ewma_stream import ewma_stream

BASE = datetime(2024, 3, 1, tzinfo=timezone.utc)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _rows(lo, hi):
    return [
        (i % 3, BASE + timedelta(minutes=i), i, float(i) / 7.0)
        for i in range(lo, hi)
    ]


def _drain(spark, src, ckpt, sink):
    stream = spark.readStream.schema(SCHEMA).format("parquet").load(src)
    q = (
        ewma_stream(stream)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _final_states(spark, sink):
    out = spark.read.parquet(sink)
    w_max = out.groupBy("user_id").agg(F.max("n_obs").alias("n_obs"))
    return {
        (r["user_id"]): (r["n_obs"], r["ewma"])
        for r in out.join(w_max, ["user_id", "n_obs"])
        .select("user_id", "n_obs", F.round("ewma", 6).alias("ewma"))
        .collect()
    }


def test_ewma_state_survives_checkpointed_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    spark.createDataFrame(_rows(0, 40), SCHEMA).coalesce(1).write.parquet(src)
    _drain(spark, src, ckpt, sink)
    # second wave arrives after the first run fully terminated: the
    # recursion must CONTINUE from checkpointed state, not restart
    spark.createDataFrame(_rows(40, 100), SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _drain(spark, src, ckpt, sink)

    got = _final_states(spark, sink)
    batch = spark.createDataFrame(_rows(0, 100), SCHEMA)
    want = {
        r["user_id"]: (r["n_obs"], r["ewma"])
        for r in ewma_last(
            batch, "user_id", ["ts", "event_id"], "value", alpha=0.3
        ).collect()
    }
    assert set(got) == set(want)
    # bit-identical after the common round(6) surface: same IEEE
    # recursion in the same order, continued across the restart
    assert got == want


def test_ewma_stream_emits_monotone_counts(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(_rows(0, 30), SCHEMA).coalesce(1).write.parquet(src)
    _drain(spark, src, str(tmp_path / "c"), str(tmp_path / "s"))
    out = spark.read.parquet(str(tmp_path / "s"))
    # one state row per key per batch; n_obs equals rows seen so far
    assert {r["user_id"] for r in out.collect()} == {0, 1, 2}
    assert all(r["n_obs"] == 10 for r in out.collect())


def _drain_t(spark, src, ckpt, sink):
    stream = spark.readStream.schema(SCHEMA).format("parquet").load(src)
    q = (
        ewma_stream(stream, idle_timeout_seconds=3600)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_idle_timeout_evicts_ewma_state(spark, tmp_path):
    """r4 directive #8: an idle key's state is evicted once the watermark
    passes last_event + timeout; the key restarts its recursion on
    reappearance (n_obs back to 1) instead of extending a fold kept
    forever."""
    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "ewma")

    def w(rows, mode="append"):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(mode).parquet(src)

    # user 1 observes twice at T; then only user 2 traffic far later
    w(
        [(1, BASE, 0, 1.0), (1, BASE + timedelta(minutes=1), 1, 2.0)],
        mode="overwrite",
    )
    _drain_t(spark, src, ckpt, sink)
    w([(2, BASE + timedelta(hours=10), 2, 5.0)])
    _drain_t(spark, src, ckpt, sink)  # watermark advances past T+1h1m
    w([(2, BASE + timedelta(hours=10, minutes=1), 3, 5.0)])
    _drain_t(spark, src, ckpt, sink)  # user 1 times out here (evicted)

    # user 1 reappears: evicted state ⇒ the recursion restarts at n_obs=1
    w([(1, BASE + timedelta(hours=20), 4, 9.0)])
    _drain_t(spark, src, ckpt, sink)
    rows = [
        r
        for r in spark.read.parquet(sink).collect()
        if r["user_id"] == 1
    ]
    by_obs = sorted(r["n_obs"] for r in rows)
    assert by_obs == [1, 2]  # pre-eviction fold (n=2), restarted fold (n=1)
    restarted = [r for r in rows if r["n_obs"] == 1]
    assert restarted[-1]["ewma"] == 9.0  # fresh recursion seeds from x
