"""Streaming Page-Hinkley: the four-integer state carries across
micro-batches AND a checkpointed restart, and the final state equals the
batch operator's last row per key exactly."""

from __future__ import annotations

from datetime import date, datetime, timedelta, timezone

from pyspark.sql import functions as F
from pyspark.sql import types as T

from es_ch_sync_spark.operators.analytics import page_hinkley_daily
from es_ch_sync_spark.streaming.drift_stream import page_hinkley_stream

BASE = datetime(2024, 3, 1, tzinfo=timezone.utc)

SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _rows(lo, hi):
    # two keys; key "b" jumps to a higher level halfway — a genuine drift
    out = []
    for i in range(lo, hi):
        out.append(("a", BASE + timedelta(days=i), 10.0 + (i % 3)))
        out.append(
            ("b", BASE + timedelta(days=i), 10.0 if i < 30 else 200.0)
        )
    return out


def _drain(spark, src, ckpt, sink):
    stream = spark.readStream.schema(SCHEMA).format("parquet").load(src)
    q = (
        page_hinkley_stream(stream, "key", "ts", "value", lam=50.0)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _final(spark, sink):
    out = spark.read.parquet(sink)
    mx = out.groupBy("key").agg(F.max("n_obs").alias("n_obs"))
    return {
        r["key"]: (r["n_obs"], r["ph_stat"], r["alarm"])
        for r in out.join(mx, ["key", "n_obs"]).collect()
    }


def test_ph_stream_matches_batch_across_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    spark.createDataFrame(_rows(0, 25), SCHEMA).coalesce(1).write.parquet(src)
    _drain(spark, src, ckpt, sink)
    spark.createDataFrame(_rows(25, 60), SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _drain(spark, src, ckpt, sink)

    got = _final(spark, sink)
    # batch analog: one value per (key, day) — page_hinkley_daily's last
    # row per key carries the same exact-integer recursion endpoint
    daily = spark.createDataFrame(_rows(0, 60), SCHEMA).select(
        "key", F.to_date("ts").alias("day"), F.col("value").alias("y")
    )
    batch = page_hinkley_daily(daily, "key", "day", "y", lam=50.0)
    last = {
        r["key"]: (r["ph_stat"], r["alarm"])
        for r in batch.join(
            batch.groupBy("key").agg(F.max("day").alias("day")),
            ["key", "day"],
        ).collect()
    }
    assert set(got) == {"a", "b"}
    for k in got:
        n, ph, alarm = got[k]
        assert n == 60
        assert (round(ph, 6), alarm) == (round(last[k][0], 6), last[k][1])
    # the drifted key alarms, the stable key does not
    assert got["b"][2] is True and got["a"][2] is False


def test_ph_stream_half_up_boundary_matches_batch(spark, tmp_path):
    """Micro terms can land exactly on .5 (n·x − Σx ≡ n/2 mod n); the
    stream's fold must round HALF_UP like the batch operator's F.round,
    not Python's half-even."""
    rows = [
        ("k", BASE + timedelta(days=i), v / 1e6)
        for i, v in enumerate([0, 1, 0, 1, 0, 1, 0, 1])
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(src)
    _drain(spark, src, str(tmp_path / "c"), str(tmp_path / "s"))
    got = _final(spark, str(tmp_path / "s"))["k"]
    daily = spark.createDataFrame(rows, SCHEMA).select(
        "key", F.to_date("ts").alias("day"), F.col("value").alias("y")
    )
    batch = page_hinkley_daily(daily, "key", "day", "y", lam=50.0)
    last = batch.orderBy(F.col("day").desc()).limit(1).collect()[0]
    assert (round(got[1], 6), got[2]) == (
        round(last["ph_stat"], 6),
        last["alarm"],
    )
