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
