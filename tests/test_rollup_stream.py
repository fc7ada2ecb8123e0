"""Streaming IVM loop: exactly-once fact appends + delta view refresh
across waves, restarts, and replayed batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from es_ch_sync_spark.io.ivm import read_rollup_view
from es_ch_sync_spark.io.txlog import table_history
from es_ch_sync_spark.streaming.rollup_stream import rollup_stream_writer


def _drain(spark, src, ckpt, fact, view):
    q = (
        spark.readStream.schema("k string, v double")
        .parquet(src)
        .writeStream.foreachBatch(rollup_stream_writer(fact, view, ["k"], "v"))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_rollup_exactly_once_and_replay_safe(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    fact = str(tmp_path / "fact")
    view = str(tmp_path / "view")

    def w(rows):
        spark.createDataFrame(rows, "k string, v double").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    w([("a", 1.0), ("a", 2.0), ("b", 10.0)])
    _drain(spark, src, ckpt, fact, view)
    got = {r["k"]: r for r in read_rollup_view(spark, view).collect()}
    assert got["a"]["n_rows"] == 2 and got["a"]["sum_value"] == 3.0
    assert got["b"]["n_rows"] == 1

    # wave 2 through a checkpointed restart: delta refresh, not rebuild
    w([("a", 4.0), ("c", 7.0)])
    _drain(spark, src, ckpt, fact, view)
    got = {r["k"]: r for r in read_rollup_view(spark, view).collect()}
    assert got["a"]["n_rows"] == 3 and got["a"]["sum_value"] == 7.0
    assert got["c"]["sum_value"] == 7.0

    # no new data: a third drain commits nothing and changes nothing
    hist_before = table_history(fact)
    _drain(spark, src, ckpt, fact, view)
    assert table_history(fact) == hist_before

    # REPLAYED batch (driver crash between sink commit and checkpoint
    # write): re-deliver batch 0's data with batch_id 0 — the idempotence
    # watermark must drop it and the view must not double-count
    writer = rollup_stream_writer(fact, view, ["k"], "v")
    replay = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 10.0)], "k string, v double"
    )
    writer(replay, 0)
    got = {r["k"]: r for r in read_rollup_view(spark, view).collect()}
    assert got["a"]["n_rows"] == 3 and got["a"]["sum_value"] == 7.0
    assert got["b"]["n_rows"] == 1
