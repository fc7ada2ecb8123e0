"""End-to-end test of the streaming sync: files arrive in two waves (the
second overlapping the first), the stream produces the deduped signal table
and resumes from its checkpoint — the reference's resume+merge semantics
(sync.go:128-137 + ReplacingMergeTree) carried by checkpoint + watermark."""

from __future__ import annotations

import time

from es_ch_sync_spark.catalog import DEVICE_STATUS_CATALOG
from es_ch_sync_spark.fixtures import DEVICE_STATUS_SCHEMA, device_dim_df, device_status_df
from es_ch_sync_spark.streaming.sync_stream import (
    build_signal_stream,
    read_status_stream,
    start_signal_sink,
)

S, R = 4, 50
K = len(DEVICE_STATUS_CATALOG)


def _write_wave(spark, src_dir: str, seed: int, subdir: str):
    df = device_status_df(spark, subjects=S, rows_per_subject=R, malformed_every=0, seed=seed)
    df.coalesce(1).write.mode("overwrite").parquet(f"{src_dir}/{subdir}")


def test_streaming_sync_dedup_and_resume(spark, tmp_path):
    src = str(tmp_path / "incoming")
    out = str(tmp_path / "signals")
    ckpt = str(tmp_path / "ckpt")

    # wave 1
    wave1 = device_status_df(spark, subjects=S, rows_per_subject=R, malformed_every=0, seed=1)
    wave1.coalesce(1).write.parquet(src)

    dim = device_dim_df(spark, subjects=S)
    stream = read_status_stream(spark, src, DEVICE_STATUS_SCHEMA)
    signals = build_signal_stream(stream, DEVICE_STATUS_CATALOG, dim)
    q = start_signal_sink(signals, out, ckpt, available_now=True)
    q.awaitTermination(120)

    got1 = spark.read.parquet(out)
    assert got1.count() == S * R * K  # 4*50*18
    assert got1.select("token_id", "timestamp", "name").distinct().count() == S * R * K

    # wave 2: identical data re-delivered (full overlap, inside watermark)
    # plus checkpointed restart — dedup must absorb the replay
    wave1.coalesce(1).write.mode("append").parquet(src)
    stream2 = read_status_stream(spark, src, DEVICE_STATUS_SCHEMA)
    signals2 = build_signal_stream(stream2, DEVICE_STATUS_CATALOG, dim)
    q2 = start_signal_sink(signals2, out, ckpt, available_now=True)
    q2.awaitTermination(120)
    time.sleep(1)

    got2 = spark.read.parquet(out)
    # the replayed rows carry the same (token_id, timestamp, name) keys and
    # fall inside the watermark → dropDuplicatesWithinWatermark absorbs them
    assert got2.select("token_id", "timestamp", "name").distinct().count() == S * R * K
    assert got2.count() == S * R * K


def test_streaming_document_dedup(spark, tmp_path):
    """Content-duplicate documents re-delivered across waves (different
    ids, same text) must be absorbed by the streaming fingerprint dedup;
    distinct contents all survive."""
    from pyspark.sql import functions as F

    from es_ch_sync_spark.streaming.dedup_stream import dedup_document_stream

    src = str(tmp_path / "docs_in")
    out = str(tmp_path / "docs_out")
    ckpt = str(tmp_path / "docs_ckpt")

    base = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body number "), (F.col("id") % 25).cast("string")).alias(
            "text"
        ),  # 25 distinct contents across 40 rows
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ingest_ts"),
    )
    base.coalesce(1).write.parquet(src)
    # replay wave: same contents, new ids, 10 min later (inside watermark)
    base.select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        "text",
        (F.col("ingest_ts") + F.expr("INTERVAL 10 MINUTES")).alias("ingest_ts"),
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string, ingest_ts timestamp")
        .format("parquet")
        .load(src)
    )
    deduped = dedup_document_stream(stream, watermark="1 hour")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    assert got.select("fp").distinct().count() == 25
    assert got.count() == 25  # exactly one survivor per content


def test_streaming_ntz_event_time(spark, tmp_path):
    """Watermark path must survive TIMESTAMP_NTZ event time — the exact
    type the driver testdata parquet carries.  The NTZ→LTZ normalization
    happens inside build_signal_stream; the test supplies raw NTZ input
    and asserts the stream runs and dedups without any casting help."""
    from pyspark.sql import types as T

    from es_ch_sync_spark.catalog import SignalCatalog, SignalDef

    src = str(tmp_path / "ntz_src")
    wide = spark.sql(
        """
        SELECT id AS subject,
               timestamp_ntz'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS time,
               double(id) AS speed,
               'ntz' AS src
        FROM range(20)
        """
    )
    assert isinstance(wide.schema["time"].dataType, T.TimestampNTZType)
    wide.coalesce(1).write.parquet(src)
    # replay the same rows a second time: watermark dedup must absorb them
    wide.coalesce(1).write.mode("append").parquet(src)

    cat = SignalCatalog([SignalDef("speed", "speed", "number")])
    stream = read_status_stream(spark, src, wide.schema)
    signals = build_signal_stream(
        stream, cat, device_dim=None, subject_col="subject", ts_col="time", source_col="src"
    )
    assert isinstance(signals.schema["timestamp"].dataType, T.TimestampType)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = start_signal_sink(signals, out, ckpt, available_now=True)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 20  # replay deduped


def test_streaming_sync_through_es_status_connector(spark, tmp_path):
    """The reference's FULL continuous loop through the custom connector:
    status docs exported as ES hit NDJSON → readStream
    format("es_status") (file-offset micro-batches) → dim join + unpivot
    + watermark dedup → parquet sink; the result must equal the batch
    transform over the same documents."""
    from es_ch_sync_spark.fixtures import device_dim_df, device_status_df
    from es_ch_sync_spark.io.es_datasource import write_es_status
    from es_ch_sync_spark.io.es_datasource import read_es_status_stream
    from es_ch_sync_spark.operators.dimjoin import resolve_tokens
    from es_ch_sync_spark.operators.transform import unpivot_signals

    src = str(tmp_path / "es_export")
    out = str(tmp_path / "signals")
    ckpt = str(tmp_path / "ckpt")

    docs = device_status_df(
        spark, subjects=S, rows_per_subject=20, malformed_every=0, seed=3
    ).drop("is_malformed")
    write_es_status(docs.withColumn("es_id", docs["id"]), src, mode="overwrite")

    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                    for f in docs.schema.fields)
    dim = device_dim_df(spark, subjects=S)
    stream = read_es_status_stream(spark, src, ddl)
    signals = build_signal_stream(stream, DEVICE_STATUS_CATALOG, dim)
    q = start_signal_sink(signals, out, ckpt, available_now=True)
    q.awaitTermination(120)

    got = spark.read.parquet(out).drop("event_date")
    resolved, _ = resolve_tokens(docs, dim)
    want = unpivot_signals(
        resolved, DEVICE_STATUS_CATALOG, token_col="token_id",
        ts_col="time", source_col="source",
    ).dropDuplicates(["token_id", "timestamp", "name"])
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
