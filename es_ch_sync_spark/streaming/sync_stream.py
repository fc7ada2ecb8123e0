"""Structured Streaming variant of the sync pipeline.

The reference runs as a one-shot k8s Job, optionally cron-scheduled weekly
(/root/reference/charts/es-ch-sync/templates/job.yaml:2,
charts/es-ch-sync/values.yaml:23-25), re-scanning from per-token resume
points.  Streaming subsumes that pattern: the SAME transform functions
(unpivot_signals, resolve_tokens, dedup) run over ``readStream``, with

- checkpointing  = the resume logic (sync.go:128-137) for free, exactly-once
- watermark      = bounded state for late data (the reference has no story
                   for late events at all — it re-syncs whole ranges)
- dropDuplicates = ReplacingMergeTree semantics, continuously
  *withinWatermark* so dedup state is bounded (the batch job's dedup key,
  K2, carried into the stream)
- Trigger.AvailableNow = the cron/Job mode: drain everything new, exit.

At scale this is the preferred ingestion mode: no re-scan of already-synced
ranges, state bounded by the watermark horizon, output partitioned the same
way as the batch sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from es_ch_sync_spark.catalog import SignalCatalog
from es_ch_sync_spark.operators.dimjoin import resolve_tokens
from es_ch_sync_spark.operators.transform import unpivot_signals


def read_status_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def build_signal_stream(
    status_stream: DataFrame,
    catalog: SignalCatalog,
    device_dim: DataFrame | None = None,
    subject_col: str = "subject",
    ts_col: str = "time",
    source_col: str = "source",
    watermark: str = "1 hour",
) -> DataFrame:
    """The batch transform, verbatim, over a stream + watermarked dedup.

    dropDuplicatesWithinWatermark keys (token_id, timestamp, name) — the
    ReplacingMergeTree key — so replays/overlaps inside the watermark
    horizon collapse exactly like the reference's merge-on-write, with
    state that expires instead of growing forever."""
    wide = status_stream  # watermark attaches once, post-unpivot (Spark
    # disallows redefining it along the plan)
    if device_dim is not None:
        # stream-static broadcast join: the dimension is re-read per
        # micro-batch (picks up new devices), never shuffles the stream
        wide, _ = resolve_tokens(wide, device_dim, subject_col=subject_col)
        token_col = "token_id"
    else:
        token_col = subject_col
    signals = unpivot_signals(wide, catalog, token_col=token_col, ts_col=ts_col, source_col=source_col)
    # Event-time watermarks require TIMESTAMP (LTZ); sources may deliver
    # TIMESTAMP_NTZ (the testdata parquet does).  The session TZ is pinned
    # UTC so the cast is wall-clock-preserving, and it is a no-op when the
    # column is already LTZ — type drift at the source can't break the
    # watermark path.
    signals = signals.withColumn("timestamp", F.col("timestamp").cast("timestamp"))
    return signals.withWatermark("timestamp", watermark).dropDuplicatesWithinWatermark(
        ["token_id", "timestamp", "name"]
    )


def start_signal_sink(
    signals: DataFrame,
    out_path: str,
    checkpoint_path: str,
    available_now: bool = True,
):
    """Write the signal stream as date-partitioned parquet (same layout as
    the batch sink).  AvailableNow = the reference's cron mode: process all
    new input, then stop; checkpoint carries the resume point."""
    writer = (
        signals.withColumn("event_date", F.to_date("timestamp"))
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .partitionBy("event_date")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
