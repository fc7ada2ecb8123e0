"""Sinks — signal-table writer with dedup-on-write and date partitioning.

K1/K2: the reference appends batches into a ClickHouse ReplacingMergeTree
keyed (token_id, timestamp, name), which absorbs the deliberate overlap the
resume logic creates at range boundaries
(/root/reference/internal/service/clickhouse/clickhouse.go:113-130,
internal/sync/sync.go:128-137).  On plain Parquet the engine makes that
semantics explicit: ``dropDuplicates`` on the same key before every write
(within-batch idempotency) and, for cross-run idempotency, an anti-join
against the existing table (the batch analog of MERGE).

Scale posture: partition by event date — time-range queries (the engine's
dominant predicate, S3) prune whole partitions; within files, sorting by
(token_id, timestamp) gives parquet row-group min/max stats that serve the
subject/token predicate (S2).  This is the Parquet equivalent of the
ClickHouse ORDER BY (token_id, timestamp, name) primary index [dep].
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEDUP_KEY = ["token_id", "timestamp", "name"]


def dedup_signals(signals: DataFrame, key: list[str] | None = None) -> DataFrame:
    """K2 — last-write-wins dedup on the signal key (ReplacingMergeTree analog)."""
    return signals.dropDuplicates(key or DEDUP_KEY)


def write_signals(
    signals: DataFrame,
    path: str,
    mode: str = "append",
    existing: DataFrame | None = None,
) -> None:
    """K1+K2 — dedup, optionally anti-join already-written keys, write.

    ``existing`` enables idempotent re-runs (reference guarantee: syncing
    the same range twice leaves the table unchanged).  The anti-join is
    key-only (3 narrow columns) so its shuffle is small relative to data.
    """
    out = dedup_signals(signals)
    if existing is not None:
        out = out.join(existing.select(*DEDUP_KEY), on=DEDUP_KEY, how="left_anti")
    out = out.withColumn("event_date", F.to_date("timestamp"))
    (
        out.repartition("event_date")
        .sortWithinPartitions("token_id", "timestamp", "name")
        .write.mode(mode)
        .partitionBy("event_date")
        .parquet(path)
    )


def read_signals(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
