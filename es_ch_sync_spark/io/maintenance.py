"""Table maintenance: upsert (MERGE analog) and small-file compaction on
plain partitioned Parquet.

At 100 TB these are the operations that keep the signal table healthy:
continuous ingestion produces overlapping keys (upsert) and many small
files per partition (compaction).  Delta/Iceberg provide these as table
services; on plain Parquet they are two careful plan shapes:

- **Upsert** rewrites ONLY the partitions the update batch touches
  (``partitionOverwriteMode=dynamic``): read those partitions, anti-join
  the old rows that are being replaced, union the updates, overwrite in
  place.  Work scales with touched partitions, not table size.
- **Compaction** rewrites a partition's many small files into
  size-targeted files, preserving the (token_id, timestamp, name) sort
  that gives parquet row-group stats their pruning power.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from es_ch_sync_spark.io.sinks import DEDUP_KEY


def upsert_signals(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    key: list[str] | None = None,
) -> None:
    """MERGE-on-key into a date-partitioned signal table (last-write-wins).

    Equivalent to ``MERGE INTO t USING u ON key WHEN MATCHED UPDATE WHEN
    NOT MATCHED INSERT``.  Only partitions present in ``updates`` are
    rewritten; everything else is untouched (dynamic partition overwrite).
    """
    key = key or DEDUP_KEY
    up = updates.withColumn("event_date", F.to_date("timestamp")).dropDuplicates(key)

    existing = spark.read.parquet(table_path)
    touched = [r["event_date"] for r in up.select("event_date").distinct().collect()]
    existing_touched = existing.filter(F.col("event_date").isin(touched))

    kept = existing_touched.join(up.select(*key), on=key, how="left_anti")
    merged = kept.unionByName(up.select(*kept.columns))

    (
        merged.repartition("event_date")
        .sortWithinPartitions(*DEDUP_KEY)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_date")
        .parquet(table_path)
    )


def compact_partition(
    spark: SparkSession,
    table_path: str,
    partition_value: str,
    target_files: int = 1,
    partition_col: str = "event_date",
) -> None:
    """Rewrite one partition's files into ``target_files`` sorted files.

    Per-partition scope keeps the rewrite bounded and restartable; the sort
    restores row-group min/max locality for (token_id, timestamp) pruning."""
    df = spark.read.parquet(table_path).filter(F.col(partition_col) == partition_value)
    (
        df.repartition(target_files)
        .sortWithinPartitions(*DEDUP_KEY)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(table_path)
    )


ROLLUP_KEY = ["token_id", "day", "name"]


def build_daily_rollup(signals: DataFrame) -> DataFrame:
    """Daily continuous-aggregate over the tall signal table:
    (token, day, name) → count / min / max / sum — the 'hypertable rollup'
    read-model for dashboard-style queries.

    All aggregates here are decomposable (count/min/max/sum), which is what
    makes INCREMENTAL maintenance possible: the rollup of (old ∪ delta)
    equals the pairwise merge of their rollups."""
    return signals.groupBy(
        F.col("token_id"), F.to_date("timestamp").alias("day"), F.col("name")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value_number").alias("v_min"),
        F.max("value_number").alias("v_max"),
        F.sum(F.col("value_number").cast("decimal(18,4)")).cast("double").alias("v_sum"),
    )


def maintain_daily_rollup(
    spark: SparkSession,
    rollup_path: str,
    signals_delta: DataFrame,
) -> None:
    """Incrementally fold a signal delta into a materialized daily rollup.

    The continuous-aggregate pattern: aggregate ONLY the delta, merge with
    the existing rollup rows for the touched (day) partitions, rewrite just
    those partitions (dynamic overwrite).  Work scales with the delta's
    day-span, not table history — the batch analog of a streaming windowed
    aggregation with state in the table itself."""
    delta = build_daily_rollup(signals_delta)

    import os

    if not os.path.exists(rollup_path):
        (
            delta.repartition("day")
            .write.mode("overwrite")
            .partitionBy("day")
            .parquet(rollup_path)
        )
        return

    existing = spark.read.parquet(rollup_path)
    touched = [r["day"] for r in delta.select("day").distinct().collect()]
    merged = (
        existing.filter(F.col("day").isin(touched))
        .unionByName(delta)
        .groupBy(*ROLLUP_KEY)
        .agg(
            F.sum("n").alias("n"),
            F.min("v_min").alias("v_min"),
            F.max("v_max").alias("v_max"),
            F.sum("v_sum").alias("v_sum"),
        )
    )
    (
        merged.repartition("day")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(rollup_path)
    )


def table_file_stats(spark: SparkSession, table_path: str) -> DataFrame:
    """Files-per-partition + bytes profile — the compaction trigger signal."""
    df = spark.read.parquet(table_path)
    return (
        df.withColumn("_file", F.input_file_name())
        .groupBy("event_date")
        .agg(
            F.countDistinct("_file").alias("n_files"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("event_date")
    )
