"""Bucketed tables — pre-shuffled storage for shuffle-free joins and aggs.

The engine's dominant keys are `token_id` (signal table, dimension joins,
resume aggregation) and `vec_id` (embedding similarity).  At 100 TB, every
join or groupBy on those keys costs a full-table exchange UNLESS the table
is stored already hash-distributed on the key.  Spark's bucketing
(`bucketBy(n, key)` + `saveAsTable`) records that distribution in the
catalog; scans of the table then report HashPartitioning(key, n) as their
output partitioning, and Catalyst drops the Exchange on:

- bucketed ⋈ bucketed on the bucket key with equal bucket counts
  (sort-merge join with zero shuffle on both sides),
- groupBy(bucket_key) (partial+final aggregation collapses into one stage),
- bucketed ⋈ unbucketed (only the unbucketed side shuffles).

This is the Spark-native replacement for the reference's "pre-sorted by
(token_id, timestamp, name)" ClickHouse primary index [dep] — the layout
work is paid once at write time, amortized over every subsequent query.
The `sortBy` clause additionally sorts within buckets, so sort-merge joins
skip their sort too.

Bucket-count choice at 100 TB: target ~128-512 MB per bucket-file per
partition; with date partitioning on top, `n_buckets` in the low thousands
keeps files in that band and parallelism at cluster width.  Locally the
tests use small counts — the plan shape (no Exchange) is identical.

Plan-shape verification lives in tests/test_bucketed.py: it asserts the
executed plan of a bucketed self-join and a bucketed groupBy contain no
Exchange operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save ``df`` as a bucketed external parquet table.

    Bucketing metadata lives in the session catalog (saveAsTable is
    required — a bare .parquet(path) write cannot record the distribution);
    ``path`` keeps the data external so the files outlive the catalog."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table through the catalog (spark.table — a
    path-based read would lose the bucketing metadata and the
    shuffle-free plans with it)."""
    return spark.table(table)


def bucketed_signal_store(
    signals: DataFrame,
    table: str,
    path: str,
    n_buckets: int = 8,
    ts_col: str = "timestamp",
) -> DataFrame:
    """Materialize the tall signal table bucketed+sorted by token_id.

    After this, resume_points (groupBy token_id), the device-dimension
    join, and signal⋈signal self-joins on token_id all plan without an
    Exchange on the signal side."""
    sort_cols = ["token_id"] + ([ts_col] if ts_col in signals.columns else [])
    write_bucketed(
        signals,
        table,
        path,
        bucket_col="token_id",
        n_buckets=n_buckets,
        sort_cols=sort_cols,
    )
    return read_bucketed(signals.sparkSession, table)
