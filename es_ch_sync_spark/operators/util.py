"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure a compute-heavy map stage has enough partitions to use the
    cluster.

    Small inputs (one parquet file) arrive as 1 split; hashing/shingling
    5k docs on 1 core serializes the whole stage.  The repartition shuffle
    costs little (input is small by construction — that's why it had few
    splits); on real 100 TB inputs the condition is false and this is a
    no-op.  min_partitions defaults to the scheduler's defaultParallelism.

    ONLY call this on scan-stage frames.  The df.rdd partition-count probe
    physically plans the frame, and if the plan contains a broadcast join
    the broadcast (and everything under it) EXECUTES during the probe —
    a computed frame's whole upstream pipeline can run at plan-build time.
    Frames downstream of a shuffle are already cluster-wide anyway.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
