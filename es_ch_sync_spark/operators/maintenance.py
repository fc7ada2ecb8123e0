"""A1/A2/A3/P4 — maintenance queries over the signal table.

The reference issues these as ClickHouse SQL round-trips
(/root/reference/internal/service/clickhouse/clickhouse.go:65-110) — one
top-1 query *per token* for resume points and one DISTINCT scan for token
discovery.  The Spark translation collapses the N per-token round-trips into
ONE partial-aggregated job (`groupBy(token).agg(min(ts))`): map-side combine
means the shuffle carries at most (#tokens × #partitions) rows, so it scales
with cardinality, not data volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def oldest_signal_ts(
    signals: DataFrame,
    token_id: int,
    names: list[str] | None = None,
    token_col: str = "token_id",
    ts_col: str = "timestamp",
    name_col: str = "name",
) -> DataFrame:
    """A1 — oldest synced timestamp for one token (resume point).

    SELECT timestamp FROM signal WHERE token_id=? [AND name IN (...)]
    ORDER BY timestamp ASC LIMIT 1  (clickhouse.go:65-87).
    min() ≡ order-by-asc-limit-1 on a single column; the agg form is the
    scalable plan (partial min per partition, single-row result).
    """
    out = signals.filter(F.col(token_col) == token_id)
    if names:
        out = out.filter(F.col(name_col).isin(names))
    return out.agg(F.min(ts_col).alias("timestamp"))


def distinct_tokens(
    signals: DataFrame, token_col: str = "token_id", descending: bool = True
) -> DataFrame:
    """A2+A3 — SELECT DISTINCT token_id (clickhouse.go:89-110), processed
    newest-id-first (sync.go:219-220).  Partial-agg distinct: shuffle
    carries unique ids only."""
    out = signals.select(token_col).distinct()
    return out.orderBy(F.col(token_col).desc() if descending else F.col(token_col).asc())


def resume_points(
    signals: DataFrame,
    token_col: str = "token_id",
    ts_col: str = "timestamp",
) -> DataFrame:
    """P4 — per-token incremental watermark, all tokens in one job.

    Replaces the reference's per-token getStopTime loop (sync.go:128-137):
    the next backfill for each token covers [global_start, min(ts)) — the
    deliberate boundary overlap is absorbed by dedup-on-write (K2), same as
    the reference's ReplacingMergeTree."""
    return signals.groupBy(token_col).agg(
        F.min(ts_col).alias("min_ts"), F.max(ts_col).alias("max_ts")
    )


def merge_resume_points(
    summary: DataFrame | None,
    batch_points: DataFrame,
    token_col: str = "token_id",
) -> DataFrame:
    """CDC-style maintenance of the resume-point summary: fold one batch's
    per-token (min_ts, max_ts) into the running summary.

    min/max are decomposable, so summary(old ∪ batch) ≡ merge of the two
    summaries — each ingest batch costs O(batch + |summary|) instead of a
    full-table rescan (the reference re-queries ClickHouse per token per
    run, clickhouse.go:65-87).  At 100 TB the summary is #tokens rows (tiny)
    while the signal table is the 100 TB — recomputing resume_points from
    scratch every batch would be the single most wasteful scan in the
    system."""
    if summary is None:
        return batch_points
    return (
        summary.unionByName(batch_points)
        .groupBy(token_col)
        .agg(F.min("min_ts").alias("min_ts"), F.max("max_ts").alias("max_ts"))
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Keyed CDC diff between two table snapshots: one row per key whose
    state changed, labeled added / removed / updated.

    One full-outer join on the key (the only shuffle, both sides keyed) +
    a null-pattern CASE; unchanged keys are filtered out, so the output is
    change-volume-sized, not table-sized.  At 100 TB both snapshots shuffle
    once on the same key — co-partitioned (bucketed) snapshots make it
    shuffle-free.  This is the feed a downstream incremental consumer
    (rollup maintenance, index refresh, cache invalidation) reads instead
    of re-scanning the table — the batch analog of a CDC change feed.

    Output: key_cols + change_type + old_/new_ for each compare col."""
    o = old.select(key_cols + compare_cols).withColumn("_in_old", F.lit(1))
    n = new.select(key_cols + compare_cols).withColumn("_in_new", F.lit(1))
    for c in compare_cols:
        o = o.withColumnRenamed(c, f"old_{c}")
        n = n.withColumnRenamed(c, f"new_{c}")
    j = o.join(n, on=key_cols, how="full_outer")
    # presence markers, not value-null checks — a legitimately NULL compare
    # column must not read as an absent row
    in_old = F.col("_in_old").isNotNull()
    in_new = F.col("_in_new").isNotNull()
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change_type = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .otherwise(F.lit("updated"))
    )
    return (
        j.withColumn("change_type", change_type)
        .filter((~in_old) | (~in_new) | changed)
        .select(
            *key_cols,
            "change_type",
            *[f"old_{c}" for c in compare_cols],
            *[f"new_{c}" for c in compare_cols],
        )
    )
