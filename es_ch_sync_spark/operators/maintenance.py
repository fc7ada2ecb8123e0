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
