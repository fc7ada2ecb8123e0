"""Reverse sync: incremental export of a txlog table INTO an ES-shaped
sink — the mirror image of the reference job (it drains ES into
ClickHouse, `internal/app/sync.go`; a production deployment eventually
needs the other direction too: backfilling a search index from the
warehouse table of record).

Incrementality is VERSION-DIFF, not timestamp-watermark: the txlog
already records exactly which data files each commit added, so "what's
new since the last export" is the union of ``add`` lists in the version
range — no scan of old data, no reliance on event-time ordering (the
reference's resume-at-oldest-timestamp must over-read the boundary and
lean on dedup; a version diff reads precisely the new bytes).

DML lands with real ES semantics, not append-only fiction:

- every exported row carries ``_export_ver`` (the txlog version the
  export ran through), so a later export of a txlog_update'd row WINS
  deterministically at read time (``max_by`` per ``_id``) — the ES
  overwrite-by-_id behavior;
- a txlog_delete'd row is exported as a TOMBSTONE (``_export_deleted``)
  under the same ``_id`` — the ES delete action — computed exactly as
  ids present in the range's removed files but absent from its
  still-live added files (copy-on-write rewrites survivors forward, so
  the difference is precisely the deleted set);
- a crashed-and-retried export rewrites the same rows and tombstones at
  the same version → idempotent upsert, no distributed transaction.

Exports whose range crosses a txlog truncate (vacuumed history) raise
loudly instead of silently under-exporting — re-run a full export."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class ExportHistoryError(RuntimeError):
    """The requested version range's history is not reconstructible
    (truncated log or vacuumed data files): run a full export
    (from_version=None) into a fresh sink directory instead."""


def new_files_between(table: str, from_version: int | None, to_version: int) -> list[str]:
    """Table-relative data files ADDED in versions (from_version,
    to_version] and still live at to_version — the incremental read set.
    from_version None = everything live at to_version (first export)."""
    from es_ch_sync_spark.io import txlog as tx

    live = set(tx.snapshot_files(table, to_version))
    if from_version is None:
        return sorted(live)
    added: set[str] = set()
    for v in tx._versions(table):
        if from_version < v <= to_version:
            added.update(tx._read_entry(table, v).get("add", []))
    return sorted(added & live)


def deleted_ids_between(
    spark: SparkSession,
    table: str,
    id_col: str,
    from_version: int,
    to_version: int,
) -> DataFrame:
    """Distinct ids DELETED in (from_version, to_version]: ids occurring
    in the range's removed files but not in its surviving added files.
    Copy-on-write rewrites every survivor of a touched file into a new
    add, so the set difference is exactly the deleted rows (an id both
    added and removed inside the range tombstones a doc that was never
    exported — a no-op delete at the sink, like ES).  Cost is bounded by
    the rewritten files, never the table."""
    import os

    from es_ch_sync_spark.io import txlog as tx

    removed: set[str] = set()
    added: set[str] = set()
    for v in tx._versions(table):
        if from_version < v <= to_version:
            e = tx._read_entry(table, v)
            if e.get("op") == "truncate":
                raise ExportHistoryError(
                    f"txlog {table} truncated at v{v} inside export range "
                    f"({from_version}, {to_version}]"
                )
            removed.update(e.get("remove", []))
            added.update(e.get("add", []))
    live = set(tx.snapshot_files(table, to_version))
    removed -= added  # files both added+removed in range: survivors are in later adds
    if not removed:
        return spark.createDataFrame([], T.StructType([T.StructField(id_col, T.StringType())]))
    paths = [os.path.join(table, f) for f in sorted(removed)]
    for p in paths:
        if not os.path.exists(p):
            raise ExportHistoryError(
                f"removed file {p} vacuumed from disk; deleted-id set for "
                f"({from_version}, {to_version}] is not reconstructible"
            )
    old_ids = spark.read.parquet(*paths).select(
        F.col(id_col).cast("string").alias(id_col)
    )
    new_paths = [os.path.join(table, f) for f in sorted(added & live)]
    if not new_paths:
        return old_ids.distinct()
    new_ids = spark.read.parquet(*new_paths).select(
        F.col(id_col).cast("string").alias(id_col)
    )
    # left_anti on the id: both sides are just-rewritten files, so this is
    # a bounded hash join keyed on the id, not a table scan
    return old_ids.distinct().join(new_ids.distinct(), id_col, "left_anti")


def export_new_versions(
    spark: SparkSession,
    table: str,
    es_dir: str,
    id_col: str,
    from_version: int | None,
    to_version: int | None = None,
    index: str = "export",
) -> int:
    """Export the rows added — and the delete tombstones implied — in
    (from_version, to_version] to the es_status sink, ``id_col`` becoming
    the stable ``_id``.  Returns the version exported through (the
    caller's next from_version).  Re-running the same range is safe:
    same rows, same _ids, same ``_export_ver`` → read-time upsert.

    A full export (``from_version=None``) emits NO tombstones — it only
    knows the live snapshot, not what used to exist — so it MUST land in
    a FRESH sink directory: re-exporting into a sink that already holds
    older versions would resurrect previously exported, since-deleted
    docs (their old rows stay newest-for-_id with no superseding delete).

    Ordering: the tombstone set (and with it the truncate/vacuum history
    check) is computed and VALIDATED before any data file is written, so
    an export whose range crosses a truncate raises before it has dirtied
    the sink — not after a partial write at the new ``_export_ver``."""
    import os

    from es_ch_sync_spark.io import txlog as tx
    from es_ch_sync_spark.io.es_datasource import write_es_status

    if to_version is None:
        to_version = tx.current_version(table)
    files = new_files_between(table, from_version, to_version)
    tombs = None
    if from_version is not None:
        # May raise ExportHistoryError — deliberately BEFORE the data write.
        tombs = deleted_ids_between(
            spark, table, id_col, from_version, to_version
        ).select(
            F.col(id_col).cast("string").alias("es_id"),
            F.lit(to_version).cast("long").alias("_export_ver"),
            F.lit(True).alias("_export_deleted"),
        )
    if files:
        df = spark.read.parquet(*[os.path.join(table, f) for f in files])
        write_es_status(
            df.withColumn("es_id", F.col(id_col).cast("string"))
            .withColumn("_export_ver", F.lit(to_version).cast("long"))
            .withColumn("_export_deleted", F.lit(False)),
            es_dir,
            mode="append",
            index=index,
        )
    if tombs is not None:
        # Written unconditionally: an empty write is a no-op for the sink,
        # and probing emptiness first (limit(1).count()) would materialize
        # the removed/added-file anti-join twice per incremental export.
        write_es_status(tombs, es_dir, mode="append", index=index)
    return to_version


def read_exported(
    spark: SparkSession, es_dir: str, schema: str
) -> DataFrame:
    """Read an export dir with ES index semantics: one document per _id,
    NEWEST EXPORT WINS (``max_by`` on ``_export_ver`` — a deterministic
    overwrite, not an arbitrary dropDuplicates survivor), and documents
    whose newest record is a delete tombstone are gone.  Pre-versioning
    exports (no ``_export_ver`` field in ``_source``) read as version -1
    — any versioned re-export supersedes them.  Plan shape: one hash
    aggregate keyed on _id; no sort, no window."""
    from es_ch_sync_spark.io.es_datasource import read_es_status

    base = T.StructType.fromDDL(schema) if isinstance(schema, str) else schema
    full = T.StructType(
        list(base.fields)
        + [
            T.StructField("_export_ver", T.LongType()),
            T.StructField("_export_deleted", T.BooleanType()),
        ]
    )
    df = read_es_status(spark, es_dir, full)
    payload = [f.name for f in base.fields if f.name != "es_id"]
    newest = (
        df.withColumn("_v", F.coalesce(F.col("_export_ver"), F.lit(-1)))
        .groupBy("es_id")
        .agg(
            F.max_by(
                F.struct(
                    F.coalesce(F.col("_export_deleted"), F.lit(False)).alias(
                        "_export_deleted"
                    ),
                    *[F.col(c) for c in payload],
                ),
                F.col("_v"),
            ).alias("_doc")
        )
    )
    return newest.filter(~F.col("_doc._export_deleted")).select(
        "es_id", *[F.col(f"_doc.{c}").alias(c) for c in payload]
    )
