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

Exactly-once lands the same way real Elasticsearch gets it: every row
carries a stable ``_id``, so a crashed-and-retried export that rewrites
the same rows is an idempotent upsert at read time (`read_exported`
keeps one doc per _id — newest file wins, matching ES overwrite
semantics).  The export itself never needs distributed transactions."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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


def export_new_versions(
    spark: SparkSession,
    table: str,
    es_dir: str,
    id_col: str,
    from_version: int | None,
    to_version: int | None = None,
    index: str = "export",
) -> int:
    """Export the rows added in (from_version, to_version] to the
    es_status sink, ``id_col`` becoming the stable ``_id``.  Returns the
    version exported through (the caller's next from_version).  Re-running
    the same range is safe: same rows, same _ids → read-time upsert."""
    import os

    from es_ch_sync_spark.io import txlog as tx
    from es_ch_sync_spark.io.es_datasource import write_es_status

    if to_version is None:
        to_version = tx.current_version(table)
    files = new_files_between(table, from_version, to_version)
    if files:
        df = spark.read.parquet(*[os.path.join(table, f) for f in files])
        write_es_status(
            df.withColumn("es_id", F.col(id_col).cast("string")),
            es_dir,
            mode="append",
            index=index,
        )
    return to_version


def read_exported(
    spark: SparkSession, es_dir: str, schema: str
) -> DataFrame:
    """Read an export dir with ES index semantics: one document per _id
    (the overwrite-by-_id behavior a real index applies at ingest).
    A retried export range rewrites the SAME rows under the same _ids,
    so the surviving doc is well-defined whichever physical copy is
    kept; exporting a CHANGED row under an existing _id requires a
    compaction of the export dir first (out of scope — the reference's
    ES is the system of record for _id collisions, not the file sink)."""
    from es_ch_sync_spark.io.es_datasource import read_es_status

    return read_es_status(spark, es_dir, schema).dropDuplicates(["es_id"])
