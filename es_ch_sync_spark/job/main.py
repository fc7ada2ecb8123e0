"""CLI entrypoint — the reference's `cmd/es-ch-sync/main.go` surface.

Config mirrors internal/config/settings.go:4-22 exactly (env vars, with CLI
flags overriding): START_TIME / STOP_TIME (RFC3339), TOKEN_IDS (messy csv
ok), SIGNALS (csv), plus source/dim/output paths.  BATCH_SIZE and PARALLEL
have no equivalents: Spark split sizing and task scheduling replace them
(SURVEY.md §4) — accepted and ignored with a note, so existing launch
configs keep working.

Run:
    python -m es_ch_sync_spark.job.main \
        --source /data/status --dim /data/device --out /data/signal \
        [--start 2024-01-01T00:00:00Z] [--stop ...] [--tokens 1,2,3] \
        [--signals speed,make] [--streaming]
"""

from __future__ import annotations

import argparse
import os
import sys
from datetime import datetime, timezone


def _parse_time(s: str | None) -> datetime | None:
    if not s:
        return None
    return datetime.fromisoformat(s.replace("Z", "+00:00")).astimezone(timezone.utc)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="es_ch_sync_spark sync job")
    p.add_argument("--source", required=True, help="status-doc table path (parquet or json)")
    p.add_argument(
        "--source-format",
        default="auto",
        choices=["auto", "parquet", "json", "es-export", "es_status"],
        help="source reader; es_status = the Python DataSource connector "
        "with filter/projection pushdown (file-based ES hit exports)",
    )
    p.add_argument("--dim", default=None, help="device dimension path (subject,token_id)")
    p.add_argument("--out", required=True, help="signal table output path")
    p.add_argument(
        "--out-format",
        default="parquet",
        choices=["parquet", "txlog"],
        help="parquet = date-partitioned layout (default); txlog = the "
        "transaction-log table (atomic commit, snapshot isolation, time "
        "travel; streaming mode commits each micro-batch exactly-once)",
    )
    p.add_argument("--quarantine", default=None, help="side-output path for bad records")
    p.add_argument("--start", default=os.environ.get("START_TIME"), help="RFC3339; default stop-30d")
    p.add_argument("--stop", default=os.environ.get("STOP_TIME"), help="RFC3339; default now")
    p.add_argument("--tokens", default=os.environ.get("TOKEN_IDS", ""), help="csv token ids")
    p.add_argument("--signals", default=os.environ.get("SIGNALS", ""), help="csv signal names")
    p.add_argument("--batch-size", default=os.environ.get("BATCH_SIZE"), help="ignored (Spark split sizing)")
    p.add_argument("--parallel", default=os.environ.get("PARALLEL"), help="ignored (Spark task scheduling)")
    p.add_argument("--streaming", action="store_true", help="run as AvailableNow stream (cron mode)")
    p.add_argument("--checkpoint", default=None, help="stream checkpoint dir (required with --streaming)")
    p.add_argument("--catalog", default=None, help="signal-definitions YAML (default: built-in 18-signal catalog)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.batch_size or args.parallel:
        print("note: BATCH_SIZE/PARALLEL are handled by Spark (split sizing / scheduling); ignored",
              file=sys.stderr)

    from es_ch_sync_spark.catalog import DEVICE_STATUS_CATALOG, SignalCatalog
    from es_ch_sync_spark.fixtures import DEVICE_STATUS_SCHEMA
    from es_ch_sync_spark.job.sync import SyncOptions, plan_sync
    from es_ch_sync_spark.session import get_spark

    catalog = (
        SignalCatalog.from_yaml_file(args.catalog) if args.catalog else DEVICE_STATUS_CATALOG
    )
    spark = get_spark("es_ch_sync_spark-job")
    opts = SyncOptions(
        start_time=_parse_time(args.start),
        stop_time=_parse_time(args.stop),
        token_ids=SyncOptions.parse_token_ids(args.tokens),
        signals=[s.strip() for s in args.signals.split(",") if s.strip()],
    )
    dim = None
    if args.dim:
        if args.dim.endswith((".jsonl", ".json", ".ndjson")):
            # device-service dump (subjects.jsonl) → broadcast dim, with
            # malformed-line quarantine (deviceapi/service.go:52-105 parity)
            from es_ch_sync_spark.io.sources import read_device_dim

            dim, dim_quarantine = read_device_dim(spark, args.dim)
            if args.quarantine:
                dim_quarantine.write.mode("append").parquet(args.quarantine + "_dim")
        else:
            dim = spark.read.parquet(args.dim)

    if args.streaming:
        if not args.checkpoint:
            print("--checkpoint required with --streaming", file=sys.stderr)
            return 2
        from es_ch_sync_spark.streaming.sync_stream import (
            build_signal_stream,
            read_status_stream,
            start_signal_sink,
        )

        stream = read_status_stream(spark, args.source, DEVICE_STATUS_SCHEMA)
        signals = build_signal_stream(
            stream, catalog.filtered(opts.signals or None), dim
        )
        if args.out_format == "txlog":
            from es_ch_sync_spark.io.txlog import txlog_stream_writer

            q = (
                signals.writeStream.foreachBatch(txlog_stream_writer(args.out))
                .option("checkpointLocation", args.checkpoint)
                .trigger(availableNow=True)
                .start()
            )
        else:
            q = start_signal_sink(signals, args.out, args.checkpoint, available_now=True)
        q.awaitTermination()
        return 0

    es_quarantine = None
    if args.source_format == "es_status":
        # the Python DataSource connector: subject/time/source predicates
        # that plan_sync applies are PUSHED into the source (the reference's
        # elastic.go:46-108 pushdown boundary, no jars required)
        from es_ch_sync_spark.io.es_datasource import read_es_status

        status = read_es_status(spark, args.source).drop("es_id", "es_index")
    elif args.source_format == "es-export" or (
        args.source_format == "auto"
        and (args.source.endswith(".ndjson") or args.source.endswith("/es-export"))
    ):
        # elasticdump-style index dump: _source-wrapped hits, one per line —
        # the file-based migration path off a live ES cluster
        from es_ch_sync_spark.io.sources import read_es_export

        status, es_quarantine = read_es_export(spark, args.source, DEVICE_STATUS_SCHEMA)
        status = status.drop("es_id", "es_index")
    elif args.source_format == "json" or (
        args.source_format == "auto"
        and (args.source.endswith(".json") or args.source.endswith("/json"))
    ):
        from es_ch_sync_spark.io.sources import read_status_json

        status = read_status_json(spark, args.source, DEVICE_STATUS_SCHEMA)
    else:
        status = spark.read.parquet(args.source)

    signals, quarantine = plan_sync(status, catalog, dim, opts)
    if es_quarantine is not None and args.quarantine:
        es_quarantine.write.mode("append").parquet(args.quarantine + "_es")
    if args.out_format == "txlog":
        from es_ch_sync_spark.io.sinks import dedup_signals
        from es_ch_sync_spark.io.txlog import read_table, txlog_append

        txlog_append(dedup_signals(signals), args.out)
        if args.quarantine:
            quarantine.write.mode("append").parquet(args.quarantine)
        n = read_table(spark, args.out).count()
    else:
        from es_ch_sync_spark.io.sinks import write_signals

        write_signals(signals, args.out)
        if args.quarantine:
            quarantine.write.mode("append").parquet(args.quarantine)
        n = spark.read.parquet(args.out).count()
    print(f"synced: {n} signal rows at {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
