"""Catalog YAML round-trip + CLI job in-process end-to-end."""

from __future__ import annotations

import pytest

from es_ch_sync_spark.catalog import DEVICE_STATUS_CATALOG, SignalCatalog
from es_ch_sync_spark.fixtures import device_dim_df, device_status_df


def test_catalog_yaml_roundtrip():
    text = DEVICE_STATUS_CATALOG.to_yaml()
    back = SignalCatalog.from_yaml(text)
    assert back.defs == DEVICE_STATUS_CATALOG.defs
    assert len(back) == 18


def test_every_conversion_applies_correctly(spark):
    """Each CONVERSIONS entry produces the expected value through the
    unpivot (the unit-conversion surface, T2)."""
    from pyspark.sql import types as T

    from es_ch_sync_spark.catalog import CONVERSIONS, SignalDef
    from es_ch_sync_spark.operators.transform import unpivot_signals

    schema = T.StructType(
        [
            T.StructField("tok", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("src", T.StringType()),
            T.StructField("x", T.DoubleType()),
            T.StructField("b", T.BooleanType()),
        ]
    )
    from datetime import datetime, timezone

    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, tzinfo=timezone.utc), "s", 100.0, True)], schema
    )
    cat = SignalCatalog(
        [SignalDef(f"sig_{name}", "b" if name == "bool_to_float" else "x", "number", name)
         for name in CONVERSIONS]
    )
    got = {
        r["name"]: r["value_number"]
        for r in unpivot_signals(df, cat, token_col="tok", ts_col="ts", source_col="src").collect()
    }
    assert got["sig_identity"] == 100.0
    assert got["sig_ratio_to_percent"] == 10000.0
    assert abs(got["sig_kpa_to_psi"] - 14.50377377) < 1e-6
    assert abs(got["sig_mph_to_kmh"] - 160.9344) < 1e-6
    assert got["sig_celsius_to_kelvin"] == 373.15
    assert got["sig_bool_to_float"] == 1.0


def test_catalog_yaml_rejects_unknown_conversion():
    bad = """
signals:
  - name: x
    source_field: data_x
    conversion: furlongs_per_fortnight
"""
    with pytest.raises(ValueError, match="furlongs_per_fortnight"):
        SignalCatalog.from_yaml(bad)


def test_cli_job_end_to_end(spark, tmp_path):
    """Drive job.main() in-process: custom YAML catalog, signal filter,
    token filter, quarantine side-output."""
    from es_ch_sync_spark.job.main import main

    src = str(tmp_path / "status")
    dim = str(tmp_path / "dim")
    out = str(tmp_path / "signal")
    quar = str(tmp_path / "quarantine")
    cat_file = tmp_path / "cat.yaml"
    cat_file.write_text(
        SignalCatalog(
            [d for d in DEVICE_STATUS_CATALOG.defs if d.name in ("speed", "make")]
        ).to_yaml()
    )

    device_status_df(spark, subjects=4, rows_per_subject=50, malformed_every=90).write.parquet(src)
    device_dim_df(spark, subjects=4).write.parquet(dim)

    rc = main(
        [
            "--source", src, "--dim", dim, "--out", out, "--quarantine", quar,
            "--start", "2020-01-01T00:00:00Z", "--stop", "2020-02-01T00:00:00Z",
            "--tokens", " 1, 2,3 ,4,junk", "--catalog", str(cat_file),
        ]
    )
    assert rc == 0
    got = spark.read.parquet(out)
    n_bad = got.sparkSession.read.parquet(quar).filter("is_malformed").count()
    assert n_bad == 2  # rows 90 and 180 of 200
    assert got.count() == (200 - n_bad) * 2  # 2 signals per clean doc
    assert {r["name"] for r in got.select("name").distinct().collect()} == {"speed", "make"}


def test_cli_job_reads_es_export(spark, tmp_path):
    """The same job over an elasticdump-style NDJSON index dump: hits are
    unwrapped from _source and flow through the identical sync plan."""
    from pyspark.sql import functions as F

    from es_ch_sync_spark.job.main import main

    src = str(tmp_path / "es-export")
    dim = str(tmp_path / "dim")
    out = str(tmp_path / "signal")
    df = device_status_df(spark, subjects=3, rows_per_subject=20)
    wrapped = df.select(
        F.col("subject").cast("string").alias("_id"),
        F.lit("device-status").alias("_index"),
        F.struct(*[F.col(c) for c in df.columns]).alias("_source"),
    )
    wrapped.coalesce(1).write.json(src)
    device_dim_df(spark, subjects=3).write.parquet(dim)

    rc = main(
        [
            "--source", src, "--dim", dim, "--out", out,
            "--start", "2020-01-01T00:00:00Z", "--stop", "2020-02-01T00:00:00Z",
        ]
    )
    assert rc == 0
    got = spark.read.parquet(out)
    assert got.count() > 0
    assert {"token_id", "timestamp", "name"} <= set(got.columns)


def test_cli_job_txlog_out_mode(spark, tmp_path):
    """--out-format txlog: the sync job lands its output as one atomic
    transaction-log commit; a re-run appends a second version and time
    travel still shows the first."""
    from es_ch_sync_spark.io import txlog as tx
    from es_ch_sync_spark.job.main import main

    src = str(tmp_path / "status")
    out = str(tmp_path / "signal_tx")
    device_status_df(spark, subjects=3, rows_per_subject=20).write.parquet(src)

    args = [
        "--source", src, "--out", out, "--out-format", "txlog",
        "--start", "2020-01-01T00:00:00Z", "--stop", "2020-02-01T00:00:00Z",
    ]
    assert main(args) == 0
    v0 = tx.current_version(out)
    assert v0 == 0
    n0 = tx.read_table(spark, out).count()
    assert n0 > 0
    assert main(args) == 0  # second run = second atomic commit
    assert tx.current_version(out) == 1
    assert tx.read_table(spark, out, version=0).count() == n0
