"""Deterministic reference-shaped fixtures (FIXTURES.md).

Reproduces the reference's test corpus construction
(/root/reference/internal/sync/test/sync_test.go:260-308): S subjects ×
R timestamps (base 2020-01-01T00:00:00Z + (i+1) ms), every document carrying
the full 18-field payload, plus a malformed document injected every
``malformed_every`` rows (sync_test.go:44-51,283-288).

Generated with a seeded RNG so golden counts are stable; generated *as a
DataFrame* (no files needed) so tests stay fast.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

BASE_TIME = datetime(2020, 1, 1, tzinfo=timezone.utc)

DEVICE_STATUS_SCHEMA = T.StructType(
    [
        T.StructField("subject", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("specversion", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("dataschema", T.StringType()),
        T.StructField("time", T.TimestampType()),
        T.StructField("data_speed", T.LongType()),
        T.StructField("data_engineSpeed", T.DoubleType()),
        T.StructField("data_fuelPercentRemaining", T.DoubleType()),
        T.StructField("data_odometer", T.DoubleType()),
        T.StructField("data_coolantTemp", T.LongType()),
        T.StructField("data_ambientTemp", T.DoubleType()),
        T.StructField("data_batteryVoltage", T.DoubleType()),
        T.StructField("data_soc", T.DoubleType()),
        T.StructField("data_latitude", T.DoubleType()),
        T.StructField("data_longitude", T.DoubleType()),
        T.StructField("data_altitude", T.DoubleType()),
        T.StructField("data_nsat", T.LongType()),
        T.StructField("data_runTime", T.LongType()),
        T.StructField("data_throttlePosition", T.DoubleType()),
        T.StructField("data_engineLoad", T.DoubleType()),
        T.StructField("data_make", T.StringType()),
        T.StructField("data_model", T.StringType()),
        T.StructField("data_year", T.LongType()),
        T.StructField("is_malformed", T.BooleanType()),
    ]
)

MAKES = ["Ford", "Toyota", "Tesla", "BMW"]
MODELS = ["F150", "Corolla", "Model3", "X5"]


def device_status_rows(
    subjects: int = 8,
    rows_per_subject: int = 1000,
    malformed_every: int = 10_000,
    seed: int = 42,
) -> list[tuple]:
    rng = random.Random(seed)
    rows: list[tuple] = []
    n = 0
    for s in range(1, subjects + 1):
        subj = str(s)
        odo = 10_000.0 * s
        for i in range(rows_per_subject):
            n += 1
            ts = BASE_TIME + timedelta(milliseconds=i + 1)
            odo += rng.uniform(0.0, 1.0)
            if malformed_every and n % malformed_every == 0:
                rows.append(
                    (subj, f"bad-{n}", "bad", "1.0", "zone.dimo.device.status.update",
                     None, ts, None, None, None, None, None, None, None, None, None,
                     None, None, None, None, None, None, None, None, None, True)
                )
                continue
            rows.append(
                (
                    subj,
                    f"evt-{s}-{i}",
                    "dimo/integration/test-integration-id",
                    "1.0",
                    "zone.dimo.device.status.update",
                    None,
                    ts,
                    rng.randrange(0, 121),
                    rng.uniform(600, 4000),
                    rng.uniform(0, 1),
                    odo,
                    rng.randrange(60, 111),
                    rng.uniform(-20, 45),
                    rng.uniform(11, 15),
                    rng.uniform(0, 1),
                    rng.uniform(24, 49),
                    rng.uniform(-125, -66),
                    rng.uniform(0, 2000),
                    rng.randrange(4, 15),
                    rng.randrange(0, 10_001),
                    rng.uniform(0, 1),
                    rng.uniform(0, 1),
                    MAKES[(s - 1) % 4],
                    MODELS[(s - 1) % 4],
                    2015 + (s - 1) % 9,
                    False,
                )
            )
    return rows


def device_status_df(
    spark: SparkSession,
    subjects: int = 8,
    rows_per_subject: int = 1000,
    malformed_every: int = 10_000,
    seed: int = 42,
) -> DataFrame:
    rows = device_status_rows(subjects, rows_per_subject, malformed_every, seed)
    return spark.createDataFrame(rows, DEVICE_STATUS_SCHEMA)


def device_dim_df(spark: SparkSession, subjects: int = 8, unmatched: int = 2) -> DataFrame:
    """subject ↔ token_id dimension; token_id = int(subject) mirrors the test
    resolver (/root/reference/internal/sync/test/sync_test.go:55-61), plus a
    few unmatched subjects for negative-lookup tests."""
    rows = [(str(s), s) for s in range(1, subjects + 1)]
    rows += [(f"ghost-{i}", None) for i in range(unmatched)]
    schema = T.StructType(
        [T.StructField("subject", T.StringType()), T.StructField("token_id", T.LongType())]
    )
    return spark.createDataFrame(rows, schema)
