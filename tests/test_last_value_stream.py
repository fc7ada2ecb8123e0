"""transformWithStateInPandas last-value serving state: multi-batch fold,
checkpointed restart, and native state TTL."""

from __future__ import annotations

import os
import time
from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F
from pyspark.sql import types as T

import pytest

from es_ch_sync_spark.streaming.last_value_stream import (
    LastValueProcessor,
    last_value_stream,
)

# the transformWithState protocol needs protobuf (absent in this
# container, installs off-limits) — e2e runs are environment-gated,
# the fold logic is pinned processor-level below


def _proto_available():
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


needs_proto = pytest.mark.skipif(
    not _proto_available(), reason="transformWithState requires protobuf"
)

BASE = datetime(2024, 5, 1, tzinfo=timezone.utc)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _drain(spark, src, ckpt, sink, ttl_ms=None):
    stream = spark.readStream.schema(SCHEMA).format("parquet").load(src)
    q = (
        last_value_stream(stream, ttl_ms=ttl_ms)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _final(spark, sink):
    df = spark.read.parquet(sink)
    latest = df.groupBy("user_id").agg(F.max("n_obs").alias("n_obs"))
    return {
        r["user_id"]: r
        for r in df.join(latest, ["user_id", "n_obs"]).collect()
    }


@needs_proto
def test_last_value_folds_across_batches_and_restart(spark, tmp_path):
    src = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ck")
    sink = str(tmp_path / "out")

    def w(rows, mode="append"):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(mode).parquet(src)

    w(
        [
            (1, BASE + timedelta(minutes=5), 10, 1.5),
            (1, BASE + timedelta(minutes=1), 11, 9.9),  # older, not last
            (2, BASE, 12, 4.0),
        ],
        mode="overwrite",
    )
    _drain(spark, src, ckpt, sink)
    got = _final(spark, sink)
    assert got[1]["last_value"] == 1.5 and got[1]["n_obs"] == 2
    assert got[2]["last_value"] == 4.0 and got[2]["n_obs"] == 1

    # second wave via checkpointed restart: ts TIE broken by event_id
    w(
        [
            (1, BASE + timedelta(minutes=5), 9, 7.7),  # same ts, LOWER id → not last
            (2, BASE + timedelta(hours=1), 13, 6.0),
        ]
    )
    _drain(spark, src, ckpt, sink)
    got = _final(spark, sink)
    assert got[1]["last_value"] == 1.5 and got[1]["n_obs"] == 3
    assert got[2]["last_value"] == 6.0 and got[2]["n_obs"] == 2
    assert got[2]["last_ts"] == (BASE + timedelta(hours=1)).replace(tzinfo=None)


@needs_proto
def test_last_value_state_ttl_expires_idle_keys(spark, tmp_path):
    """Native ValueState TTL: a key idle past ttl_ms restarts its fold —
    the state store itself evicted it (no custom timers)."""
    src = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ck")
    sink = str(tmp_path / "out")

    def w(rows, mode="append"):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(mode).parquet(src)

    w([(1, BASE, 1, 2.0), (1, BASE + timedelta(minutes=1), 2, 3.0)], mode="overwrite")
    _drain(spark, src, ckpt, sink, ttl_ms=1500)
    assert _final(spark, sink)[1]["n_obs"] == 2

    time.sleep(2.5)  # wall-clock past the TTL
    w([(1, BASE + timedelta(minutes=2), 3, 5.0)])
    _drain(spark, src, ckpt, sink, ttl_ms=1500)
    got = _final(spark, sink)
    # expired state ⇒ count restarted at 1, value is the fresh row's
    assert got[1]["n_obs"] in (1,)
    assert got[1]["last_value"] == 5.0


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def clear(self):
        self._v = None


class _FakeHandle:
    def __init__(self):
        self.state = _FakeValueState()
        self.ttl = None

    def getValueState(self, name, schema, ttlDurationMs=None):
        self.ttl = ttlDurationMs
        return self.state


def _feed(proc, user_id, batches):
    import pandas as pd

    outs = []
    for batch in batches:
        pdf = pd.DataFrame(batch, columns=["ts", "event_id", "value"])
        outs.extend(
            proc.handleInputRows((user_id,), iter([pdf]), None)
        )
    return outs


def test_processor_fold_logic_without_engine():
    """The fold itself (max (ts, event_id) wins; count accumulates; ties
    broken by event_id; state carries across calls) — tested without the
    streaming engine, so the logic is pinned even where the protobuf
    protocol is unavailable."""
    import pandas as pd

    proc = LastValueProcessor(ttl_ms=1234)
    handle = _FakeHandle()
    proc.init(handle)
    assert handle.ttl == 1234

    t0 = pd.Timestamp("2024-05-01 00:05:00")
    t1 = pd.Timestamp("2024-05-01 00:01:00")
    outs = _feed(
        proc,
        1,
        [
            [(t0, 10, 1.5), (t1, 11, 9.9)],       # newest is (t0, 10)
            [(t0, 9, 7.7)],                        # same ts, lower id → loses
            [(pd.Timestamp("2024-05-01 01:00:00"), 13, 6.0)],
        ],
    )
    assert [int(o["n_obs"][0]) for o in outs] == [2, 3, 4]
    assert [float(o["last_value"][0]) for o in outs] == [1.5, 1.5, 6.0]
    assert outs[-1]["last_ts"][0] == pd.Timestamp("2024-05-01 01:00:00")
