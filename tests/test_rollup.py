"""Incremental daily-rollup maintenance: folding deltas day by day must
equal rebuilding the rollup from the full signal table (the decomposable-
aggregate law the continuous-aggregate pattern rests on)."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F
from pyspark.sql import types as T

from es_ch_sync_spark.io.maintenance import build_daily_rollup, maintain_daily_rollup

SIG_SCHEMA = T.StructType(
    [
        T.StructField("token_id", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("name", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("value_number", T.DoubleType()),
        T.StructField("value_string", T.StringType()),
    ]
)

BASE = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _signals(day_offset: int, tokens=(1, 2), per_token: int = 20):
    rows = []
    for tok in tokens:
        for i in range(per_token):
            ts = BASE + timedelta(days=day_offset, minutes=i * 7)
            rows.append((tok, ts, "speed", "s", float(tok * 100 + i), None))
    return rows


def test_incremental_rollup_equals_full_rebuild(spark, tmp_path):
    path = str(tmp_path / "rollup")

    wave1 = spark.createDataFrame(_signals(0) + _signals(1), SIG_SCHEMA)
    maintain_daily_rollup(spark, path, wave1)

    # wave 2 overlaps day 1 and adds day 2 — touched partitions only
    wave2 = spark.createDataFrame(_signals(1, tokens=(2, 3)) + _signals(2), SIG_SCHEMA)
    maintain_daily_rollup(spark, path, wave2)

    got = spark.read.parquet(path)
    want = build_daily_rollup(wave1.unionByName(wave2))

    got_rows = {
        (r["token_id"], r["day"], r["name"]): (r["n"], r["v_min"], r["v_max"], round(r["v_sum"], 4))
        for r in got.collect()
    }
    want_rows = {
        (r["token_id"], r["day"], r["name"]): (r["n"], r["v_min"], r["v_max"], round(r["v_sum"], 4))
        for r in want.collect()
    }
    assert got_rows == want_rows
    # day-0 rows were NOT rewritten by wave 2 (untouched partition)
    assert got.filter(F.col("day") == "2024-01-01").count() == 2


def test_gram_view_incremental_bit_identical(spark, tmp_path):
    """Three txlog appends, delta-refreshed gram view: the eigenvector
    from the view is BIT-identical to pca_top_component over the union
    (integer-additive cells), and a non-append commit falls back to a
    full rebuild that still matches."""
    import numpy as np

    from es_ch_sync_spark.io import ivm
    from es_ch_sync_spark.io.txlog import txlog_append, txlog_overwrite
    from es_ch_sync_spark.operators.features import pca_top_component

    rng = np.random.RandomState(11)
    d, n = 8, 90
    rows = [(i, [float(v) for v in rng.normal(0, 1, d)]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    fact, view = str(tmp_path / "fact"), str(tmp_path / "view")

    for k in range(3):
        txlog_append(emb.filter(F.col("vec_id") % 3 == k), fact)
        r = ivm.refresh_gram_view(spark, fact, view)
        assert r["mode"] == ("full" if k == 0 else "delta")

    got = sorted(map(tuple, ivm.pca_from_gram_view(spark, view, dim=d).collect()))
    want = sorted(map(tuple, pca_top_component(emb, dim=d).collect()))
    assert got == want  # bit-identical, not approximately

    # a non-append commit voids the delta path: full rebuild, same answer
    txlog_overwrite(emb, fact)
    r = ivm.refresh_gram_view(spark, fact, view)
    assert r["mode"] == "full"
    got2 = sorted(map(tuple, ivm.pca_from_gram_view(spark, view, dim=d).collect()))
    assert got2 == want
