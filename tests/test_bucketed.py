"""Bucketed-table plan shapes: the joins and aggs on the bucket key must
plan WITHOUT an Exchange — that absence is the entire point of paying the
layout cost at write time (io/bucketed.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from es_ch_sync_spark.io.bucketed import bucketed_signal_store, read_bucketed, write_bucketed
from es_ch_sync_spark.io.sources import read_parquet_table


def _executed_plan(df) -> str:
    df.collect()  # force AQE to finalize
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE's toString prints the final plan followed by the initial plan —
    # only the final one describes what actually ran
    return plan.split("== Initial Plan ==")[0]


@pytest.fixture(scope="module")
def signal_table(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    ev = read_parquet_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("token_id"), "ts", "event_type", "value"
    )
    df = bucketed_signal_store(ev, "signal_bucketed_test", str(base / "signal"), n_buckets=4)
    yield df
    spark.sql("DROP TABLE IF EXISTS signal_bucketed_test")


def test_bucketed_groupby_has_no_exchange(spark, signal_table):
    agg = signal_table.groupBy("token_id").agg(
        F.min("ts").alias("min_ts"), F.max("ts").alias("max_ts")
    )
    plan = _executed_plan(agg)
    assert "Exchange" not in plan, plan


def test_bucketed_self_join_has_no_exchange(spark, signal_table):
    a = signal_table.groupBy("token_id").agg(F.min("ts").alias("min_ts"))
    b = signal_table.groupBy("token_id").agg(F.max("ts").alias("max_ts"))
    # force SMJ: AQE would broadcast the tiny aggregates here, which hides
    # the bucketing story this test pins down (at scale both sides are big)
    joined = a.join(b.hint("merge"), "token_id")
    plan = _executed_plan(joined)
    assert "Exchange" not in plan, plan


def test_bucketed_join_unbucketed_shuffles_one_side(spark, signal_table, sf_dir, tmp_path_factory):
    # dimension arrives unbucketed: only IT should shuffle
    dim = (
        read_parquet_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("token_id"), "c_name")
    )
    # force SMJ so the test sees bucketing (a broadcast join has no exchange
    # for a different reason)
    joined = signal_table.join(dim.hint("merge"), "token_id")
    plan = _executed_plan(joined)
    assert plan.count("Exchange") == 1, plan


def test_bucketed_values_roundtrip(spark, signal_table, sf_dir):
    ev = read_parquet_table(spark, sf_dir, "events")
    assert signal_table.count() == ev.count()
    orig = ev.groupBy(F.col("user_id").alias("token_id")).count()
    got = signal_table.groupBy("token_id").count()
    assert got.exceptAll(orig).count() == 0 and orig.exceptAll(got).count() == 0


def test_write_bucketed_sorted_buckets(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed2")
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    write_bucketed(emb, "emb_bucketed_test", str(base / "emb"), "vec_id", 2)
    try:
        got = read_bucketed(spark, "emb_bucketed_test")
        assert got.count() == emb.count()
        # bucketed groupBy on the key: no exchange
        plan = _executed_plan(got.groupBy("vec_id").count())
        assert "Exchange" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS emb_bucketed_test")
