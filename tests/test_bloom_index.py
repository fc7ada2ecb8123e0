"""File-level Bloom index: pruning actually skips files, lookups never
miss, false positives only cost IO."""

from __future__ import annotations

from pyspark.sql import functions as F

from es_ch_sync_spark.io.bloom_index import (
    build_bloom_index,
    candidate_files,
    point_lookup,
)


def _clustered_table(spark, path: str, n=8000, files=8):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("payload"),
    )
    df.repartitionByRange(files, "k").write.mode("overwrite").parquet(path)
    return path


def test_bloom_prunes_and_never_misses(spark, tmp_path):
    table = _clustered_table(spark, str(tmp_path / "t"))
    index = str(tmp_path / "idx")
    n_files = build_bloom_index(spark, table, index, "k")
    assert n_files == 8

    # keys clustered by range: a point key lives in exactly one file, and
    # the index must prune to (nearly) that one — far fewer than all 8
    for key in (17, 4001, 7999):
        cands = candidate_files(spark, index, key)
        assert 1 <= len(cands) <= 3  # FP allowance at 2^16 bits / 1k keys
        got = point_lookup(spark, table, index, "k", key).collect()
        assert len(got) == 1 and got[0]["k"] == key  # never a miss
        assert got[0]["payload"] == key % 97


def test_bloom_absent_key_reads_nothing_or_fp_only(spark, tmp_path):
    table = _clustered_table(spark, str(tmp_path / "t"))
    index = str(tmp_path / "idx")
    build_bloom_index(spark, table, index, "k")
    # absent keys: result MUST be empty; candidate set is usually empty
    # (each may rarely be a false positive — that costs IO, not rows)
    empties = 0
    for key in range(100_000, 100_020):
        assert point_lookup(spark, table, index, "k", key).count() == 0
        if not candidate_files(spark, index, key):
            empties += 1
    assert empties >= 15  # FPR far below 25% across 20 probes


def test_bloom_matches_full_scan(spark, tmp_path):
    """Index-pruned lookup ≡ full-scan filter for every probed key."""
    table = _clustered_table(spark, str(tmp_path / "t"), n=3000, files=5)
    index = str(tmp_path / "idx")
    build_bloom_index(spark, table, index, "k")
    full = spark.read.parquet(table)
    for key in (0, 1499, 2999):
        got = sorted(map(tuple, point_lookup(spark, table, index, "k", key).collect()))
        want = sorted(map(tuple, full.filter(F.col("k") == key).collect()))
        assert got == want
