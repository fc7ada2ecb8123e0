"""Z-order layout: the clustering must measurably tighten per-file min/max
ranges in BOTH dimensions versus a single-column sort."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from es_ch_sync_spark.operators.layout import write_zordered, zvalue


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from es_ch_sync_spark.io.sources import read_parquet_table

    e = read_parquet_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).alias("day"),
    )


def _file_spans(path: str, col: str) -> list[int]:
    """Per-file (max − min) width of ``col`` from parquet footer stats."""
    import glob

    spans = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            for ci in range(rgm.num_columns):
                c = rgm.column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            spans.append(hi - lo)
    return spans


def test_zorder_tightens_both_dimensions(spark, events, tmp_path):
    """Sorting by user_id alone leaves each file spanning ~the full day
    range; z-order must cut the mean day span while keeping user_id spans
    well below full-range.

    Z-order only balances dimensions of comparable bit-width, so (as Delta
    does with its range-partition-id transform) each dim is first
    normalized into 2⁴ equal-width bins over its observed min/max — the
    min/max are two scalars, the bucketing stays a pure column expr."""
    from es_ch_sync_spark.operators.layout import zvalue_normalized

    z = zvalue_normalized(events, "user_id", "day", bits=4)
    zpath = str(tmp_path / "zorder")
    upath = str(tmp_path / "bysuer")
    write_zordered(events, zpath, z, n_files=16)
    (
        events.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(upath)
    )

    full_day = events.agg(F.max("day") - F.min("day")).collect()[0][0]
    full_user = events.agg(F.max("user_id") - F.min("user_id")).collect()[0][0]

    z_day = _file_spans(zpath, "day")
    u_day = _file_spans(upath, "day")
    z_user = _file_spans(zpath, "user_id")
    assert z_day and u_day and z_user

    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    # user-sorted layout cannot prune on day: files span ~everything
    assert mean(u_day) > 0.9 * full_day
    # z-order prunes on day…
    assert mean(z_day) < 0.6 * full_day, (mean(z_day), full_day)
    # …while still pruning on user_id (each file ≤ ~half the id range)
    assert mean(z_user) < 0.6 * full_user, (mean(z_user), full_user)


def test_zvalue_bit_exact(spark):
    """Interleave spot-check against a python reference."""
    df = spark.createDataFrame([(5, 3), (0, 0), (65535, 65535)], "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select("a", "b", zvalue("a", "b").alias("z")).collect()
    }

    def ref(a: int, b: int) -> int:
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    for (a, b), z in got.items():
        assert z == ref(a, b)
