"""Data-profiling operator: one-pass per-column quality metrics."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, approx_distinct: bool = False) -> DataFrame:
    """Per-column data-quality profile: nulls, cardinality, min/max.

    One aggregation pass over the table (all metrics partial-aggregated
    map-side), output = #columns rows.  ``approx_distinct=True`` switches
    exact COUNT(DISTINCT) to HLL++ — at 100 TB exact distinct on every
    column is #cols shuffles; the sketch is one pass.  Results unpivot to
    (column, metric...) rows so the profile of a 1000-column table stays
    readable."""
    aggs = []
    for f in df.schema.fields:
        c = f.name
        distinct = (
            F.approx_count_distinct(c).alias(f"{c}__distinct")
            if approx_distinct
            else F.countDistinct(c).alias(f"{c}__distinct")
        )
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nonnull"),
            distinct,
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    total = df.count()
    row = df.agg(*aggs).collect()[0]
    out = [
        (
            f.name,
            f.dataType.simpleString(),
            total,
            total - row[f"{f.name}__nonnull"],
            row[f"{f.name}__distinct"],
            row[f"{f.name}__min"],
            row[f"{f.name}__max"],
        )
        for f in df.schema.fields
    ]
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("column", T.StringType()),
            T.StructField("dtype", T.StringType()),
            T.StructField("n_rows", T.LongType()),
            T.StructField("n_nulls", T.LongType()),
            T.StructField("n_distinct", T.LongType()),
            T.StructField("min_str", T.StringType()),
            T.StructField("max_str", T.StringType()),
        ]
    )
    return df.sparkSession.createDataFrame(out, schema)
