"""Z-order data layout — multi-dimensional clustering for scan pruning.

A 100 TB fact table is usually filtered on more than one column (the
reference's signal queries filter (token_id, timestamp); events queries
filter (user_id, time)).  Sorting by one column gives perfect min/max
pruning on it and none on the other; interleaving the bits of both keys
(Morton / Z-order — the technique behind Delta Lake's OPTIMIZE ZORDER and
ClickHouse's mortonEncode) gives each parquet file a tight range in BOTH
dimensions, so row-group min/max statistics prune scans for either
predicate.

``zvalue`` is a pure integer column expression (one generated-SQL parse,
no UDF): bit i of each key lands at interleaved position 2i / 2i+1.  The
identical arithmetic runs in DuckDB, so z-keys are oracle-checkable
row-for-row.  ``write_zordered`` materializes the layout with
repartitionByRange(z) + sortWithinPartitions(z) — the scalable form: a
range shuffle (sampled bounds, no global single-partition sort) followed
by a local sort, exactly how a cluster would lay out 100 TB.  The pruning
benefit is pinned quantitatively in tests/test_layout.py from parquet
footer statistics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _zvalue_terms(a_sql: str, b_sql: str, bits: int, shift_fmt: str) -> str:
    """Sum-of-terms bit interleave; ``shift_fmt`` renders (expr >> i) & 1
    in the target dialect."""
    terms = []
    for i in range(bits):
        terms.append(f"({shift_fmt.format(x=a_sql, i=i)}) * {1 << (2 * i)}")
        terms.append(f"({shift_fmt.format(x=b_sql, i=i)}) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def zvalue_sql_spark(a_sql: str, b_sql: str, bits: int = 16) -> str:
    return _zvalue_terms(a_sql, b_sql, bits, "shiftright({x}, {i}) & 1")


def zvalue_sql_duckdb(a_sql: str, b_sql: str, bits: int = 16) -> str:
    return _zvalue_terms(a_sql, b_sql, bits, "(({x}) >> {i}) & 1")


def zvalue(a_sql: str, b_sql: str, bits: int = 16) -> Column:
    """Morton z-key of two non-negative integer expressions (SQL text, so
    the whole interleave is ONE expr() parse).  Keys must fit in ``bits``
    bits — callers bucket/modulo first."""
    return F.expr(zvalue_sql_spark(a_sql, b_sql, bits))


def zvalue_normalized(
    df: DataFrame, a_col: str, b_col: str, bits: int = 8
) -> Column:
    """Z-key with automatic per-dimension normalization: each dim is mapped
    into 2^bits equal-width integer bins over its observed min/max before
    interleaving.  Raw interleaving only balances dims of comparable
    bit-width — with a 4-bit user range against a 12-bit day range, the
    day bits dominate every split and the user dim never clusters.
    Normalization (the analog of Delta's range-partition-id transform)
    restores the alternation.

    The min/max pass reduces to 4 scalars (one Spark job, driver transfer
    is constant-size); the returned key is then a pure column expression
    embedding them as literals."""
    row = df.agg(
        F.min(a_col).alias("a0"), F.max(a_col).alias("a1"),
        F.min(b_col).alias("b0"), F.max(b_col).alias("b1"),
    ).collect()[0]
    n = 1 << bits
    a_span = int(row["a1"]) - int(row["a0"]) + 1
    b_span = int(row["b1"]) - int(row["b0"]) + 1
    a_sql = f"({a_col} - {int(row['a0'])}) * {n} DIV {a_span}"
    b_sql = f"({b_col} - {int(row['b0'])}) * {n} DIV {b_span}"
    return zvalue(a_sql, b_sql, bits)


def write_zordered(
    df: DataFrame,
    path: str,
    z_col: Column,
    n_files: int = 8,
) -> None:
    """Materialize ``df`` clustered by the z-key: range-repartition on z
    (sampled bounds — parallel, never a single-partition global sort),
    sort within partitions, one file per partition."""
    (
        df.withColumn("_z", z_col)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
