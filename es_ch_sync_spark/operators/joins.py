"""Join strategies for scale: salted joins (skew) and bucketed range joins.

These are plan-shape patterns, not new semantics — each returns the same
rows a naive join would, with a physical strategy that survives skew /
avoids O(n·m) comparisons at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to skewed fact keys.

    Facts get a random salt in [0, salt); the dim side is exploded ×salt so
    every (key, salt) bucket finds its match.  A hot key's rows now spread
    over ``salt`` reducers instead of one.  Use when AQE's skew-join split
    isn't available (e.g. the skew is in a broadcast-ineligible dim join) —
    otherwise prefer AQE.  Dim inflation ×salt is the price: keep salt
    small and the dim narrow."""
    salted_facts = facts.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    salted_dim = dim.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = salted_facts.join(salted_dim, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_gap_seconds: int = 300,
) -> DataFrame:
    """All (left, right) pairs with the same key whose timestamps are within
    ``max_gap_seconds`` — WITHOUT the naive inequality join.

    A plain ``|l.ts - r.ts| <= gap`` predicate forces BroadcastNestedLoop
    (O(n·m)); bucketizing time to gap-sized cells turns it into an
    equi-join: each left row probes its own cell and both neighbors, so the
    join is keyed (key, cell) and the inequality only filters within
    3-cell neighborhoods.  Standard interval-join technique; also how
    Structured Streaming bounds stream-stream join state."""
    gap_us = max_gap_seconds * 1_000_000
    # .cast("timestamp") first: unix_micros is LTZ-only and the source may
    # carry TIMESTAMP_NTZ (session TZ is pinned UTC, so the cast is a no-op
    # semantically)
    lcell = (F.unix_micros(F.col(left_ts).cast("timestamp")) / gap_us).cast("long")
    l = left.withColumn(
        "_cell", F.explode(F.array(lcell - 1, lcell, lcell + 1))
    )
    r = right.withColumn(
        "_cell", (F.unix_micros(F.col(right_ts).cast("timestamp")) / gap_us).cast("long")
    )
    lts = F.col(f"l.{left_ts}").cast("timestamp")
    rts = F.col(f"r.{right_ts}").cast("timestamp")
    out = (
        l.alias("l")
        .join(r.alias("r"), (F.col(f"l.{key}") == F.col(f"r.{key}")) & (F.col("l._cell") == F.col("r._cell")))
        .filter(F.abs(F.unix_micros(lts) - F.unix_micros(rts)) <= gap_us)
    )
    return out


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: list[tuple[str, object, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase skew-resistant aggregation: groupBy(key, salt) partials,
    then combine per key.

    Spark's hash aggregate already does map-side partial aggregation, but
    that partial combine is DEFEATED when the map-side hash table spills
    (very high key cardinality) or when a single reduce key receives a
    disproportionate share of partials (extreme skew: one key = 30% of a
    100 TB table lands on one reducer).  Salting splits each key's reduce
    work over ``salt`` reducers; the second groupBy combines ``salt`` tiny
    partial rows per key — negligible.  Same decomposition AQE's skew
    handling cannot apply to aggregations (AQE splits skewed JOIN
    partitions only).

    ``aggs`` is a list of ``(fn, col, alias)`` with fn ∈ {count, sum, min,
    max} — the decomposable subset (partial and final combine are the same
    shape); avg must be requested as sum+count and divided by the caller.
    """
    decompose = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    partials, finals = [], []
    for fn, col, alias in aggs:
        if fn not in decompose:
            raise ValueError(f"non-decomposable aggregate {fn!r}")
        p = f"__p_{alias}"
        partials.append((F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(col)).alias(p))
        finals.append(decompose[fn](p).alias(alias))
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    return salted.groupBy(key, "_salt").agg(*partials).groupBy(key).agg(*finals)
